"""DataFrame operators: validation rules, mutation, reconciliation, dedup,
similarity, text analysis, multimodal plumbing."""
