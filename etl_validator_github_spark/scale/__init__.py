"""Scale extensions: the operations a large-scale training-data pipeline
needs beyond the reference's validation catalog — deduplication,
similarity search, text analysis, multimodal plumbing.

All operators are designed for the 100 TB design point: no driver-side
collects, blocking/LSH instead of all-pairs comparisons, integer-quantized
math so results are reproducible under any partitioning.
"""
