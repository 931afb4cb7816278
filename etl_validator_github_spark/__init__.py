"""PySpark-native ETL validation + analytics engine.

A from-scratch re-expression of the capabilities of
``HassanB613/etl-validator-github`` (reference at /root/reference, see
SURVEY.md) as an idiomatic Spark DataFrame engine:

- ``schema``            canonical 30-column bank-data schema + constraints
- ``generator``         seeded synthetic bank-data generator
- ``operators.rules``   declarative validation-rule catalog (R1-R25)
- ``operators.validate``single-projection rule evaluation -> array<string>
- ``operators.errors``  per-payee error aggregation + pipe-CSV sink
- ``operators.mutate``  scenario mutations (inject/drop/rename/duplicate)
- ``operators.reconcile``CSV<->DB error reconciliation (token-set compare)
- ``operators.dedup``   exact / MinHash-LSH / SimHash / n-gram / embedding dedup
- ``operators.similarity`` brute-force + LSH-bucketed ANN over embeddings
- ``operators.text``    language-ID, quality scoring, tokens, fingerprints
- ``operators.multimodal`` binary-column plumbing for image/audio/video
- ``sources``           readers/writers (parquet, csv, pipe-csv, json, xlsx, jdbc)
- ``streaming``         Structured Streaming file-pipeline (availableNow)

Everything is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"
