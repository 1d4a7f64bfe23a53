"""etl_sendas_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
pipeline ``alfarodaniel/ETL-Sendas`` (a single-node pandas/DuckDB ETL,
see ``/root/reference/capital_sendas.py``) as an idiomatic, lazy,
Catalyst-optimized Spark engine, and extends it with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
approximate nearest-neighbor search, multimodal binary columns, text
analysis, and Structured Streaming equivalents of the reference's
sequential rules.

Layout
------
- ``session``     SparkSession factory tuned for local[] testing and
                  cluster-scale defaults (AQE, broadcast thresholds).
- ``sources``     readers (parquet/csv/excel, header promotion,
                  filename-derived partitions, multi-file dedup union)
                  and sinks (parquet/csv/excel).
- ``functions``   pure Column expression library: JS-style date
                  parsing, age derivation, name splitting, text
                  quality/lang-id/fingerprints.
- ``operators``   composable DataFrame→DataFrame operators: keyed
                  dedup, update-by-rowid, capped group marking,
                  gap-session marking, dedup family, ANN.
- ``plans``       end-to-end pipeline assemblies (the capital-sendas
                  DAG re-expressed; rule-engine fold).
- ``streaming``   Structured Streaming counterparts (session windows,
                  stateful gap marking).
"""

__version__ = "0.1.0"
