"""ed_housing_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference repo ``zhna123/ed-housing-data-pipeline`` (a pandas
medallion-ETL pipeline + DuckDB SQL analysis layer), generalized into
reusable, 100-TB-scale-minded operators:

- ``sources``   : typed readers (parquet/csv/csv-with-preamble/excel/json)
                  and lake-layout path catalog (reference: storage_io.py,
                  bronze_to_silver.py:18-31).
- ``operators`` : relational operator library — clean/cast/derive, joins,
                  aggregations, windows, top-k, set ops, event-time
                  analytics, dedup, similarity search, multimodal
                  (binary-column) plumbing
                  (reference: bronze_to_silver.py, silver_to_gold.py,
                  duckdb_viewer/*).
- ``functions`` : column-expression helpers (safe division, key
                  normalization, text stats, vector math).
- ``plans``     : end-to-end compositions — the medallion pipeline and
                  the registry of named analysis queries with their
                  DuckDB-oracle SQL twins.
- ``streaming`` : Structured Streaming variants of the event analytics.

Everything is lazy DataFrame plans; Catalyst/Tungsten pick the physical
strategy. No RDDs, no driver-side row loops.
"""

from ed_housing_data_pipeline_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
