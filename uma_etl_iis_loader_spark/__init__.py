"""uma_etl_iis_loader_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference ETL loader (``semantic-hallucinations/uma-etl-iis-loader``),
re-expressed Spark-first: declarative DataFrame plans, Catalyst-optimized,
designed for 100 TB scale (broadcast dims, partial aggregation,
shuffle-minimal operators, no driver-side loops).

Package layout:

- ``session``    — tuned SparkSession factory
- ``schemas``    — explicit StructType registry (reference tables + fixtures)
- ``io``         — parquet read/write helpers
- ``functions/`` — scalar kits (normalization, time parsing, text, vectors)
- ``operators/`` — relational operators (merge, SCD2, joins, shred,
                   occupancy, dedup, similarity, text analysis, multimodal)
- ``sources/``   — ingestion (REST-source plumbing, fixture registry)
- ``plans/``     — end-to-end job orchestration (the reference's main.py DAG)
- ``streaming/`` — Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
