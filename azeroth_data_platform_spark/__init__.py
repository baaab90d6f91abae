"""azeroth_data_platform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``ppedro-vasco/azeroth-data-platform`` (a medallion
bronze/silver/gold ETL + analytics platform; see SURVEY.md for the full
structural analysis). The reference delegates all relational work to pandas
and Postgres; here every operator is a declarative DataFrame/SQL plan that
Catalyst optimizes and Tungsten executes — designed to run unchanged on a
1000-executor cluster over 100 TB.

Layout:
  sources/     readers, writers, merge (upsert/append-if-absent), retention,
               REST-edge helpers (driver-side, injectable for tests)
  operators/   silver transform, gold analytics (A1-A7), joins, serving
               queries, dedup, similarity search, text stats, multimodal
  functions/   scalar helpers (money formatting, vector math, deterministic
               numerics)
  streaming/   Structured Streaming variants (hourly OHLC)
  plans/       pipeline composition (the Dagster-DAG replacement)
"""

__version__ = "0.1.0"
