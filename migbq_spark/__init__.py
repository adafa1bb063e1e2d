"""migbq_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jo8937/migbq, re-expressed Spark-first.

The reference (jo8937/migbq) is an MSSQL→BigQuery incremental-migration
orchestrator: PK-range sweep extraction, gzip staging, BigQuery load jobs,
metadata-driven resume/retry, count-reconciliation checks, and
ROW_NUMBER()-based dedup repair.  (Reference checkout at /root/reference
was empty at survey time — see SURVEY.md §0; provenance for each behavior
is tagged `[pub:*]` there.)  Every operator it orchestrates is declared in
SURVEY.md §2 and implemented here as an idiomatic Spark DataFrame plan,
plus the driver-mandated large-scale pipeline operators (dedup,
similarity search, multimodal columns, text analysis, streaming).

Public surface:
    from migbq_spark import registry
    queries = registry.queries()       # id -> (spark, sf_dir) -> DataFrame
    oracles = registry.oracle_sql()    # id -> ANSI SQL for the DuckDB oracle
"""

__version__ = "0.1.0"
