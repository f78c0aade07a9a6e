"""projektdataengineering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine reproducing and generalizing the query
and data-processing capabilities of the reference batch-ETL pipeline
(ManuelIU/ProjektDataEngineering; see SURVEY.md). Everything is expressed
through the DataFrame/SQL API so Catalyst + AQE own physical planning;
Python UDFs appear only where built-in operators cannot express the
semantics (and then always Arrow-vectorized).

Layout:
    session      SparkSession factory (AQE on, UTC, local-tuned shuffle)
    catalog      fixture-table loader / temp-view registration
    operators/   reusable dataflow operators (incremental load, as-of join,
                 dedup family, similarity, text analysis, multimodal)
    functions/   column-expression helpers (decimal-exact money math, ...)
    sources/     readers/writers (parquet/csv/json/jdbc wrappers)
    streaming/   Structured Streaming mirrors of the windowed operators
    plans/       explain/plan-inspection helpers
    queries/     the declared query registry (SURVEY.md §2.3) — each entry
                 carries the Spark callable AND its DuckDB oracle SQL
"""

__version__ = "0.1.0"
