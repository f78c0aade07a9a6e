"""Training-data pipeline composite queries — the operations a
large-scale LLM corpus build runs between raw ingest and tokenization
(quality banding, sessionization, contamination checks, corpus stats,
balanced sampling).  Everything here is oracle-checked DuckDB-equivalent
SQL semantics over the shared fixture tables.

Registered directly after the dedup family (queries/__init__._MODULES)
so the driver's 50-entry correctness window verifies them in round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
