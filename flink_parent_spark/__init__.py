"""flink_parent_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Flink 1.11 (reference: iclouding/flink-parent).

Not a port: Flink's runtime (JobManager/TaskManager, network stack, checkpointing)
is replaced wholesale by Spark's driver/executor model, Catalyst/Tungsten, and
Structured Streaming. What this package reproduces is the *semantics surface*:

- batch SQL + Table-API-style relational operators (scan/calc/join/agg/over/
  rank/dedup/set-ops/unnest) — thin, idiomatic DataFrame/Spark SQL;
- streaming semantics (event-time watermarks, tumble/hop/session windows,
  dedup, Top-N, interval & temporal/as-of joins) over Structured Streaming;
- CEP / MATCH_RECOGNIZE as a Python NFA over per-key pandas groups;
- LLM-data-pipeline extensions (document dedup exact/MinHash/SimHash,
  embedding similarity search, text analysis, multimodal column plumbing),
  all designed for 100 TB scale (no driver-side collection; shuffle-aware).

See SURVEY.md at the repo root for the full blueprint.
"""

from flink_parent_spark.session import get_spark
from flink_parent_spark.tables import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
