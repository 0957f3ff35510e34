from flink_parent_spark.operators.rank import top_n, dedup_keep_first, dedup_keep_last
from flink_parent_spark.operators.windows import tumble, hop, session
from flink_parent_spark.operators.joins import interval_join, asof_join, lookup_join

__all__ = [
    "top_n",
    "dedup_keep_first",
    "dedup_keep_last",
    "tumble",
    "hop",
    "session",
    "interval_join",
    "asof_join",
    "lookup_join",
]
