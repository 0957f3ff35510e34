"""Top-N and deduplication operators (batch).

Semantics parity targets in the reference:
- Top-N: the planner recognizes `ROW_NUMBER() OVER (PARTITION BY k ORDER BY s)
  <= N` (StreamExecRank.scala:52; runtime AbstractTopNFunction and the
  AppendOnly/Updatable/Retractable variants under
  flink-table-runtime-blink/.../operators/rank/).
- Dedup: ROW_NUMBER()=1 keep-first/keep-last
  (DeduplicateKeepFirstRowFunction.java / DeduplicateKeepLastRowFunction.java,
  recognized by StreamExecDeduplicateRule.scala).

Here the same patterns are expressed directly over Catalyst's window exec,
which already does partial top-k pushdown per partition for rank <= N filters
(WindowGroupLimit in Spark 3.5+) — the scale path: each shuffle partition
keeps only N rows per key before the final sort, so skewed keys don't
materialize full groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ordering(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def top_n(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    n: int,
    *,
    descending: bool = False,
    rank_function: str = "row_number",
    output_rank_column: str | None = "rn",
) -> DataFrame:
    """Top-N rows per key. `rank_function`: row_number | rank | dense_rank."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[rank_function]
    w = Window.partitionBy(*partition_by).orderBy(*_ordering(order_by, descending))
    ranked = df.withColumn("__rn", fn().over(w)).filter(F.col("__rn") <= n)
    if output_rank_column:
        return ranked.withColumnRenamed("__rn", output_rank_column)
    return ranked.drop("__rn")


def _dedup(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str], descending: bool) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*_ordering(order_by, descending))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]) -> DataFrame:
    """Keep the earliest row per key in `order_by` order (ties: first wins
    deterministically only if order_by is a total order per key — pass a
    tiebreaker column, same requirement the reference imposes)."""
    return _dedup(df, keys, order_by, descending=False)


def dedup_keep_last(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]) -> DataFrame:
    """Keep the latest row per key in `order_by` order."""
    return _dedup(df, keys, order_by, descending=True)
