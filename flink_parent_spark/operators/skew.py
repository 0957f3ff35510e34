"""Skew-resistant join: explicit key salting.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.*, enabled by the
session defaults) handles most skew at runtime; explicit salting remains the
tool when one side must be replicated deterministically (e.g. hot-key fact ⋈
mid-size dim that is too big to broadcast). Reference analog: Flink handles
this case by hash-partition tuning / two-stage aggregates
(SplitAggregateRule.scala for aggregation skew).

Mechanics: the skewed (probe) side gets a random salt in [0, factor); the
build side is replicated `factor` times; the join key becomes
(key, salt) — hot keys spread over `factor` reducers at the cost of
replicating the build side."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated
    `factor`x. Result column set matches a plain join (salt columns are
    dropped)."""
    s = skewed.withColumn("__salt", (F.rand(seed=42) * factor).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    joined = s.join(
        o,
        (s[skewed_key] == o[other_key]) & (s["__salt"] == o["__salt"]),
        how,
    )
    return joined.drop(s["__salt"]).drop(o["__salt"])
