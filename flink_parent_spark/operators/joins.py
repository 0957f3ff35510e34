"""Join operators Spark lacks as verbs: interval join, temporal/as-of join,
lookup join.

Reference semantics:
- Interval join: TimeIntervalJoin / RowTimeIntervalJoin
  (flink-table-runtime-blink/.../operators/join/interval/), planner
  StreamExecIntervalJoin.scala:54; DataStream KeyedStream.intervalJoin
  (KeyedStream.java:440) — join rows whose event times are within
  [lower, upper] of each other, per key.
- Temporal/as-of join: TemporalRowTimeJoinOperator.java — each left row joins
  the latest right version with right_ts <= left_ts, per key.
- Lookup join: LookupJoinRunner.java — enrich a stream against a (small,
  slowly-changing) table.

Scale design:
- interval_join is a single equi-join on the key plus a range predicate;
  Catalyst executes it as a hash/sort-merge join on the key with the range as
  a post-filter — one shuffle, no row explosion beyond actual matches.
- asof_join uses the union+ordered-window formulation: ONE shuffle of
  (left ∪ right) by key, one in-partition sort, and a running last_value —
  no per-row probe, no broadcast requirement, no skew amplification. This is
  the same algorithm the reference's TemporalRowTimeJoinOperator implements
  with keyed state (sorted right-version buffer); Tungsten sort replaces the
  state buffer in batch.
- lookup_join broadcasts the dimension side explicitly — the 100 TB case is
  a fact table joining a dim that fits in executor memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join rows where right_ts BETWEEN left_ts - lower AND left_ts + upper,
    equi-keyed on `keys` [(left_col, right_col), ...]. Interval bounds are
    SQL interval strings, e.g. '10 minutes'. Right-side columns whose names
    collide with left ones come back suffixed (self-joins are the common
    case for this operator)."""
    renames = {c: c + right_suffix if c in left.columns else c for c in right.columns}
    r = right.select(*[right[c].alias(n) for c, n in renames.items()])
    cond = None
    for lc, rc in keys:
        c = left[lc] == r[renames[rc]]
        cond = c if cond is None else cond & c
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    rts = r[renames[right_ts]]
    cond = cond & (rts >= left[left_ts] - lo) & (rts <= left[left_ts] + hi)
    return left.join(r, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | dict[str, str],
    *,
    strict: bool = False,
) -> DataFrame:
    """Temporal (as-of) join: each left row picks the latest right row with
    right_ts <= left_ts (< if strict) for the same key. Left rows with no
    prior right row keep NULL payload (left-outer semantics, matching
    TemporalRowTimeJoinOperator).

    If several right rows share (key, ts), the one appearing last under an
    arbitrary-but-fixed struct ordering wins — pre-dedup the right side for
    full determinism (same contract as the reference's versioned tables,
    which require a primary key).
    """
    if not isinstance(right_payload, dict):
        right_payload = {c: c for c in right_payload}
    lkeys = [k for k, _ in keys]
    payload = F.struct(
        *[right[src].alias(out) for out, src in right_payload.items()]
    ).alias("__payload")
    r = right.select(
        *[right[rc].alias(lc) for lc, rc in keys],
        right[right_ts].alias("__ts"),
        F.lit(0).alias("__side"),
        payload,
    )
    l = left.select(
        "*",
        left[left_ts].alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # strict '<': order left rows before right rows at equal ts so the
    # running last_value can't see a same-ts right row.
    side_order = F.col("__side") if not strict else -F.col("__side")
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(F.col("__ts"), side_order, F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        l.select(*left.columns, "__ts", "__side", "__payload")
        .unionByName(
            r.select(
                *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in lkeys else F.col(c) for c in left.columns],
                "__ts",
                "__side",
                "__payload",
            )
        )
        .withColumn("__matched", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return joined.select(
        *left.columns, *[F.col(f"__matched.{c}").alias(c) for c in right_payload]
    )


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[tuple[str, str]],
    how: str = "left",
) -> DataFrame:
    """Enrichment join against a broadcast-sized dimension table."""
    cond = None
    for fc, dc in keys:
        c = fact[fc] == dim[dc]
        cond = c if cond is None else cond & c
    return fact.join(F.broadcast(dim), cond, how)
