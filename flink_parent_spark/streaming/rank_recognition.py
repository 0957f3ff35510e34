"""Streaming rank-pattern recognition — the planner rule that turns the
ROW_NUMBER-subquery SQL idiom into a stateful Top-N / Deduplicate operator.

Reference parity: Flink's blink planner recognizes

    SELECT ... FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o [DESC]) AS rn
      FROM S) WHERE rn <= N            -- or rn = 1

on a streaming scan and plans a Rank / Deduplicate exec node instead of an
OVER window (FlinkLogicalRankRule.scala, CalcRankTransposeTransposeRule,
RankNumberColumnRemoveRule.scala, StreamExecDeduplicateRule.scala in
flink-table-planner-blink/.../plan/rules/). The rewrite is *necessary*, not
just an optimization: neither Flink nor Spark supports a plain row-number
window over an unbounded stream, so without recognition the statement is
simply rejected.

Spark mapping: the recognized pattern routes to `streaming_top_n` (state
holds at most N rows per key) or, for `rn = 1` on an event-time order with
the rank column projected away, to `streaming_dedup` keep-first/keep-last —
the same split the reference makes between StreamExecRank and
StreamExecDeduplicate. RankNumberColumnRemoveRule parity: when the outer
SELECT does not reference the rank alias, the rank column is dropped from
the emitted rows (and the cheaper dedup op becomes eligible).

Out of scope (as in the reference's rule set, which bails to a generic
plan): rank ranges with a lower bound > 1 (`rn BETWEEN 5 AND 10`),
RANK()/DENSE_RANK() functions, and expressions (not bare columns) in
PARTITION BY / ORDER BY.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["RankSpec", "recognize_rank_query", "apply_rank_spec"]


@dataclass
class RankSpec:
    source: str
    partition_by: list[str]
    order_col: str
    descending: bool
    tiebreak: str | None
    n: int
    rank_alias: str
    select: list[str] | None  # None = SELECT *
    inner_where: str | None = None
    payload_override: list[str] = field(default_factory=list)
    # ConstantRankRange(N, N) (`rn = N`, N > 1): emit only rank N
    rank_eq: int | None = None


_PATTERN = re.compile(
    r"""^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s*\(\s*
        SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s+OVER\s*\(\s*
        PARTITION\s+BY\s+(?P<part>[\w\s,]+?)\s+
        ORDER\s+BY\s+(?P<ord>[\w\s,]+?)\s*\)\s+AS\s+(?P<alias>\w+)\s+
        FROM\s+(?P<src>\w+)
        (?:\s+WHERE\s+(?P<iwhere>.+?))?\s*\)\s*
        (?:(?:AS\s+)?(?!WHERE\b)\w+\s+)?
        WHERE\s+(?P<pred>.+?)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_PRED_LE = re.compile(r"^(?P<a>\w+)\s*(?P<op><=|<|=)\s*(?P<n>\d+)$")
_PRED_GE = re.compile(r"^(?P<n>\d+)\s*(?P<op>>=|>|=)\s*(?P<a>\w+)$")


def _parse_order(ord_sql: str) -> tuple[str, bool, str | None] | None:
    """ORDER BY items -> (order_col, descending, tiebreak). At most two
    items; the second (the determinism tie-break) must be ascending."""
    items = [i.strip() for i in ord_sql.split(",") if i.strip()]
    if not 1 <= len(items) <= 2:
        return None
    toks = items[0].split()
    if len(toks) > 2 or (len(toks) == 2 and toks[1].upper() not in ("ASC", "DESC")):
        return None
    order_col = toks[0]
    descending = len(toks) == 2 and toks[1].upper() == "DESC"
    tiebreak = None
    if len(items) == 2:
        toks2 = items[1].split()
        if len(toks2) == 2 and toks2[1].upper() == "ASC":
            toks2 = toks2[:1]
        if len(toks2) != 1:
            return None  # descending tie-break: bail to the generic plan
        tiebreak = toks2[0]
    return order_col, descending, tiebreak


def recognize_rank_query(sql: str) -> RankSpec | None:
    """Return a RankSpec when `sql` is the rank-pattern idiom, else None
    (the caller falls through to the generic Catalyst plan)."""
    m = _PATTERN.match(sql.strip())
    if m is None:
        return None
    pred = m.group("pred").strip()
    pm = _PRED_LE.match(pred) or _PRED_GE.match(pred)
    if pm is None or pm.group("a").lower() != m.group("alias").lower():
        return None
    n = int(pm.group("n"))
    rank_eq = None
    if pm.group("op") in ("<", ">"):
        n -= 1  # rn < N  ==  rn <= N-1
    elif pm.group("op") == "=" and n != 1:
        # `rn = N` with N > 1 is ConstantRankRange(N, N) in the reference
        # (FlinkLogicalRankRule) — only rank N is emitted. Plan Top-N
        # with state bound N and filter the output to rank = N.
        rank_eq = n
    if n < 1:
        return None
    parsed = _parse_order(m.group("ord"))
    if parsed is None:
        return None
    order_col, descending, tiebreak = parsed
    sel = m.group("sel").strip()
    select = None if sel == "*" else [c.strip() for c in sel.split(",")]
    if select is not None and any(not re.fullmatch(r"\w+", c) for c in select):
        return None  # expressions in the outer projection: generic plan
    return RankSpec(
        source=m.group("src"),
        partition_by=[c.strip() for c in m.group("part").split(",")],
        order_col=order_col,
        descending=descending,
        tiebreak=tiebreak,
        n=n,
        rank_alias=m.group("alias"),
        select=select,
        inner_where=m.group("iwhere"),
        rank_eq=rank_eq,
    )


def apply_rank_spec(df: DataFrame, spec: RankSpec) -> DataFrame:
    """Plan the recognized pattern on a streaming DataFrame: Deduplicate
    when eligible (rn = 1, event-time order, rank projected away, no
    tie-break), else streaming Top-N; then apply the outer projection."""
    from flink_parent_spark.streaming.stateful import (  # noqa: PLC0415
        streaming_dedup,
        streaming_top_n,
    )

    src = df.filter(spec.inner_where) if spec.inner_where else df
    payload = [
        c
        for c in src.columns
        if c not in (*spec.partition_by, spec.order_col)
    ]
    wants_rank = spec.select is None or any(
        c.lower() == spec.rank_alias.lower() for c in spec.select
    )
    if spec.rank_eq is not None:
        wants_rank = True  # the range filter needs the rank column
    is_time_order = isinstance(
        src.schema[spec.order_col].dataType,
        (T.TimestampType, T.TimestampNTZType),
    )
    if spec.n == 1 and is_time_order and not wants_rank and spec.tiebreak is None:
        out = streaming_dedup(
            src,
            spec.partition_by,
            spec.order_col,
            payload,
            keep="last" if spec.descending else "first",
        )
        rank_out = None
    else:
        out = streaming_top_n(
            src,
            spec.partition_by,
            spec.order_col,
            spec.n,
            payload,
            descending=spec.descending,
            tiebreak_col=spec.tiebreak,
        )
        rank_out = "rank"
        if spec.rank_eq is not None:
            # ConstantRankRange(N, N): state still bounds at N rows/key,
            # only the row AT rank N is emitted (FlinkLogicalRankRule)
            out = out.filter(F.col(rank_out) == spec.rank_eq)

    if spec.select is None:
        if rank_out is not None and spec.rank_alias != rank_out:
            out = out.withColumnRenamed(rank_out, spec.rank_alias)
        return out
    cols = []
    for c in spec.select:
        if rank_out is not None and c.lower() == spec.rank_alias.lower():
            cols.append(F.col(rank_out).alias(c))
        else:
            cols.append(F.col(c))
    return out.select(*cols)
