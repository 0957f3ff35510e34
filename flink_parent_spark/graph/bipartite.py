"""Bipartite graphs: projections onto one vertex side.

Reference: flink-gelly/.../graph/bipartite/BipartiteGraph.java —
projectionTopSimple:130 (single self-join on the shared bottom vertex,
edge value = the pair of original edge values), projectionBottomSimple
(symmetric), and the *Full variants which also carry the intermediate
vertex. Spark-first: the projection IS an equi-self-join on the opposite
side's key — Catalyst shuffles both sides once on that key (or broadcasts
when one side is small), no custom operator needed.

Skew note for 100 TB: a bottom vertex connected to k tops contributes k^2
projected edges — the same quadratic blow-up the reference has. Cap hub
vertices with `max_opposite_degree` (drop bottoms above the cap before the
join), the standard guard for power-law bipartite graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bipartite_projection_simple(
    edges: DataFrame,
    top_col: str = "top_id",
    bottom_col: str = "bottom_id",
    value_col: str | None = None,
    side: str = "top",
    max_opposite_degree: int | None = None,
) -> DataFrame:
    """Simple projection onto `side` ('top' or 'bottom'): an edge
    (src, dst) exists per shared opposite-side vertex; with `value_col`
    the output carries (value_src, value_dst) like the reference's
    Tuple2<EV, EV>. Output: (src, dst [, value_src, value_dst],
    via) where `via` is the shared opposite vertex (the Full variant's
    intermediate-vertex information)."""
    keep, other = (
        (top_col, bottom_col) if side == "top" else (bottom_col, top_col)
    )
    e = edges
    if max_opposite_degree is not None:
        deg = e.groupBy(other).agg(F.count("*").alias("__deg"))
        e = e.join(
            F.broadcast(deg.where(F.col("__deg") <= max_opposite_degree)),
            other,
        ).drop("__deg")
    cols_a = [F.col(keep).alias("src"), F.col(other).alias("via")]
    cols_b = [F.col(keep).alias("dst"), F.col(other).alias("via")]
    if value_col is not None:
        cols_a.append(F.col(value_col).alias("value_src"))
        cols_b.append(F.col(value_col).alias("value_dst"))
    a, b = e.select(*cols_a), e.select(*cols_b)
    return a.join(b, "via").where(F.col("src") != F.col("dst"))
