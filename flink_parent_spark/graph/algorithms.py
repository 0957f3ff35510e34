"""Graph algorithm library (Gelly parity): connected components, PageRank,
single-source shortest paths, label propagation, triangle count.

Reference: flink-libraries/flink-gelly/.../graph/library/
(ConnectedComponents.java, PageRank in linkanalysis/, SingleSourceShortest
Paths.java, LabelPropagation.java, TriangleEnumerator.java) built on Gelly's
scatter-gather/GSA iterations. Here the iteration model is the Pregel-style
driver loop over DataFrames:

    state_{i+1} = gather(join(state_i, edges)) aggregated per vertex

Scale notes:
- Each superstep is one shuffle (join on src + groupBy dst). Vertex state is
  localCheckpoint()ed every few supersteps to truncate lineage — without
  that, plan depth grows linearly with iterations and Catalyst re-optimizes
  the whole history each step (the classic iterative-Spark trap).
- Convergence tests (`changes == 0`) cost one extra count per superstep —
  bounded iteration counts avoid it where the algorithm allows.
- PageRank contributions are summed through DECIMAL(28,15) so ranks are
  bit-identical regardless of partitioning — same determinism contract as
  the relational layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint a superstep result: truncates lineage AND makes
    the (convergence probe, next-superstep input) pair read one materialized
    relation instead of recomputing the whole history twice per iteration."""
    return df.localCheckpoint(eager=True)


def _undirect(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Min-id label propagation to fixpoint: component = min vertex id
    reachable. vertices: (id), edges: (src, dst) treated undirected.
    Output: (id, component)."""
    und = _materialize(_undirect(edges))
    labels = _materialize(vertices.select("id", F.col("id").alias("component")))
    # min-label propagation strictly decreases sum(component) until fixpoint,
    # so a scalar sum is a sufficient (and cheap) convergence probe.
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        msgs = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = _materialize(
            labels.join(msgs, "id", "left").select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_min", "component")).alias(
                    "component"
                ),
            )
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def sssp_hops(
    vertices: DataFrame, edges: DataFrame, source: int, max_iter: int = 10
) -> DataFrame:
    """Unweighted single-source shortest path (hop count), undirected.
    Output: (id, dist) for reachable vertices only."""
    und = _materialize(_undirect(edges))
    dist = _materialize(
        vertices.select("id").filter(F.col("id") == source).withColumn("dist", F.lit(0))
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            und.join(frontier, und.src == frontier.id)
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        new_frontier = _materialize(cand.join(dist, "id", "left_anti"))
        if new_frontier.isEmpty():
            break
        dist = _materialize(dist.unionByName(new_frontier))
        frontier = new_frontier
    return dist


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Directed PageRank, fixed iteration count, uniform init 1/N.
    Dangling mass is dropped (reference Gelly PageRank default behaviour for
    its simple variant). Contributions are decimal-summed for cross-engine
    determinism. Output: (id, rank)."""
    n = vertices.count()
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("outdeg"))
    ranks = vertices.select("id").withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(outdeg, edges.src == outdeg.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).cast("decimal(28,15)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        ranks = (
            vertices.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        ranks = _materialize(ranks)
    return ranks


def label_propagation(
    vertices: DataFrame, edges: DataFrame, n_iter: int = 2
) -> DataFrame:
    """Synchronous label propagation: each step every vertex adopts the most
    frequent label among its neighbors (tie -> smallest label; no neighbors
    -> keep own). vertices: (id, label). Output: (id, label)."""
    und = _undirect(edges)
    labels = vertices.select("id", "label")
    for i in range(n_iter):
        counts = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            counts.groupBy("id")
            .agg(F.max_by(F.col("label"), F.struct(F.col("cnt"), -F.col("label"))).alias("new_label"))
        )
        labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("new_label", "label").alias("label"))
        )
        labels = _materialize(labels)
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle enumeration on an undirected simple graph: count via
    ordered 3-cliques (a<b<c). Output: single row (n_triangles)."""
    e = (
        _undirect(edges)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    ab = e
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
    )
    return tri.agg(F.count("*").alias("n_triangles"))
