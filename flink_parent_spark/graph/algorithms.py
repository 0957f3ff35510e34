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


def hits(vertices: DataFrame, edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """HITS hubs & authorities (Gelly linkanalysis/HITS.java parity):
    authority = A^T hub, hub = A authority, iterated n_iter times from the
    all-ones vector, L2-normalized ONCE at the end.

    Per-step normalization (the textbook form) only rescales each vector,
    so in exact arithmetic the final normalized direction is identical —
    and deferring it keeps every intermediate score integer-valued, which
    makes the decimal accumulation bit-exact cross-engine (quantizing the
    small normalized doubles at a fixed decimal scale is exactly where two
    engines' double->decimal casts can disagree at the cut digit).
    Output: (id, hub, authority), each unit-L2."""
    import math

    scores = (
        vertices.select("id")
        .withColumn("hub", F.lit(1.0))
        .withColumn("authority", F.lit(1.0))
    )
    for _ in range(n_iter):
        raw_auth = (
            edges.join(scores, edges.src == scores.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub").cast("decimal(38,0)")).cast("double").alias("ra"))
        )
        scores = (
            scores.select("id", "hub")
            .join(raw_auth, "id", "left")
            .withColumn("authority", F.coalesce("ra", F.lit(0.0)))
            .drop("ra")
        )
        raw_hub = (
            edges.join(scores.select("id", "authority"), edges.dst == scores.id)
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum(F.col("authority").cast("decimal(38,0)"))
                .cast("double")
                .alias("rh")
            )
        )
        scores = (
            scores.select("id", "authority")
            .join(raw_hub, "id", "left")
            .withColumn("hub", F.coalesce("rh", F.lit(0.0)))
            .drop("rh")
        )
        scores = _materialize(scores)

    def _l2(col: str) -> float:
        row = scores.agg(
            F.sum((F.col(col) * F.col(col)).cast("decimal(38,0)"))
            .cast("double")
            .alias("s")
        ).collect()[0]
        # math.sqrt, not ** 0.5: pow(x, 0.5) may differ from IEEE sqrt
        return math.sqrt(float(row["s"] or 0.0))

    na, nh = _l2("authority"), _l2("hub")
    return scores.select(
        "id",
        (F.col("hub") / F.lit(nh) if nh > 0 else F.lit(0.0)).alias("hub"),
        (F.col("authority") / F.lit(na) if na > 0 else F.lit(0.0)).alias("authority"),
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient (Gelly clustering/LocalClusteringCoefficient
    parity): per vertex, 2 * triangles / (deg * (deg - 1)); 0 when deg < 2.
    Triangles enumerated as ordered 3-cliques, each credited to its three
    corners. Output: (id, degree, triangles, coefficient)."""
    e = (
        _undirect(edges)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    ab = e
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    per_vertex = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_vertex, "id", "left")
        .withColumn("triangles", F.coalesce("triangles", F.lit(0)))
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.col("triangles").cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def jaccard_index(edges: DataFrame) -> DataFrame:
    """Jaccard vertex similarity (Gelly similarity/JaccardIndex.java):
    for each vertex pair sharing >= 1 neighbor, |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
    over the undirected neighborhoods. Inverted-index join on the shared
    neighbor — pairs never materialize beyond those with a common neighbor
    (the same never-O(n^2) shape as the dedup operators).
    Output: (id_a, id_b, shared, deg_a, deg_b, jaccard) with id_a < id_b."""
    und = _undirect(edges)  # (src, dst): dst is a neighbor of src
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    a = und.select(F.col("src").alias("id_a"), F.col("dst").alias("nbr"))
    b = und.select(F.col("src").alias("id_b"), F.col("dst").alias("nbr"))
    shared = (
        a.join(b, "nbr")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(deg.select(F.col("id").alias("id_a"), F.col("deg").alias("deg_a")), "id_a")
        .join(deg.select(F.col("id").alias("id_b"), F.col("deg").alias("deg_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("shared")).cast("double"),
        )
        .select("id_a", "id_b", "shared", "deg_a", "deg_b", "jaccard")
    )


def summarize(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Graph summarization (Gelly library/Summarization.java): collapse
    vertices by a grouping value; output one super-edge per (src_group,
    dst_group) with its edge count. vertices: (id, grp); edges directed.
    Output: (src_grp, dst_grp, n_edges)."""
    vg = vertices.select("id", "grp")
    return (
        edges.join(vg.select(F.col("id").alias("src"), F.col("grp").alias("src_grp")), "src")
        .join(vg.select(F.col("id").alias("dst"), F.col("grp").alias("dst_grp")), "dst")
        .groupBy("src_grp", "dst_grp")
        .agg(F.count("*").alias("n_edges"))
    )


def community_detection(
    vertices: DataFrame, edges: DataFrame, n_iter: int = 2, delta: float = 0.5
) -> DataFrame:
    """Community detection (Gelly library/CommunityDetection.java — the
    score-attenuated label propagation of Leung et al.): vertices carry
    (label, score); each superstep a vertex adopts the neighbor label with
    the highest SUMMED score (VertexLabelUpdater's receivedLabelsWithScores,
    ties to the smallest label, matching the TreeMap ascending scan with
    strict `>`), then re-scores itself to the HIGHEST SINGLE message of the
    winning label (labelsWithHighestScore), attenuated by delta/superstep
    only when the label actually changed
    (CommunityDetection.java:119-171). Unweighted-edge variant,
    decimal-summed vote totals for cross-engine determinism.
    Output: (id, label, score)."""
    und = _materialize(_undirect(edges))
    state = (
        vertices.select("id")
        .withColumn("label", F.col("id"))
        .withColumn("score", F.lit(1.0))
    )
    for i in range(n_iter):
        msgs = (
            und.join(state, und.src == state.id)
            .select(F.col("dst").alias("id"), "label", "score")
        )
        per_label = msgs.groupBy("id", "label").agg(
            F.sum(F.col("score").cast("decimal(38,6)")).cast("double").alias("s"),
            F.max("score").alias("m"),
        )
        best = (
            per_label.groupBy("id")
            .agg(
                F.max_by(
                    F.struct(F.col("label"), F.col("m")),
                    F.struct(F.col("s"), -F.col("label")),
                ).alias("w")
            )
            .select(
                "id",
                F.col("w.label").alias("new_label"),
                F.col("w.m").alias("best_m"),
            )
        )
        state = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                F.when(F.col("new_label").isNull(), F.col("score"))
                .when(
                    F.col("new_label") != F.col("label"),
                    F.col("best_m") - F.lit(delta) / F.lit(float(i + 1)),
                )
                .otherwise(F.col("best_m"))
                .alias("score"),
            )
        )
        state = _materialize(state)
    return state


def adamic_adar(edges: DataFrame, hub_cap: int | None = None) -> DataFrame:
    """Adamic-Adar vertex similarity (Gelly similarity/AdamicAdar.java):
    for each vertex pair with >= 1 common neighbor,
    score = sum over common neighbors w of 1/ln(deg(w)). Inverted-index
    join on the shared neighbor (never materializes O(n^2) pairs); the
    per-neighbor weight is quantized to 9 decimals (JVM and C libm ln()
    differ in the last ulp) and summed through a fixed-scale decimal so
    the total is order-independent and bit-identical across engines.
    Output: (id_a, id_b, score) with id_a < id_b; neighbors of degree 1
    contribute nothing and degree-1-only pairs never appear (1/ln(1)
    undefined — Gelly filters them the same way).

    hub_cap: optional degree ceiling for the SHARED-neighbor join (the
    100 TB guard — a degree-d hub fans out d^2/2 candidate pairs; capping
    drops neighbors above the ceiling like the Jaccard verb's
    MaximumScore/hub-cap knob). Default None = the reference's exact
    uncapped semantics; a hub's 1/ln(deg) weight is tiny anyway, so the
    cap trades a vanishing score term for bounded fan-out."""
    und = _undirect(edges)
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("deg"))
    # weight of a shared neighbor w: 1/ln(deg(w)), deg >= 2
    w = deg.filter(F.col("deg") >= 2).withColumn(
        "weight", F.round(F.lit(1.0) / F.log(F.col("deg").cast("double")), 9)
    )
    if hub_cap is not None:
        w = w.filter(F.col("deg") <= hub_cap)
    nb = und.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    if hub_cap is not None:
        # filter BEFORE the self-join so the hub fan-out never happens;
        # the semi-join shuffles on w, which the self-join needs anyway
        nb = nb.join(w.select("w"), "w", "left_semi")
    a = nb.select("w", F.col("u").alias("id_a"))
    b = nb.select("w", F.col("u").alias("id_b"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(w.select("w", "weight"), "w")
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("weight").cast("decimal(30,9)"))
            .cast("double")
            .alias("score")
        )
    )
    return pairs


def scatter_gather(
    vertices: DataFrame,
    edges: DataFrame,
    initial_expr: str,
    message_expr: str,
    aggregate,
    update_expr: str,
    n_iter: int,
    directed: bool = False,
) -> DataFrame:
    """Generic scatter-gather iteration framework (Gelly
    spargel/ScatterGatherIteration.java re-expressed declaratively):

    - scatter: every edge src->dst sends `message_expr` (an SQL expression
      over the source's (id, value) state) to dst;
    - gather: per-vertex `aggregate` (a pyspark aggregate function) over
      the incoming `__msg` column;
    - update: `update_expr` over (id, value, __agg) produces the next
      value; vertices with no messages see __agg = NULL.

    Each superstep is one shuffle-by-dst + one state join — the same
    dataflow the per-algorithm loops in this module use, offered as the
    reusable surface Gelly exposes. Expressions keep every superstep in
    Catalyst (no Python in the loop body). Output: (id, value)."""
    und = _materialize(
        edges.select("src", "dst") if directed else _undirect(edges)
    )
    state = _materialize(
        vertices.select("id").withColumn("value", F.expr(initial_expr))
    )
    for _ in range(n_iter):
        msgs = (
            und.join(state, und.src == state.id)
            .select(F.col("dst").alias("id"), F.expr(message_expr).alias("__msg"))
            .filter(F.col("__msg").isNotNull())
        )
        agg = msgs.groupBy("id").agg(aggregate(F.col("__msg")).alias("__agg"))
        state = _materialize(
            state.join(agg, "id", "left").select(
                "id", F.expr(update_expr).alias("value")
            )
        )
    return state


def gsa_iteration(
    vertices: DataFrame,
    edges: DataFrame,
    initial_expr: str,
    gather_expr: str,
    sum_agg,
    apply_expr: str,
    n_iter: int,
    directed: bool = False,
) -> DataFrame:
    """Gather-sum-apply iteration (Gelly gsa/GatherSumApplyIteration.java):
    GATHER evaluates `gather_expr` per in-edge over the neighbor's (id,
    value) state, SUM combines with `sum_agg`, APPLY updates the vertex via
    `apply_expr` over (id, value, __agg). Identical dataflow to
    `scatter_gather` — Gelly exposes both decompositions and so do we; the
    per-superstep plan (one shuffle by target vertex + one state join) is
    shared."""
    return scatter_gather(
        vertices, edges, initial_expr, gather_expr, sum_agg, apply_expr,
        n_iter, directed,
    )


def sssp_weighted(
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    max_iter: int = 10,
) -> DataFrame:
    """Weighted single-source shortest paths (the actual contract of Gelly
    library/SingleSourceShortestPaths.java — `sssp_hops` is the unweighted
    special case): Bellman-Ford-style frontier relaxation over directed
    edges (src, dst, weight). Each superstep relaxes candidates through the
    current frontier only — one shuffle per superstep, distances
    decimal-summed for cross-engine determinism. Output: (id, dist) for
    reachable vertices."""
    e = _materialize(
        edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )
    dist = _materialize(
        vertices.select("id")
        .filter(F.col("id") == source)
        .withColumn("dist", F.lit(0.0))
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            e.join(frontier, e.src == frontier.id)
            .select(
                F.col("dst").alias("id"),
                (
                    F.col("dist").cast("decimal(30,9)")
                    + F.col("w").cast("decimal(30,9)")
                )
                .cast("double")
                .alias("dist"),
            )
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        # improvements: strictly shorter than any known distance
        improved = _materialize(
            cand.join(
                dist.select(F.col("id"), F.col("dist").alias("old")), "id", "left"
            )
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("id", "dist")
        )
        if improved.isEmpty():
            break
        dist = _materialize(
            dist.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    return dist
