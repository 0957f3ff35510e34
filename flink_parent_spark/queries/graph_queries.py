"""Graph-library queries (Gelly parity) over a bipartite supplier-part graph
derived from lineitem: part vertices are offset by 1_000_000 so both vertex
families share one id space.

Oracles recompute the algorithms independently in SQL: recursive CTEs for
reachability (CC, SSSP) and manually unrolled iterations for PageRank/label
propagation — decimal-summed where floating accumulation occurs, and all
double literals forced through CAST(... AS DOUBLE) so both engines do the
same IEEE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parent_spark.graph.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    sssp_hops,
    triangle_count,
)
from flink_parent_spark.queries.registry import df_query
from flink_parent_spark.tables import load_tables

_PART_OFFSET = 1_000_000

_DUCK_EDGES = f"""
    edges AS (
      SELECT DISTINCT {_PART_OFFSET} + l_partkey AS src, l_suppkey AS dst
      FROM lineitem
    ),
    und AS (
      SELECT src, dst FROM edges
      UNION
      SELECT dst AS src, src AS dst FROM edges
    ),
    verts AS (
      SELECT DISTINCT dst AS id FROM edges
      UNION
      SELECT DISTINCT src AS id FROM edges
    )
"""


def _spark_graph(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    edges = li.select(
        (F.lit(_PART_OFFSET) + F.col("l_partkey")).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).distinct()
    vertices = (
        edges.select(F.col("dst").alias("id"))
        .unionByName(edges.select(F.col("src").alias("id")))
        .distinct()
    )
    return vertices, edges


def _cc_oracle(n_iter: int = 12) -> str:
    """Unrolled min-label propagation: one join+min per superstep over the
    label table — O(E * n_iter), vastly cheaper than the V*V reachability
    closure a recursive CTE materializes. n_iter must exceed the graph
    diameter; a too-small value shows up as a visible mismatch (the Spark
    side iterates to true fixpoint), never as a false pass."""
    prev = "cc0"
    ctes = ["cc0 AS MATERIALIZED (SELECT id, id AS component FROM verts)"]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""
    cc{i} AS MATERIALIZED (
      SELECT p.id,
             LEAST(p.component, COALESCE(m.nbr_min, p.component)) AS component
      FROM {prev} p LEFT JOIN (
        SELECT u.dst AS id, MIN(q.component) AS nbr_min
        FROM und u JOIN {prev} q ON u.src = q.id
        GROUP BY u.dst) m ON p.id = m.id)"""
        )
        prev = f"cc{i}"
    return f"WITH {_DUCK_EDGES}, {','.join(ctes)} SELECT id, component FROM {prev}"


@df_query("graph_connected_components", oracle=_cc_oracle(12))
def graph_connected_components(spark, sf_dir):
    v, e = _spark_graph(spark, sf_dir)
    return connected_components(v, e, max_iter=30)


@df_query(
    "graph_sssp_hops",
    oracle=f"""
    WITH RECURSIVE {_DUCK_EDGES},
    walk(id, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION
      SELECT u.dst, w.d + 1
      FROM walk w JOIN und u ON u.src = w.id
      WHERE w.d < 8
    )
    SELECT id, MIN(d) AS dist FROM walk GROUP BY id
    """,
)
def graph_sssp_hops(spark, sf_dir):
    v, e = _spark_graph(spark, sf_dir)
    return sssp_hops(v, e, source=0, max_iter=8)


def _pagerank_oracle(n_iter: int = 3) -> str:
    base = "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT c FROM n)"
    prev = "pr0"
    ctes = [
        f"""
    outdeg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS c FROM verts),
    pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT c FROM n) AS rank FROM verts)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""
    pr{i} AS (
      SELECT v.id,
             {base} + CAST(0.85 AS DOUBLE) * COALESCE(s.inflow, CAST(0 AS DOUBLE))
               AS rank
      FROM verts v LEFT JOIN (
        SELECT e.dst AS id,
               CAST(SUM(CAST(p.rank / o.odeg AS DECIMAL(28,15))) AS DOUBLE)
                 AS inflow
        FROM edges e
        JOIN {prev} p ON e.src = p.id
        JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst) s ON v.id = s.id)"""
        )
        prev = f"pr{i}"
    return f"WITH {_DUCK_EDGES}, {','.join(ctes)} SELECT id, rank FROM {prev}"


@df_query("graph_pagerank", oracle=_pagerank_oracle(3))
def graph_pagerank(spark, sf_dir):
    v, e = _spark_graph(spark, sf_dir)
    return pagerank(v, e, n_iter=3, damping=0.85)


def _lp_oracle(n_iter: int = 2) -> str:
    prev = "lp0"
    ctes = ["lp0 AS (SELECT id, id AS label FROM verts)"]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""
    cnt{i} AS (
      SELECT u.dst AS id, p.label, COUNT(*) AS c
      FROM und u JOIN {prev} p ON u.src = p.id
      GROUP BY u.dst, p.label),
    best{i} AS (
      SELECT id, label AS new_label,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
      FROM cnt{i}),
    lp{i} AS (
      SELECT p.id, COALESCE(b.new_label, p.label) AS label
      FROM {prev} p LEFT JOIN (SELECT id, new_label FROM best{i} WHERE rn = 1) b
        ON p.id = b.id)"""
        )
        prev = f"lp{i}"
    return f"WITH {_DUCK_EDGES}, {','.join(ctes)} SELECT id, label FROM {prev}"


@df_query("graph_label_propagation", oracle=_lp_oracle(2))
def graph_label_propagation(spark, sf_dir):
    v, e = _spark_graph(spark, sf_dir)
    init = v.withColumn("label", F.col("id"))
    return label_propagation(init, e, n_iter=2)


@df_query(
    "graph_triangle_count",
    oracle="""
    WITH cosupply AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey < 60) a
      JOIN (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey < 60) b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
    )
    SELECT COUNT(*) AS n_triangles
    FROM cosupply ab
    JOIN cosupply bc ON ab.pb = bc.pa
    JOIN cosupply ac ON ab.pa = ac.pa AND bc.pb = ac.pb
    """,
)
def graph_triangle_count(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    sp = (
        t["lineitem"]
        .filter(F.col("l_partkey") < 60)
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    a = sp.select(F.col("l_suppkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = sp.select(F.col("l_suppkey").alias("k"), F.col("l_partkey").alias("pb"))
    cosupply = (
        a.join(b, "k").filter(F.col("pa") < F.col("pb")).select("pa", "pb").distinct()
    )
    edges = cosupply.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    return triangle_count(edges)


def _hits_oracle(n_iter: int = 2) -> str:
    """Unrolled HITS mirroring `hits()`: UNNORMALIZED half-steps (integer-
    valued raw scores, decimal-exact) with a single L2 normalization at the
    end — per-step normalization only rescales, and quantizing normalized
    doubles mid-stream is exactly where cross-engine decimal casts can
    disagree."""
    prev = "s0"
    ctes = [
        "s0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub,"
        " CAST(1.0 AS DOUBLE) AS authority FROM verts)"
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
    ra{i} AS (SELECT e.dst AS id,
                     CAST(SUM(CAST(p.hub AS DECIMAL(38,0))) AS DOUBLE) AS ra
              FROM edges e JOIN {prev} p ON e.src = p.id GROUP BY e.dst),
    sa{i} AS (SELECT v.id, p.hub,
                     COALESCE(r.ra, CAST(0 AS DOUBLE)) AS authority
              FROM verts v JOIN {prev} p ON v.id = p.id
              LEFT JOIN ra{i} r ON v.id = r.id),
    rh{i} AS (SELECT e.src AS id,
                     CAST(SUM(CAST(p.authority AS DECIMAL(38,0))) AS DOUBLE) AS rh
              FROM edges e JOIN sa{i} p ON e.dst = p.id GROUP BY e.src),
    sh{i} AS (SELECT v.id,
                     COALESCE(r.rh, CAST(0 AS DOUBLE)) AS hub,
                     p.authority
              FROM verts v JOIN sa{i} p ON v.id = p.id
              LEFT JOIN rh{i} r ON v.id = r.id)""")
        prev = f"sh{i}"
    return f"""WITH {_DUCK_EDGES}, {','.join(ctes)},
    na AS (SELECT sqrt(CAST(SUM(CAST(authority * authority AS DECIMAL(38,0)))
                            AS DOUBLE)) AS n FROM {prev}),
    nh AS (SELECT sqrt(CAST(SUM(CAST(hub * hub AS DECIMAL(38,0)))
                            AS DOUBLE)) AS n FROM {prev})
    SELECT id, hub / (SELECT n FROM nh) AS hub,
           authority / (SELECT n FROM na) AS authority
    FROM {prev}"""


@df_query("graph_hits", oracle=_hits_oracle(2))
def graph_hits(spark, sf_dir):
    """HITS hubs/authorities on the directed part->supplier graph (Gelly
    linkanalysis/HITS.java). 2 fixed iterations; oracle unrolls both."""
    from flink_parent_spark.graph.algorithms import hits

    v, e = _spark_graph(spark, sf_dir)
    return hits(v, e, n_iter=2)


_DUCK_COSUPPLY = """
    cosupply AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey < 60) a
      JOIN (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey < 60) b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
    )
"""


@df_query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_DUCK_COSUPPLY},
    deg AS (
      SELECT id, COUNT(*) AS degree FROM (
        SELECT pa AS id FROM cosupply UNION ALL SELECT pb FROM cosupply) u
      GROUP BY id
    ), tri AS (
      SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
      FROM cosupply ab
      JOIN cosupply bc ON ab.pb = bc.pa
      JOIN cosupply ac ON ab.pa = ac.pa AND bc.pb = ac.pb
    ), pv AS (
      SELECT id, COUNT(*) AS triangles FROM (
        SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) u
      GROUP BY id
    )
    SELECT d.id, d.degree, COALESCE(p.triangles, 0) AS triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * CAST(COALESCE(p.triangles, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS coefficient
    FROM deg d LEFT JOIN pv p ON d.id = p.id
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient on the part co-supply graph (Gelly
    clustering/LocalClusteringCoefficient parity)."""
    from flink_parent_spark.graph.algorithms import clustering_coefficient

    t = load_tables(spark, sf_dir)
    sp = (
        t["lineitem"]
        .filter(F.col("l_partkey") < 60)
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    a = sp.select(F.col("l_suppkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = sp.select(F.col("l_suppkey").alias("k"), F.col("l_partkey").alias("pb"))
    cosupply = (
        a.join(b, "k").filter(F.col("pa") < F.col("pb")).select("pa", "pb").distinct()
    )
    edges = cosupply.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    return clustering_coefficient(edges)


@df_query(
    "graph_jaccard_similarity",
    oracle=f"""
    WITH {_DUCK_EDGES},
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
    shared AS (
      SELECT a.src AS id_a, b.src AS id_b, COUNT(*) AS shared
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
      GROUP BY a.src, b.src
    )
    SELECT s.id_a, s.id_b, s.shared, da.deg AS deg_a, db.deg AS deg_b,
           CAST(s.shared AS DOUBLE) / CAST(da.deg + db.deg - s.shared AS DOUBLE)
             AS jaccard
    FROM shared s
    JOIN deg da ON da.id = s.id_a
    JOIN deg db ON db.id = s.id_b
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 10000
    """,
)
def graph_jaccard_similarity(spark, sf_dir):
    """Jaccard neighborhood similarity (Gelly similarity/JaccardIndex.java)
    on the bipartite supplier-part graph via inverted-index join.

    Output capped to a deterministic top-10k (total order: score desc, then
    the unique pair key) — the full pair set is ~2M rows at sf0.01, which is
    result-set bloat, not extra coverage; the cap exercises the same plan plus
    a TakeOrdered."""
    from flink_parent_spark.graph.algorithms import jaccard_index

    _, e = _spark_graph(spark, sf_dir)
    return (
        jaccard_index(e)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(10000)
    )


@df_query(
    "graph_summarize_by_nation",
    oracle=f"""
    WITH {_DUCK_EDGES},
    vg AS (
      SELECT id,
             CASE WHEN id >= {_PART_OFFSET} THEN -1
                  ELSE (SELECT s_nationkey FROM supplier s
                        WHERE s.s_suppkey = verts.id) END AS grp
      FROM verts
    )
    SELECT sg.grp AS src_grp, dg.grp AS dst_grp, COUNT(*) AS n_edges
    FROM edges e
    JOIN vg sg ON e.src = sg.id
    JOIN vg dg ON e.dst = dg.id
    GROUP BY sg.grp, dg.grp
    """,
)
def graph_summarize_by_nation(spark, sf_dir):
    """Graph summarization (Gelly library/Summarization.java): collapse the
    part->supplier graph into super-edges part-pool -> supplier-nation."""
    from flink_parent_spark.graph.algorithms import summarize

    t = load_tables(spark, sf_dir)
    v, e = _spark_graph(spark, sf_dir)
    supp = t["supplier"].select(
        F.col("s_suppkey").alias("id"), F.col("s_nationkey").alias("g")
    )
    vg = (
        v.join(supp, "id", "left")
        .withColumn(
            "grp",
            F.when(F.col("id") >= _PART_OFFSET, F.lit(-1)).otherwise(F.col("g")),
        )
        .select("id", "grp")
    )
    return summarize(vg, e)


def _community_oracle(n_iter: int = 2, delta: float = 0.5) -> str:
    """Unrolled community detection encoding the REFERENCE update rule
    (Gelly CommunityDetection.java:119-171): winning label by summed score
    (ties to smallest label), new score = highest single message of the
    winning label, minus delta/superstep only when the label changed."""
    prev = "cd0"
    ctes = [
        "cd0 AS (SELECT id, id AS label, CAST(1.0 AS DOUBLE) AS score FROM verts)"
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
    sm{i} AS (
      SELECT u.dst AS id, p.label,
             CAST(SUM(CAST(p.score AS DECIMAL(38,6))) AS DOUBLE) AS s,
             MAX(p.score) AS m
      FROM und u JOIN {prev} p ON u.src = p.id
      GROUP BY u.dst, p.label),
    bs{i} AS (
      SELECT id, label AS new_label, m AS best_m,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY s DESC, label) AS rn
      FROM sm{i}),
    cd{i} AS (
      SELECT p.id, COALESCE(b.new_label, p.label) AS label,
             CASE WHEN b.new_label IS NULL THEN p.score
                  WHEN b.new_label <> p.label
                    THEN b.best_m - CAST({delta} AS DOUBLE) / CAST({float(i)} AS DOUBLE)
                  ELSE b.best_m END AS score
      FROM {prev} p
      LEFT JOIN (SELECT id, new_label, best_m FROM bs{i} WHERE rn = 1) b
        ON p.id = b.id)""")
        prev = f"cd{i}"
    return f"WITH {_DUCK_EDGES}, {','.join(ctes)} SELECT id, label, score FROM {prev}"


@df_query("graph_community_detection", oracle=_community_oracle(2))
def graph_community_detection(spark, sf_dir):
    """Score-attenuated label propagation (Gelly CommunityDetection.java,
    Leung et al.) on the supplier-part graph; oracle unrolls both
    supersteps."""
    from flink_parent_spark.graph.algorithms import community_detection

    v, e = _spark_graph(spark, sf_dir)
    return community_detection(v, e, n_iter=2, delta=0.5)


@df_query(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_DUCK_EDGES},
    deg AS (SELECT src AS w, COUNT(*) AS deg FROM und GROUP BY src),
    wt AS (
      SELECT w, ROUND(1.0 / LN(CAST(deg AS DOUBLE)), 9) AS weight
      FROM deg WHERE deg >= 2
    ),
    nb AS (SELECT dst AS w, src AS u FROM und)
    SELECT a.u AS id_a, b.u AS id_b,
           CAST(SUM(CAST(wt.weight AS DECIMAL(30,9))) AS DOUBLE) AS score
    FROM nb a JOIN nb b ON a.w = b.w AND a.u < b.u
    JOIN wt ON wt.w = a.w
    GROUP BY a.u, b.u
    ORDER BY score DESC, id_a, id_b
    LIMIT 10000
    """,
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar similarity (Gelly similarity/AdamicAdar.java) on the
    supplier-part graph; deterministic top-10k like the Jaccard query (the
    full pair set is ~2M rows of result bloat at sf0.01)."""
    from flink_parent_spark.graph.algorithms import adamic_adar

    _, e = _spark_graph(spark, sf_dir)
    return (
        adamic_adar(e)
        .orderBy(F.desc("score"), "id_a", "id_b")
        .limit(10000)
    )


def _sssp_weighted_oracle(n_iter: int = 8) -> str:
    """Unrolled Bellman-Ford over the weighted bipartite graph (edge weight
    = MIN(l_quantity) per distinct part-supplier edge): d_i = min(d_{i-1},
    min over in-edges of d_{i-1}[src] + w), decimal-added. V-rows per
    iteration — the weighted analogue of _cc_oracle's unrolling (a
    recursive path walk would enumerate exponentially many distinct
    weighted path sums)."""
    prev = "d0"
    ctes = [
        f"""
    basew AS (
      SELECT {_PART_OFFSET} + l_partkey AS src, l_suppkey AS dst,
             MIN(l_quantity) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    undw AS (
      SELECT src, dst, w FROM basew
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM basew
    ),
    d0 AS (SELECT CAST(0 AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS dist)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
    d{i} AS (
      SELECT id, MIN(dist) AS dist FROM (
        SELECT id, dist FROM {prev}
        UNION ALL
        SELECT u.dst AS id,
               CAST(CAST(p.dist AS DECIMAL(30,9)) + CAST(u.w AS DECIMAL(30,9))
                    AS DOUBLE) AS dist
        FROM {prev} p JOIN undw u ON u.src = p.id
      ) GROUP BY id)""")
        prev = f"d{i}"
    return f"WITH {','.join(ctes)} SELECT id, dist FROM {prev}"


@df_query("graph_sssp_weighted", oracle=_sssp_weighted_oracle(8))
def graph_sssp_weighted(spark, sf_dir):
    """WEIGHTED single-source shortest paths (the actual
    SingleSourceShortestPaths.java contract; graph_sssp_hops is the
    unweighted special case): frontier-relaxation Bellman-Ford over the
    part-supplier graph with MIN(l_quantity) edge weights."""
    from flink_parent_spark.graph.algorithms import sssp_weighted

    t = load_tables(spark, sf_dir)
    base = (
        t["lineitem"]
        .groupBy(
            (F.lit(_PART_OFFSET) + F.col("l_partkey")).alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .agg(F.min("l_quantity").alias("weight"))
    )
    undw = base.unionByName(
        base.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    verts = (
        undw.select(F.col("src").alias("id"))
        .unionByName(undw.select(F.col("dst").alias("id")))
        .distinct()
    )
    return sssp_weighted(verts, undw, source=0, max_iter=8)


@df_query(
    "graph_vertex_degrees",
    oracle=f"""
    WITH {_DUCK_EDGES},
    ind AS (SELECT dst AS id, COUNT(*) AS in_deg FROM edges GROUP BY dst),
    outd AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src)
    SELECT v.id,
           COALESCE(i.in_deg, 0) AS in_deg,
           COALESCE(o.out_deg, 0) AS out_deg,
           COALESCE(i.in_deg, 0) + COALESCE(o.out_deg, 0) AS degree
    FROM verts v
    LEFT JOIN ind i ON v.id = i.id
    LEFT JOIN outd o ON v.id = o.id
    """,
)
def graph_vertex_degrees(spark, sf_dir):
    """Degree annotations (Gelly asm/degree/VertexInDegree /
    VertexOutDegree / VertexDegrees): in-, out-, and total degree per
    vertex of the directed part->supplier graph — two partial-aggregated
    shuffles and a vertex join, no densification."""
    v, e = _spark_graph(spark, sf_dir)
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    return (
        v.join(ind, "id", "left")
        .join(outd, "id", "left")
        .select(
            "id",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            (
                F.coalesce("in_deg", F.lit(0)) + F.coalesce("out_deg", F.lit(0))
            ).alias("degree"),
        )
    )


@df_query(
    "graph_bipartite_projection",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS t, l_partkey AS b
      FROM lineitem WHERE l_partkey < 50
    )
    SELECT a.t AS src, b.t AS dst, COUNT(*) AS n_shared
    FROM e a JOIN e b ON a.b = b.b AND a.t <> b.t
    GROUP BY a.t, b.t
    """,
)
def graph_bipartite_projection(spark, sf_dir):
    """Bipartite top projection (BipartiteGraph.projectionTopSimple:130):
    suppliers connected when they supply the same part, weighted by the
    number of shared parts. One equi-self-join on the bottom key."""
    from flink_parent_spark.graph.bipartite import bipartite_projection_simple

    t = load_tables(spark, sf_dir)
    edges = (
        t["lineitem"].where(F.col("l_partkey") < 50)
        .select(
            F.col("l_suppkey").alias("top_id"),
            F.col("l_partkey").alias("bottom_id"),
        )
        .distinct()
    )
    proj = bipartite_projection_simple(edges)
    return proj.groupBy("src", "dst").agg(F.count("*").alias("n_shared"))
