"""At-volume sweep of the graph library (Gelly-parity algorithms).

The catalog checks the graph operators' VALUES at sf0.01 (gate queries
`graph_connected_components`, `graph_pagerank`) and pytest covers every
algorithm at toy scale; this tool is the missing scale demonstration —
the graph analog of tools/datapipe_scale.py and tools/streaming_scale.py.
It generates a deterministic power-law graph (default 1M vertices, 10M
directed edges, hash-derived, no randomness) with PLANTED structure —
a 1000-vertex star disjoint from the main graph — then runs connected
components, PageRank, and label propagation with bounded iterations,
asserting deterministic invariants and logging per-algorithm runtimes:

    python tools/graph_scale.py                 # full sweep, one JSON line
    FPS_GRAPH_EDGES=1000000 python tools/...    # smaller graph

Invariants checked (all exact, no tolerance):
- CC reaches a true fixpoint (one extra message round changes nothing);
  the planted star is exactly one component of exactly 1000 vertices
  labeled with its min id; the hub component contains vertex 0.
- PageRank mass stays in (0, 1] (dangling mass dropped by design) and
  every rank >= the teleport floor (1-d)/N.
- Label propagation emits exactly one label per vertex.

Scale shape under test: each superstep is ONE shuffle (join on src +
groupBy dst) over the undirected edge relation, with vertex state
localCheckpoint()ed per superstep to keep plan depth constant — the
driver-loop Pregel documented in graph/algorithms.py. The sweep is what
demonstrates that shape holds at 10M edges rather than only at the toy
scale the oracles run at.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_EDGES = int(os.environ.get("FPS_GRAPH_EDGES", "10000000"))
N_VERTICES = max(1000, N_EDGES // 10)
RING = 1000  # planted disjoint star size (hub + 999 leaves)


def build_graph(spark):
    """Deterministic power-law-ish graph: src uniform over [0, N), dst
    skewed toward low ids via an inverse-CDF cube on a hash-uniform
    (vertex 0 is the hub). Plus a disjoint STAR on ids [N, N+RING) —
    star, not ring: min-label propagation crosses one hop per superstep,
    so a planted ring of 1000 would need ~500 supersteps; the star keeps
    the planted component's diameter at 2 while preserving the exact
    membership invariant."""
    n = N_VERTICES
    e = (
        spark.range(N_EDGES)
        .select(
            (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n))).alias("src"),
            # u in [0,1) from a second hash; dst = floor(N * u^3): mass
            # concentrates near 0 -> heavy-tailed in-degree
            F.floor(
                F.lit(n)
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1 << 20))
                    / F.lit(float(1 << 20)),
                    F.lit(3.0),
                )
            ).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    ring = spark.range(1, RING).select(
        F.lit(n).cast("long").alias("src"),
        (F.col("id") + n).alias("dst"),
    )
    edges = e.unionByName(ring).repartition(64, "src")
    vertices = spark.range(n + RING).select(F.col("id"))
    return vertices, edges


def main() -> None:
    from flink_parent_spark.graph.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
    )
    from flink_parent_spark.session import get_spark

    spark = get_spark("graph-scale")
    out: dict = {"edges": N_EDGES, "vertices": N_VERTICES + RING}

    t0 = time.time()
    vertices, edges = build_graph(spark)
    edges = edges.localCheckpoint(eager=True)
    out["n_edges_actual"] = edges.count()
    out["build_sec"] = round(time.time() - t0, 2)

    # -- connected components ------------------------------------------------
    t0 = time.time()
    cc = connected_components(vertices, edges, max_iter=30)
    cc = cc.localCheckpoint(eager=True)
    out["cc_sec"] = round(time.time() - t0, 2)
    # fixpoint proof: one more min-label message round changes nothing
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    would_change = (
        und.join(cc, und.src == cc.id)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("component").alias("nbr_min"))
        .join(cc, "id")
        .filter(F.col("nbr_min") < F.col("component"))
        .count()
    )
    assert would_change == 0, f"CC not at fixpoint: {would_change} movable"
    ring_members = cc.filter(F.col("component") == N_VERTICES).count()
    assert ring_members == RING, f"planted ring: {ring_members} != {RING}"
    hub = cc.filter(F.col("id") == 0).first()["component"]
    assert hub == 0, f"hub component mislabeled: {hub}"
    out["cc_components"] = cc.select("component").distinct().count()
    out["cc_hub_size"] = cc.filter(F.col("component") == 0).count()

    # -- pagerank -------------------------------------------------------------
    t0 = time.time()
    pr = pagerank(vertices, edges, n_iter=5).localCheckpoint(eager=True)
    out["pagerank_sec"] = round(time.time() - t0, 2)
    mass = pr.agg(F.sum("rank")).first()[0]
    assert 0.0 < mass <= 1.0 + 1e-9, f"rank mass out of range: {mass}"
    floor = (1.0 - 0.85) / (N_VERTICES + RING)
    low = pr.filter(F.col("rank") < floor * 0.999999).count()
    assert low == 0, f"{low} ranks below the teleport floor"
    top = pr.orderBy(F.desc("rank")).limit(3).collect()
    out["pagerank_mass"] = round(float(mass), 6)
    out["pagerank_top"] = [[int(r["id"]), round(r["rank"], 8)] for r in top]

    # -- label propagation ------------------------------------------------------
    t0 = time.time()
    lp = label_propagation(
        vertices.withColumn("label", F.pmod(F.col("id"), F.lit(100))),
        edges,
        n_iter=2,
    )
    n_lp = lp.count()
    out["label_prop_sec"] = round(time.time() - t0, 2)
    assert n_lp == N_VERTICES + RING, f"label prop lost vertices: {n_lp}"
    out["label_prop_labels"] = lp.select("label").distinct().count()

    out["total_sec"] = round(
        out["build_sec"] + out["cc_sec"] + out["pagerank_sec"]
        + out["label_prop_sec"],
        2,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
