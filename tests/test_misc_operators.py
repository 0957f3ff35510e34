"""Tests for side outputs, connector recipes, rate source, and the
TableEnvironment INSERT INTO sink path."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from flink_parent_spark.streaming.side_outputs import route, split_late_data
from flink_parent_spark.tables import load_tables


def test_side_output_routing(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    ev = t["events"]
    tags = {
        "purchases": F.col("event_type") == "purchase",
        "errors": F.col("event_type") == "error",
    }
    routed = route(ev, tags, default_tag="rest")
    n_p = routed["purchases"].count()
    n_e = routed["errors"].count()
    n_r = routed["rest"].count()
    assert n_p + n_e + n_r == ev.count()
    assert routed["purchases"].filter(F.col("event_type") != "purchase").count() == 0


def test_split_late_data(spark):
    import datetime as dt

    t = load_tables(spark, "/root/testdata/sf0.001")
    cut = dt.datetime(2024, 1, 15)
    parts = split_late_data(t["events"], "ts", cut)
    assert parts["main"].count() + parts["late"].count() == t["events"].count()
    assert parts["late"].agg(F.max("ts")).first()[0] < cut


def test_rate_source_produces_rows(spark):
    from flink_parent_spark.sources.connectors import rate_source
    from flink_parent_spark.streaming.core import run_stream_to_df

    sdf = rate_source(spark, rows_per_second=500).limit(10)
    # rate source has no availableNow end; run one processing-time trigger
    import tempfile as tf
    import uuid

    name = f"rate_{uuid.uuid4().hex[:6]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .option("checkpointLocation", os.path.join(tf.gettempdir(), name))
        .start()
    )
    import time

    deadline = time.time() + 30
    while time.time() < deadline and spark.table(name).count() == 0:
        time.sleep(1)
    q.stop()
    assert spark.table(name).count() > 0
    assert set(spark.table(name).columns) == {"timestamp", "value"}


def test_kafka_source_raises_cleanly(spark):
    from flink_parent_spark.sources.connectors import kafka_source

    with pytest.raises(RuntimeError, match="kafka connector requires"):
        kafka_source(spark, "localhost:9092", "t")


def test_insert_into_sink(spark):
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    out = os.path.join(tempfile.gettempdir(), "fps_insert_sink")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    env.execute_sql(
        f"""CREATE TABLE sink_t (r_regionkey INT, r_name STRING)
            WITH ('connector'='filesystem', 'path'='{out}', 'format'='parquet')"""
    )
    env.execute_sql(
        f"""CREATE TABLE src_r (r_regionkey INT, r_name STRING)
            WITH ('connector'='filesystem',
                  'path'='/root/testdata/sf0.001/region.parquet',
                  'format'='parquet')"""
    )
    env.execute_sql("INSERT INTO sink_t SELECT * FROM src_r")
    assert spark.read.parquet(out).count() == 5


def test_scatter_gather_framework_sssp(spark):
    """The generic scatter-gather surface (Gelly ScatterGatherIteration
    parity) reproduces the dedicated SSSP loop when given its scatter/
    gather/update expressions."""
    from pyspark.sql import functions as F

    from flink_parent_spark.graph.algorithms import scatter_gather, sssp_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (0, 5), (5, 3)],
        "src long, dst long",
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    got = scatter_gather(
        vertices,
        edges,
        initial_expr="CASE WHEN id = 0 THEN CAST(0 AS BIGINT) END",
        message_expr="value + 1",
        aggregate=F.min,
        update_expr="LEAST(COALESCE(value, __agg), COALESCE(__agg, value))",
        n_iter=6,
    )
    expected = sssp_hops(vertices, edges, source=0, max_iter=6)
    g = {r["id"]: r["value"] for r in got.collect() if r["value"] is not None}
    e = {r["id"]: r["dist"] for r in expected.collect()}
    assert g == e and g[4] == 3 and 10 not in g


def test_gsa_iteration_alias_cc(spark):
    """GSA decomposition runs min-label connected components to the same
    fixpoint as the dedicated loop."""
    from pyspark.sql import functions as F

    from flink_parent_spark.graph.algorithms import (
        connected_components,
        gsa_iteration,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (4, 1)], "src long, dst long"
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    got = gsa_iteration(
        vertices,
        edges,
        initial_expr="id",
        gather_expr="value",
        sum_agg=F.min,
        apply_expr="LEAST(value, COALESCE(__agg, value))",
        n_iter=6,
    )
    expected = connected_components(vertices, edges)
    g = {r["id"]: r["value"] for r in got.collect()}
    e = {r["id"]: r["component"] for r in expected.collect()}
    assert g == e


def test_gelly_graph_api_surface(spark):
    """Graph class verbs (fromDataSet-style construction, degrees,
    subgraph/filter, reverse/undirected, union/difference/intersect,
    validate) behave per the Gelly Graph.java contracts."""
    from pyspark.sql import functions as F

    from flink_parent_spark.graph.graph import Graph

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    g = Graph.from_edges(e)
    assert g.num_vertices() == 4 and g.num_edges() == 4
    assert g.validate()

    deg = {r["id"]: r["degree"] for r in g.get_degrees().collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}
    ind = {r["id"]: r["in_deg"] for r in g.in_degrees().collect()}
    assert ind == {1: 1, 2: 1, 3: 1, 4: 1}

    rev = g.reverse()
    assert {(r["src"], r["dst"]) for r in rev.edges.collect()} == {
        (2, 1), (3, 2), (1, 3), (4, 3)
    }
    und = g.undirected()
    assert und.num_edges() == 8

    sub = g.filter_on_vertices(F.col("id") <= 3)
    assert sub.num_vertices() == 3
    assert {(r["src"], r["dst"]) for r in sub.edges.collect()} == {
        (1, 2), (2, 3), (3, 1)
    }

    h = Graph.from_edges(
        spark.createDataFrame([(3, 4), (4, 5)], "src long, dst long")
    )
    assert g.union(h).num_vertices() == 5
    assert g.union(h).num_edges() == 5
    diff = g.difference(h)  # removes vertices {3,4,5} and touching edges
    assert {r["id"] for r in diff.vertices.collect()} == {1, 2}
    assert {(r["src"], r["dst"]) for r in diff.edges.collect()} == {(1, 2)}
    inter = g.intersect(h)
    assert {(r["src"], r["dst"]) for r in inter.edges.collect()} == {(3, 4)}

    bad = Graph(spark.createDataFrame([(1,)], "id long"), e)
    assert not bad.validate()


def test_rebalance_zero_share_drops_source(spark):
    """A target share of 0.0 legitimately drops that source entirely
    instead of raising ZeroDivisionError (round-5 ADVICE, low)."""
    from flink_parent_spark.datapipe.text import rebalance_source_mix

    df = spark.createDataFrame(
        [(f"d{i}", "web" if i % 2 else "books") for i in range(40)],
        "doc_id string, source string",
    )
    out = rebalance_source_mix(df, {"web": 1.0, "books": 0.0})
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"web"}
    assert out.count() == 20  # binding source kept whole


def test_adamic_adar_hub_cap(spark):
    """hub_cap bounds the shared-neighbor fan-out: capped output equals
    the uncapped scores recomputed without the over-cap neighbors'
    contributions; default (None) keeps exact Gelly semantics."""
    from flink_parent_spark.graph.algorithms import adamic_adar

    # star hub 1 connected to 2..6 (deg 5), plus a triangle 2-3-7
    edges = spark.createDataFrame(
        [(1, x) for x in (2, 3, 4, 5, 6)] + [(2, 7), (3, 7)],
        "src long, dst long",
    )
    full = {(r.id_a, r.id_b): r.score for r in adamic_adar(edges).collect()}
    capped = {
        (r.id_a, r.id_b): r.score
        for r in adamic_adar(edges, hub_cap=3).collect()
    }
    # hub 1 (deg 5 > 3) no longer contributes: pairs whose ONLY shared
    # neighbor was the hub disappear
    assert (4, 5) in full and (4, 5) not in capped
    # pair (2,3) shares hub 1 AND vertex 7 (deg 2): capped keeps only 7's
    # term, 1/ln(2)
    import math

    assert abs(capped[(2, 3)] - round(1 / math.log(2), 9)) < 1e-9
    assert full[(2, 3)] > capped[(2, 3)]
