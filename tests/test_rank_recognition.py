"""Rank-pattern recognition tests (FlinkLogicalRankRule /
StreamExecDeduplicateRule parity, streaming/rank_recognition.py):
the ROW_NUMBER-subquery SQL idiom on a streaming scan must route to the
stateful Top-N / Deduplicate operators, non-matching statements must fall
through to the generic Catalyst plan, and batch mode must stay untouched."""

from __future__ import annotations

import datetime as dt

from flink_parent_spark.streaming.rank_recognition import recognize_rank_query

TOPN_SQL = """
SELECT event_type, value, event_id, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id) AS rn
  FROM src) WHERE rn <= 3
"""

DEDUP_SQL = """
SELECT user_id, ts, event_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM src) WHERE rn = 1
"""


def test_recognize_topn_shape():
    spec = recognize_rank_query(TOPN_SQL)
    assert spec is not None
    assert spec.partition_by == ["event_type"]
    assert spec.order_col == "value" and spec.descending
    assert spec.tiebreak == "event_id"
    assert spec.n == 3
    assert spec.select == ["event_type", "value", "event_id", "rn"]


def test_recognize_pred_variants():
    assert recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn < 4")).n == 3
    assert recognize_rank_query(TOPN_SQL.replace("rn <= 3", "3 >= rn")).n == 3
    assert recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn = 1")).n == 1


def test_recognize_bails_out():
    # rank ranges with a lower bound, RANK(), no outer rank predicate,
    # expressions in the projection: all fall through to the generic plan
    assert recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn >= 2")) is None
    assert recognize_rank_query(TOPN_SQL.replace("ROW_NUMBER()", "RANK()")) is None
    assert recognize_rank_query("SELECT * FROM src WHERE x <= 3") is None
    assert (
        recognize_rank_query(TOPN_SQL.replace("SELECT event_type,", "SELECT value+1,"))
        is None
    )


def _events_stream(spark, rows):
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="fps_rank_rec_")
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
    ).coalesce(1).write.parquet(f"{d}/staging")
    part = [f for f in os.listdir(f"{d}/staging") if f.endswith(".parquet")][0]
    os.rename(f"{d}/staging/{part}", f"{d}/b0.parquet")
    shutil.rmtree(f"{d}/staging")
    return spark.readStream.schema(
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
    ).parquet(d)


_ROWS = [
    (1, 10, "view", dt.datetime(2024, 1, 1, 0, 0), 5.0),
    (2, 10, "view", dt.datetime(2024, 1, 1, 0, 5), 9.0),
    (3, 10, "view", dt.datetime(2024, 1, 1, 0, 2), 7.0),
    (4, 20, "click", dt.datetime(2024, 1, 1, 0, 1), 3.0),
    (5, 20, "click", dt.datetime(2024, 1, 1, 0, 3), 4.0),
]


def test_sql_routes_to_dedup_operator(spark):
    """rn = 1 on an event-time order with the rank projected away routes to
    streaming Deduplicate (keep-first) and matches the batch answer."""
    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.streaming.core import run_stream_to_df

    t_env = TableEnvironment(spark, streaming=True)
    sdf = _events_stream(spark, _ROWS)
    sdf.createOrReplaceTempView("rank_rec_dedup_src")
    tbl = t_env.sql_query(DEDUP_SQL.replace("src", "rank_rec_dedup_src"))
    assert tbl.to_df().isStreaming
    got = {
        (r.user_id, r.event_id)
        for r in run_stream_to_df(tbl.to_df(), "update").collect()
    }
    assert got == {(10, 1), (20, 4)}  # earliest ts per user


def test_sql_routes_to_topn_operator(spark):
    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.streaming.core import run_stream_to_df

    t_env = TableEnvironment(spark, streaming=True)
    sdf = _events_stream(spark, _ROWS)
    sdf.createOrReplaceTempView("rank_rec_topn_src")
    tbl = t_env.sql_query(
        TOPN_SQL.replace("src", "rank_rec_topn_src").replace("rn <= 3", "rn <= 2")
    )
    rows = run_stream_to_df(tbl.to_df(), "update").collect()
    got = {(r.event_type, r.event_id, r.rn) for r in rows}
    assert got == {("view", 2, 1), ("view", 3, 2), ("click", 5, 1), ("click", 4, 2)}


def test_batch_mode_unaffected(spark):
    """In batch mode the same statement runs as a plain Catalyst window."""
    from flink_parent_spark.api.table_env import TableEnvironment

    t_env = TableEnvironment(spark, streaming=False)
    spark.createDataFrame(
        _ROWS,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double",
    ).createOrReplaceTempView("rank_rec_batch_src")
    rows = t_env.sql_query(
        TOPN_SQL.replace("src", "rank_rec_batch_src").replace("rn <= 3", "rn <= 2")
    ).to_df()
    assert not rows.isStreaming
    got = {(r.event_type, r.event_id, r.rn) for r in rows.collect()}
    assert got == {("view", 2, 1), ("view", 3, 2), ("click", 5, 1), ("click", 4, 2)}


def test_rank_eq_n_recognized_as_constant_range():
    """`rn = N` with N > 1 is ConstantRankRange(N, N) in the reference —
    recognition records rank_eq so the plan emits ONLY rank N, never the
    widened 1..N (round-5 ADVICE, high)."""
    spec = recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn = 3"))
    assert spec.n == 3 and spec.rank_eq == 3
    spec2 = recognize_rank_query(TOPN_SQL.replace("rn <= 3", "3 = rn"))
    assert spec2.n == 3 and spec2.rank_eq == 3
    # rn = 1 keeps the plain Top-1/dedup route (range (1,1) == top-1)
    one = recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn = 1"))
    assert one.n == 1 and one.rank_eq is None


def test_topn_timestamp_order_column(spark):
    """Top-N ordered by a TIMESTAMP column (n > 1, rank referenced — dedup
    ineligible) must not crash in the worker: the sort is a stable
    two-pass comparison, not `sign * value` (round-5 ADVICE, medium)."""
    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.streaming.core import run_stream_to_df

    t_env = TableEnvironment(spark, streaming=True)
    sdf = _events_stream(spark, _ROWS)
    sdf.createOrReplaceTempView("rank_rec_ts_src")
    tbl = t_env.sql_query(
        """
        SELECT user_id, event_id, rn FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM rank_rec_ts_src) WHERE rn <= 2
        """
    )
    rows = run_stream_to_df(tbl.to_df(), "update").collect()
    got = {(r.user_id, r.event_id, r.rn) for r in rows}
    assert got == {(10, 1, 1), (10, 3, 2), (20, 4, 1), (20, 5, 2)}


def test_rank_eq_n_plans_constant_rank_range(spark):
    """`rn = N` (N > 1) plans as ConstantRankRange(N, N): Top-N state bound
    at N per key, only the row AT rank N emitted (FlinkLogicalRankRule) —
    not ranks 1..N."""
    spec = recognize_rank_query(TOPN_SQL.replace("rn <= 3", "rn = 2"))
    assert spec is not None and spec.n == 2 and spec.rank_eq == 2

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.streaming.core import run_stream_to_df

    t_env = TableEnvironment(spark, streaming=True)
    sdf = _events_stream(spark, _ROWS)
    sdf.createOrReplaceTempView("rank_rec_eq_src")
    tbl = t_env.sql_query(
        TOPN_SQL.replace("src", "rank_rec_eq_src").replace("rn <= 3", "rn = 2")
    )
    rows = run_stream_to_df(tbl.to_df(), "update").collect()
    got = {(r.event_type, r.event_id, r.rn) for r in rows}
    # only the SECOND-ranked row per event_type
    assert got == {("view", 3, 2), ("click", 4, 2)}
