"""TableEnvironment / Table API surface tests (TableEnvironmentImpl +
Table.java parity at the Python veneer level)."""

from __future__ import annotations

import pytest

from flink_parent_spark.api.table_env import TableEnvironment

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE li (
            l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
            l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
            l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
            l_linestatus STRING, l_shipdate TIMESTAMP
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF}/lineitem.parquet', 'format' = 'parquet')
        """
    )
    env.execute_sql(
        f"""
        CREATE TABLE ev (
            event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            event_type STRING, value DOUBLE, props STRING,
            day_part AS CAST(ts AS DATE),
            WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF}/events.parquet', 'format' = 'parquet')
        """
    )
    return env


def test_ddl_and_sql_query(tenv):
    t = tenv.sql_query("SELECT count(*) AS n FROM li")
    assert t.collect()[0]["n"] == 6000


def test_computed_column_and_watermark_metadata(tenv):
    entry = tenv.catalog["ev"]
    assert entry.watermark == ("ts", "10 seconds")
    rows = tenv.sql_query("SELECT day_part FROM ev LIMIT 1").collect()
    assert rows[0]["day_part"] is not None


def test_fluent_chain(tenv):
    t = (
        tenv.from_path("li")
        .filter("l_quantity > 45")
        .select("l_returnflag", "l_extendedprice * (1 - l_discount) AS net")
        .group_by("l_returnflag")
        .select("l_returnflag", "count(1) AS n", "round(sum(net), 2) AS revenue")
        .order_by("l_returnflag")
    )
    rows = t.collect()
    oracle = tenv.spark.sql(
        """SELECT l_returnflag, count(1) AS n,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM li WHERE l_quantity > 45 GROUP BY l_returnflag ORDER BY l_returnflag"""
    ).collect()
    assert rows == oracle


def test_joins_setops(tenv):
    a = tenv.from_path("li").select("l_orderkey").distinct().fetch(100)
    b = tenv.from_path("li").select("l_orderkey").distinct().fetch(50)
    assert a.intersect(b).to_df().count() == 50
    assert a.union_all(b).to_df().count() == 150
    assert a.minus(b).to_df().count() == 50


def test_flink_udfs_available(tenv):
    r = tenv.sql_query("SELECT SPLIT_INDEX('x-y-z', '-', 2) AS v").collect()
    assert r[0]["v"] == "z"


def test_streaming_scan_has_watermark(spark):
    env = TableEnvironment.create(spark=spark, streaming=True)
    env.execute_sql(
        f"""
        CREATE TABLE evs (
            event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            event_type STRING, value DOUBLE, props STRING,
            WATERMARK FOR ts AS ts - INTERVAL '30' SECOND
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF}/events.parquet', 'format' = 'parquet')
        """
    )
    sdf = env.from_path("evs").to_df()
    assert sdf.isStreaming
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().logical().toString()


def test_explain_sql_returns_plan(tenv):
    plan = tenv.explain_sql(
        "SELECT l_returnflag, COUNT(*) FROM li GROUP BY l_returnflag"
    )
    assert "HashAggregate" in plan or "Aggregate" in plan
    assert "Scan" in plan
    ext = tenv.explain_sql("SELECT 1", mode="extended")
    assert "Parsed Logical Plan" in ext


def test_group_window_dialect_rewrite():
    from flink_parent_spark.api.table_env import rewrite_group_windows

    out = rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS s, COUNT(*) AS n "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hour')" in out and "window.start" in out
    out = rewrite_group_windows(
        "GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)"
    )
    # Flink argument order (slide, size) flips to Spark's (size, slide)
    assert "window(ts, '1 hour', '15 minute')" in out
    out = rewrite_group_windows(
        "SELECT SESSION_ROWTIME(ts, INTERVAL '30' MINUTE) "
        "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)"
    )
    assert "session_window(ts, '30 minute')" in out
    assert "session_window.end - INTERVAL 1 MILLISECOND" in out
    # identity on plain SQL
    plain = "SELECT a FROM t WHERE b > 1"
    assert rewrite_group_windows(plain) == plain


def test_group_window_dialect_runs(tenv):
    df = tenv.sql_query(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS we, COUNT(*) AS n
        FROM ev GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        """
    ).to_df()
    rows = df.collect()
    assert rows and all(r["we"] == r["ws"] + __import__("datetime").timedelta(hours=1) for r in rows)


def test_proctime_function(tenv):
    r = tenv.sql_query(
        "SELECT PROCTIME() AS pt, PROCTIME() >= TIMESTAMP '2024-01-01' AS sane"
    ).collect()
    assert r[0]["pt"] is not None and r[0]["sane"]


def test_streaming_sql_group_window(spark):
    """The Flink group-window dialect works against a STREAMING DDL table:
    CREATE TABLE with WATERMARK in streaming mode + GROUP BY TUMBLE runs as
    a real watermark-driven streaming aggregation and converges to the
    batch answer on full replay."""
    from flink_parent_spark.streaming.core import run_stream_to_df

    env = TableEnvironment.create(spark=spark, streaming=True)
    env.execute_sql(
        f"""
        CREATE TABLE sev (
            event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            event_type STRING, value DOUBLE, props STRING,
            WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF}/events.parquet', 'format' = 'parquet')
        """
    )
    sdf = env.sql_query(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
               event_type, COUNT(*) AS n
        FROM sev GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """
    ).to_df()
    assert sdf.isStreaming
    got = run_stream_to_df(sdf, "complete")
    batch = TableEnvironment.create(spark=spark)  # batch-mode view of same DDL
    batch.execute_sql(
        f"""
        CREATE TABLE bev (
            event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            event_type STRING, value DOUBLE, props STRING
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF}/events.parquet', 'format' = 'parquet')
        """
    )
    exp = batch.sql_query(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
               event_type, COUNT(*) AS n
        FROM bev GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """
    ).to_df()
    g = {(r["ws"], r["event_type"]): r["n"] for r in got.collect()}
    e = {(r["ws"], r["event_type"]): r["n"] for r in exp.collect()}
    assert g == e and len(g) > 0


def test_rewrite_group_windows_skips_literals_and_comments():
    """TUMBLE/HOP/SESSION tokens inside string literals or comments must
    survive the rewrite untouched."""
    from flink_parent_spark.api.table_env import rewrite_group_windows

    sql = (
        "SELECT 'TUMBLE(ts, INTERVAL ''1'' HOUR)' AS lit, x -- TUMBLE(a, b)\n"
        "FROM t /* HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR) */ WHERE s <> 'SESSION(x)'"
    )
    assert rewrite_group_windows(sql) == sql
    # a real call next to a literal mentioning one still rewrites
    mixed = "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w, 'TUMBLE' AS tag"
    out = rewrite_group_windows(mixed)
    assert "window.start" in out and "'TUMBLE'" in out


def test_show_tables_and_describe(tenv):
    names = {r["table_name"] for r in tenv.execute_sql("SHOW TABLES").collect()}
    assert {"li", "ev"} <= names

    rows = {r["name"]: r for r in tenv.execute_sql("DESCRIBE ev").collect()}
    assert "ts" in rows and "value" in rows
    # the WATERMARK FOR annotation appears on the event-time column
    assert "INTERVAL" in rows["ts"]["watermark"]
    # the computed column shows its generating expression
    assert rows["day_part"]["extras"].startswith("AS ")


def test_view_over_view(tenv):
    tenv.execute_sql(
        "CREATE OR REPLACE TEMPORARY VIEW v1 AS "
        "SELECT l_returnflag, l_quantity FROM li WHERE l_quantity > 40"
    )
    tenv.execute_sql(
        "CREATE OR REPLACE TEMPORARY VIEW v2 AS "
        "SELECT l_returnflag, count(*) AS n FROM v1 GROUP BY l_returnflag"
    )
    out = {r["l_returnflag"]: r["n"] for r in tenv.sql_query("SELECT * FROM v2").collect()}
    direct = {
        r["l_returnflag"]: r["n"]
        for r in tenv.sql_query(
            "SELECT l_returnflag, count(*) AS n FROM li "
            "WHERE l_quantity > 40 GROUP BY l_returnflag"
        ).collect()
    }
    assert out == direct and out


def test_drop_table_removes_catalog_entry(tenv, spark):
    tenv.execute_sql(
        f"""
        CREATE TABLE tmp_drop (l_orderkey BIGINT)
        WITH ('connector' = 'filesystem',
              'path' = '{SF}/lineitem.parquet', 'format' = 'parquet')
        """
    )
    assert "tmp_drop" in tenv.catalog
    tenv.execute_sql("DROP TABLE tmp_drop")
    assert "tmp_drop" not in tenv.catalog
    names = {r["table_name"] for r in tenv.execute_sql("SHOW TABLES").collect()}
    assert "tmp_drop" not in names


def test_temporal_table_function_join(tenv, spark):
    """Table.createTemporalTableFunction parity: the fluent TTF join must
    reproduce the asof_join verb's result (latest version with
    version_ts <= probe_ts per key)."""
    import datetime as dtm

    from flink_parent_spark.api.table_env import Table
    from flink_parent_spark.operators.joins import asof_join

    t0 = dtm.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dtm.timedelta(minutes=m)

    rates_df = spark.createDataFrame(
        [("EUR", 1.0, ts(0)), ("EUR", 1.2, ts(10)), ("USD", 2.0, ts(5))],
        "currency string, rate double, r_ts timestamp",
    )
    orders_df = spark.createDataFrame(
        [(1, "EUR", ts(5)), (2, "EUR", ts(15)), (3, "USD", ts(1))],
        "order_id long, o_currency string, o_ts timestamp",
    )
    rates = Table(rates_df, tenv)
    orders = Table(orders_df, tenv)
    ttf = rates.create_temporal_table_function("r_ts", "currency")
    out = (
        orders.join(ttf("o_ts"), "o_currency = currency")
        .to_df()
        .toPandas()
        .sort_values("order_id")
    )
    expected = (
        asof_join(
            orders_df, rates_df, [("o_currency", "currency")],
            "o_ts", "r_ts", ["rate"],
        )
        .toPandas()
        .sort_values("order_id")
    )
    import pandas as pd

    assert list(out["rate"][:2]) == list(expected["rate"][:2]) == [1.0, 1.2]
    assert pd.isna(out["rate"].iloc[2]) and pd.isna(expected["rate"].iloc[2])


def test_insert_overwrite_and_statement_set(tenv, spark):
    import os
    import shutil
    import tempfile

    sink = os.path.join(tempfile.gettempdir(), "fps_stmtset_sink")
    shutil.rmtree(sink, ignore_errors=True)
    tenv.execute_sql(
        f"""
        CREATE TABLE stmt_sink (l_returnflag STRING, n BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{sink}',
              'format' = 'parquet')
        """
    )
    ss = tenv.create_statement_set()
    ss.add_insert_sql(
        "INSERT INTO stmt_sink "
        "SELECT l_returnflag, count(*) AS n FROM li GROUP BY l_returnflag"
    ).add_insert_sql(
        "INSERT INTO stmt_sink "
        "SELECT 'X' AS l_returnflag, CAST(-1 AS BIGINT) AS n"
    )
    ss.execute()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 4  # 3 return flags + sentinel

    # INSERT OVERWRITE replaces the table contents
    tenv.execute_sql(
        "INSERT OVERWRITE stmt_sink "
        "SELECT 'Y' AS l_returnflag, CAST(7 AS BIGINT) AS n"
    )
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1 and rows[0]["n"] == 7

    import pytest as _pytest

    with _pytest.raises(ValueError, match="INSERT statements only"):
        tenv.create_statement_set().add_insert_sql("SELECT 1")


def test_explain_plan_for_and_show_create_table(tenv):
    plan = tenv.execute_sql(
        "EXPLAIN PLAN FOR SELECT l_returnflag, count(*) FROM li GROUP BY l_returnflag"
    ).collect()[0]["plan"]
    assert "Aggregate" in plan or "HashAggregate" in plan

    ddl = tenv.execute_sql("SHOW CREATE TABLE ev").collect()[0][0]
    assert ddl.startswith("CREATE TABLE ev (")
    assert "WATERMARK FOR ts AS ts - INTERVAL '10' SECONDS" in ddl
    assert "'connector' = 'filesystem'" in ddl and "day_part AS" in ddl


def test_fluent_group_window_tumble(tenv):
    """table.window(Tumble...).group_by('w', key).select(...) equals the
    SQL tumbling aggregation."""
    from flink_parent_spark.api.table_env import Tumble

    t = tenv.from_path("ev")
    got = (
        t.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "event_type")
        .select("w.start", "event_type", "count(1) AS n")
        .to_df()
        .collect()
    )
    exp = tenv.spark.sql(
        """
        SELECT window(ts, '1 hour').start AS w_start, event_type,
               count(1) AS n
        FROM ev GROUP BY window(ts, '1 hour'), event_type
        """
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp)) and got


def test_fluent_group_window_slide_and_session(tenv):
    from flink_parent_spark.api.table_env import Session, Slide

    t = tenv.from_path("ev")
    slide = (
        t.window(Slide.over("1 hour").every("15 minutes").on("ts").alias("w"))
        .group_by("w")
        .select("w.start", "w.end", "count(1) AS n")
        .to_df()
    )
    n_slide = slide.count()
    exp = tenv.spark.sql(
        "SELECT window(ts, '1 hour', '15 minutes'), count(1) FROM ev "
        "GROUP BY window(ts, '1 hour', '15 minutes')"
    ).count()
    assert n_slide == exp

    sess = (
        t.window(Session.with_gap("30 minutes").on("ts").alias("s"))
        .group_by("s", "user_id")
        .select("s.start", "s.rowtime", "user_id", "count(1) AS n")
        .to_df()
    )
    r = sess.limit(1).collect()[0]
    assert r["s_rowtime"] is not None


def test_fluent_windowed_flat_aggregate(tenv):
    """Windowed TableAggregateFunction (StreamExecGroupWindowTable
    Aggregate.scala): window(Tumble).group_by(w, key).flat_aggregate(...)
    emits multiple rows per WINDOW group with the bounds projected; a
    session window takes the same path (merge handled by Spark's
    session_window in the group shuffle)."""
    t = tenv.from_path("ev")
    from flink_parent_spark.api.table_env import Session, Tumble

    def top2(key, pdf):
        return pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(2)[["event_id", "value"]]

    got = (
        t.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "event_type")
        .flat_aggregate(top2, "event_id bigint, value double")
        .to_df()
        .collect()
    )
    exp = tenv.spark.sql(
        """
        SELECT w_start, w_end, event_type, event_id, value FROM (
          SELECT window(ts, '1 hour').start AS w_start,
                 window(ts, '1 hour').end AS w_end,
                 event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY window(ts, '1 hour'),
                                    event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM ev) WHERE rn <= 2
        """
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp)) and got

    sess = (
        t.window(Session.with_gap("30 minutes").on("ts").alias("s"))
        .group_by("s", "user_id")
        .flat_aggregate(top2, "event_id bigint, value double")
        .to_df()
    )
    rows = sess.collect()
    assert rows and all(r["s_start"] <= r["s_end"] for r in rows)


def test_fluent_over_window(tenv):
    from flink_parent_spark.api.table_env import Over

    t = tenv.from_path("ev")
    got = (
        t.over_window(
            Over.partition_by("user_id").order_by("ts, event_id")
            .preceding("unbounded_row").alias("w")
        )
        .select(
            "user_id", "event_id",
            "COUNT(*) OVER w AS running_n",
            "MAX(value) OVER w AS running_max",
        )
        .to_df()
    )
    exp = tenv.spark.sql(
        """
        SELECT user_id, event_id,
               COUNT(*) OVER w AS running_n, MAX(value) OVER w AS running_max
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, exp.collect()))
    assert a == b and a


def test_table_map_flat_map_verbs(tenv):
    t = tenv.from_path("li").fetch(5)
    out = t.map(
        lambda r: {"k": r["l_orderkey"], "q2": r["l_quantity"] * 2},
        "k long, q2 double",
    ).collect()
    assert len(out) == 5 and all(r["q2"] is not None for r in out)

    fm = t.flat_map(
        lambda r: [{"k": r["l_orderkey"]}] * int(min(r["l_linenumber"], 2)),
        "k long",
    ).collect()
    assert len(fm) >= 5


def test_grouped_aggregate_and_flat_aggregate(tenv):
    import pandas as pd

    t = tenv.from_path("li")
    agg = (
        t.group_by("l_returnflag")
        .aggregate(
            lambda key, pdf: {"n": len(pdf), "maxq": float(pdf["l_quantity"].max())},
            "n long, maxq double",
        )
        .collect()
    )
    exp = {
        r["l_returnflag"]: (r["n"], r["maxq"])
        for r in tenv.sql_query(
            "SELECT l_returnflag, count(*) AS n, max(l_quantity) AS maxq "
            "FROM li GROUP BY l_returnflag"
        ).collect()
    }
    assert {r["l_returnflag"]: (r["n"], r["maxq"]) for r in agg} == exp

    top2 = (
        t.group_by("l_returnflag")
        .flat_aggregate(
            lambda key, pdf: pdf.nlargest(2, "l_quantity")[["l_orderkey", "l_quantity"]],
            "l_orderkey long, l_quantity double",
        )
        .to_df()
    )
    assert top2.count() == 3 * 2


def test_flink_type_normalization(tenv, spark):
    """Flink-only DDL types (LogicalTypeRoot lattice) map onto Spark types:
    TIME->INT millis-of-day, TIMESTAMP(3)->TIMESTAMP, TIMESTAMP_LTZ->
    TIMESTAMP, MULTISET<t> -> MAP<t,INT>, BYTES->BINARY; names like a
    column called `time` are untouched."""
    import json
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import normalize_flink_types

    assert normalize_flink_types("TIME") == "INT"
    assert normalize_flink_types("TIMESTAMP(3)") == "TIMESTAMP"
    assert normalize_flink_types("TIMESTAMP_LTZ(3)") == "TIMESTAMP"
    assert (
        normalize_flink_types("TIMESTAMP(9) WITHOUT TIME ZONE") == "TIMESTAMP"
    )
    assert normalize_flink_types("MULTISET<STRING>") == "MAP<STRING, INT>"
    assert normalize_flink_types("BYTES") == "BINARY"
    assert normalize_flink_types("DECIMAL(10,2)") == "DECIMAL(10,2)"

    # end-to-end: a DDL table using Flink types parses and scans (json so
    # the declared schema is authoritative)
    d = os.path.join(tempfile.gettempdir(), "fps_flinktypes")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with open(os.path.join(d, "part.json"), "w") as fh:
        fh.write(json.dumps({"id": 1, "time": "2024-01-01T00:00:00",
                             "t_of_day": 3600000}) + "\n")
    tenv.execute_sql(
        f"""
        CREATE TABLE flink_typed (
            id BIGINT, time TIMESTAMP(3), t_of_day TIME
        ) WITH ('connector' = 'filesystem', 'path' = '{d}',
                'format' = 'json')
        """
    )
    entry = tenv.catalog["flink_typed"]
    assert "TIMESTAMP(3)" not in entry.schema_ddl
    assert "t_of_day INT" in entry.schema_ddl
    rows = tenv.sql_query(
        "SELECT id, time, t_of_day FROM flink_typed"
    ).collect()
    assert rows[0]["t_of_day"] == 3600000 and rows[0]["time"] is not None


def test_table_datastream_bridge(tenv, spark):
    """StreamTableEnvironment bridge verbs (StreamTableEnvironment.java:560):
    fromDataStream renames positionally; toAppendStream rejects updating
    tables; toRetractStream maps RowKind to the (add?, row) boolean."""
    import pytest as _pytest

    from flink_parent_spark.api.datastream import StreamExecutionEnvironment
    from flink_parent_spark.api.table_env import Table

    env = StreamExecutionEnvironment(spark)
    ds = env.from_collection([(1, "a"), (2, "b")], "n int, s string")
    t = tenv.from_data_stream(ds, "num", "tag")
    assert t.to_df().columns == ["num", "tag"]
    assert sorted(r["num"] for r in t.collect()) == [1, 2]

    # insert-only round trip: all rows accumulate
    back = tenv.to_retract_stream(t)
    rows = back.execute_and_collect()
    assert all(r[-1] is True for r in rows) and len(rows) == 2
    assert len(tenv.to_append_stream(t).execute_and_collect()) == 2

    # a changelog (updating) table: +I/+U accumulate, -U/-D retract
    chg = Table(
        spark.createDataFrame(
            [("x", 1, "+I"), ("x", 1, "-U"), ("x", 2, "+U"), ("y", 9, "-D")],
            "k string, v int, __rowkind string",
        ),
        tenv,
    )
    flags = {(r[0], r[1], r[2]) for r in tenv.to_retract_stream(chg).execute_and_collect()}
    assert flags == {("x", 1, True), ("x", 1, False), ("x", 2, True), ("y", 9, False)}
    with _pytest.raises(ValueError, match="toAppendStream"):
        tenv.to_append_stream(chg)


def test_create_table_like(spark, tmp_path):
    """CREATE TABLE ... LIKE (SqlTableLike.java): INCLUDING ALL inherits
    schema/options/computed/watermark; OVERWRITING OPTIONS lets the new
    table repoint the path; EXCLUDING OPTIONS drops inherited options;
    INCLUDING OPTIONS errors on conflicting duplicate keys; new physical
    columns append."""
    import json
    import os

    from flink_parent_spark.api.table_env import TableEnvironment

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(d1), os.makedirs(d2)
    with open(os.path.join(d1, "p.json"), "w") as fh:
        fh.write(json.dumps({"id": 1, "amount": 2.5,
                             "ts": "2024-01-01T00:00:10"}) + "\n")
    with open(os.path.join(d2, "p.json"), "w") as fh:
        fh.write(json.dumps({"id": 9, "amount": 1.0,
                             "ts": "2024-01-02T00:00:10"}) + "\n")

    tenv = TableEnvironment.create(spark=spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE base_t (
            id BIGINT, amount DOUBLE, ts TIMESTAMP(3),
            doubled AS amount * 2,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{d1}',
                'format' = 'json')
        """
    )
    # INCLUDING ALL (implicit)
    tenv.execute_sql("CREATE TABLE derived_all LIKE base_t")
    e = tenv.catalog["derived_all"]
    assert e.schema_ddl == tenv.catalog["base_t"].schema_ddl
    assert e.watermark == ("ts", "5 seconds") and ("doubled", "amount * 2") in e.computed
    assert [r["doubled"] for r in tenv.sql_query("SELECT doubled FROM derived_all").collect()] == [5.0]

    # OVERWRITING OPTIONS repoints the path; new column appends
    tenv.execute_sql(
        f"""
        CREATE TABLE derived_b (flag AS amount > 2)
        WITH ('path' = '{d2}')
        LIKE base_t (OVERWRITING OPTIONS, EXCLUDING WATERMARKS)
        """
    )
    e2 = tenv.catalog["derived_b"]
    assert e2.watermark is None and e2.props["path"] == d2
    rows = tenv.sql_query("SELECT id, flag, doubled FROM derived_b").collect()
    assert [(r["id"], r["flag"], r["doubled"]) for r in rows] == [(9, False, 2.0)]

    # INCLUDING OPTIONS with a conflicting duplicate errors
    import pytest as _pytest
    with _pytest.raises(ValueError, match="conflicting"):
        tenv.execute_sql(
            f"CREATE TABLE bad WITH ('path' = '{d2}') LIKE base_t (INCLUDING OPTIONS)"
        )
    # EXCLUDING OPTIONS keeps only the new table's own options
    tenv.execute_sql(
        f"""
        CREATE TABLE derived_c
        WITH ('connector' = 'filesystem', 'path' = '{d2}', 'format' = 'json')
        LIKE base_t (EXCLUDING OPTIONS)
        """
    )
    assert tenv.catalog["derived_c"].props["path"] == d2


def test_dynamic_table_options_hint(spark, tmp_path):
    """FLIP-113 OPTIONS hint: disabled by default (exception, matching
    table.dynamic-table-options.enabled=false); once enabled, the hint
    overrides the table's options for that query only — here repointing
    the path — while the catalog entry stays untouched."""
    import json
    import os

    import pytest as _pytest

    from flink_parent_spark.api.table_env import TableEnvironment

    d1, d2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    os.makedirs(d1), os.makedirs(d2)
    for d, uid in ((d1, 1), (d2, 2)):
        with open(os.path.join(d, "p.json"), "w") as fh:
            fh.write(json.dumps({"uid": uid}) + "\n")
    tenv = TableEnvironment.create(spark=spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE hinted (uid BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{d1}', 'format' = 'json')
        """
    )
    with _pytest.raises(ValueError, match="dynamic table options are disabled"):
        tenv.sql_query(f"SELECT uid FROM hinted /*+ OPTIONS('path'='{d2}') */")

    tenv.get_config()["table.dynamic-table-options.enabled"] = "true"
    rows = tenv.sql_query(
        f"SELECT uid FROM hinted /*+ OPTIONS('path'='{d2}') */"
    ).collect()
    assert [r["uid"] for r in rows] == [2]
    # the hint is per-query: the catalog table still reads its own path
    assert [r["uid"] for r in tenv.sql_query("SELECT uid FROM hinted").collect()] == [1]


def test_catalog_verbs(tenv, spark):
    """createTemporaryView / from(path) / listTables / listFunctions /
    dropTemporaryView parity."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n int, s string")
    tenv.create_temporary_view("tmp_v", df)
    assert "tmp_v" in tenv.list_tables()
    t = tenv.from_path("tmp_v")
    assert sorted(r["n"] for r in t.collect()) == [1, 2]
    fns = tenv.list_functions()
    assert "split_index" in [f.lower() for f in fns]  # Flink residue registered
    assert tenv.drop_temporary_view("tmp_v") is True
    assert "tmp_v" not in tenv.list_tables()


def test_expression_dsl(tenv, spark):
    """Expressions.java DSL parity: col/lit/and_/if_then_else/call compose
    with the fluent Table verbs exactly like SQL strings."""
    from flink_parent_spark.api import expressions as expr
    from flink_parent_spark.api.table_env import Table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id int, k string, v double"
    )
    t = Table(df, tenv)
    out = (
        t.filter(expr.and_(expr.col("v") > 10.0, expr.col("k") == expr.lit("a")))
        .add_columns(flag=expr.if_then_else(expr.col("id") > 2, "hi", "lo"))
        .select(expr.col("id"), expr.col("flag"))
        .collect()
    )
    assert [(r["id"], r["flag"]) for r in out] == [(3, "hi")]
    # call() reaches registered residue functions
    got = Table(df, tenv).select(
        expr.call("SPLIT_INDEX", expr.lit("a,b,c"), expr.lit(","), expr.lit(1)).alias("s")
    ).collect()
    assert got[0]["s"] == "b"


def test_create_function_ddl_python(spark):
    """CREATE TEMPORARY FUNCTION f AS '<module.attr>' LANGUAGE PYTHON
    (TableEnvironmentImpl createFunction dispatch; PyFlink udf.py:322
    shape): the dotted ref resolves to a pandas UDF and sql_query can call
    it by name."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION dbl AS "
        "'flink_parent_spark.functions.udf.double_value' LANGUAGE PYTHON"
    )
    spark.createDataFrame([(1.5,), (2.0,)], "v double").createOrReplaceTempView(
        "fn_ddl_src"
    )
    got = sorted(
        r["d"] for r in env.sql_query(
            "SELECT dbl(v) AS d FROM fn_ddl_src"
        ).collect()
    )
    assert got == [3.0, 4.0]
    assert "dbl" in env.list_functions()
    # unknown python ref raises with a clear message
    import pytest

    with pytest.raises(ValueError, match="cannot import"):
        env.execute_sql(
            "CREATE TEMPORARY FUNCTION nope AS 'no.such.module.attr' "
            "LANGUAGE PYTHON"
        )


def test_create_database_and_use(spark):
    """CREATE DATABASE / USE / SHOW DATABASES dispatch through to Spark's
    session catalog (identical semantics to Flink's in-catalog databases)."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    env.execute_sql("CREATE DATABASE IF NOT EXISTS fps_db_ddl")
    dbs = {r[0] for r in env.execute_sql("SHOW DATABASES").collect()}
    assert "fps_db_ddl" in dbs
    env.execute_sql("USE fps_db_ddl")
    assert spark.catalog.currentDatabase() == "fps_db_ddl"
    env.execute_sql("USE default")
    env.execute_sql("DROP DATABASE fps_db_ddl")


def test_alter_database_passthrough(spark):
    """ALTER DATABASE ... SET DBPROPERTIES dispatches through execute_sql
    to Spark's session catalog (SqlAlterDatabase / AlterDatabaseOperation
    parity — Spark's statement has identical semantics, so the dispatch
    is a passthrough, not a rewrite)."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    env.execute_sql("CREATE DATABASE IF NOT EXISTS fps_alter_db")
    try:
        # note: 'owner'/'location' are reserved namespace properties in
        # Spark; the dispatch test uses a user-space key
        env.execute_sql(
            "ALTER DATABASE fps_alter_db SET DBPROPERTIES ('team'='fps')"
        )
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql("DESCRIBE DATABASE EXTENDED fps_alter_db").collect()
        }
        assert "team,fps" in desc.get("Properties", "")
    finally:
        env.execute_sql("DROP DATABASE fps_alter_db")


def test_use_catalog_ddl(spark):
    """USE CATALOG c materializes the registered catalog object's tables
    (JdbcCatalog.register_all = the useCatalog workflow); SHOW CATALOGS
    lists registered names."""
    from flink_parent_spark.api.table_env import TableEnvironment

    class FakeCatalog:
        def __init__(self, spark):
            self.spark = spark
            self.registered = False

        def register_all(self):
            self.registered = True
            self.spark.createDataFrame(
                [(1, "x")], "id int, v string"
            ).createOrReplaceTempView("cat_tbl")

    env = TableEnvironment.create(spark=spark)
    cat = FakeCatalog(spark)
    env.register_catalog("mycat", cat)
    names = {r[0] for r in env.execute_sql("SHOW CATALOGS").collect()}
    assert names == {"default_catalog", "mycat"}
    env.execute_sql("USE CATALOG mycat")
    assert cat.registered and env.current_catalog == "mycat"
    assert env.sql_query("SELECT count(*) AS n FROM cat_tbl").collect()[0]["n"] == 1
    import pytest

    with pytest.raises(ValueError, match="unknown catalog"):
        env.execute_sql("USE CATALOG ghost")


def test_use_catalog_default_roundtrip(spark):
    """USE CATALOG can always switch back to the built-in default_catalog
    (round-6 ADVICE): Flink's GenericInMemoryCatalog default is usable
    without register_catalog."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    env.execute_sql("USE CATALOG default_catalog")
    assert env.current_catalog == "default_catalog"


def test_create_function_bare_callable_rejected(spark):
    """CREATE FUNCTION with a plain callable (no declared result type)
    raises instead of silently registering with the StringType default
    (round-6 ADVICE; PyFlink makes the result type mandatory)."""
    import pytest

    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    with pytest.raises(ValueError, match="result type"):
        env.execute_sql(
            "CREATE TEMPORARY FUNCTION bare AS 'os.path.basename' "
            "LANGUAGE PYTHON"
        )


def test_alter_table_set_rename_add_column(spark, tmp_path):
    """ALTER TABLE dispatch (TableEnvironmentImpl.java:686 AlterTable
    kinds): SET updates the catalog entry AND the next scan honors it
    (here: repointing 'path' to a different dataset); RENAME TO moves the
    catalog entry and the view; ADD COLUMN extends the declared schema.
    Round-6 verdict #5: these previously fell through to spark.sql, which
    errors on temp-view-backed DDL tables."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "two")
    spark.createDataFrame([(1, "a")], "id long, tag string").write.parquet(d1)
    spark.createDataFrame(
        [(10, "x"), (20, "y")], "id long, tag string"
    ).write.parquet(d2)
    env.execute_sql(f"""
        CREATE TABLE alt_t (id BIGINT, tag STRING)
        WITH ('connector' = 'filesystem', 'path' = '{d1}',
              'format' = 'parquet')
    """)
    assert env.sql_query("SELECT count(*) AS n FROM alt_t").collect()[0]["n"] == 1

    # SET: the catalog props change and the NEXT scan reads the new path
    env.execute_sql(f"ALTER TABLE alt_t SET ('path' = '{d2}')")
    assert env.catalog["alt_t"].props["path"] == d2
    assert env.sql_query("SELECT count(*) AS n FROM alt_t").collect()[0]["n"] == 2
    ddl = env.execute_sql("SHOW CREATE TABLE alt_t").collect()[0][0]
    assert d2 in ddl

    # RENAME TO: catalog key + view move; the old name is gone
    env.execute_sql("ALTER TABLE alt_t RENAME TO alt_r")
    assert "alt_t" not in env.catalog and "alt_r" in env.catalog
    assert env.sql_query("SELECT count(*) AS n FROM alt_r").collect()[0]["n"] == 2
    import pytest as pt

    with pt.raises(Exception):
        env.sql_query("SELECT * FROM alt_t").collect()

    # ADD COLUMN: declared schema extends; the re-registered scan exposes
    # the new (null for existing files) column
    env.execute_sql("ALTER TABLE alt_r ADD COLUMN extra DOUBLE")
    assert "extra" in (env.catalog["alt_r"].schema_ddl or "")
    row = env.sql_query("SELECT extra FROM alt_r LIMIT 1").collect()[0]
    assert row["extra"] is None

    # unsupported clause raises clearly instead of silently passing through
    with pt.raises(ValueError, match="unsupported ALTER TABLE"):
        env.execute_sql("ALTER TABLE alt_r FROBNICATE")


def test_alter_view_as_and_rename(spark):
    """ALTER VIEW AS re-defines a (temp) view; RENAME TO re-registers it —
    Spark's own ALTER VIEW rejects temp views, so the dispatcher
    re-creates them (AlterViewOperation parity)."""
    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment.create(spark=spark)
    env.execute_sql("CREATE TEMPORARY VIEW av AS SELECT 1 AS x")
    env.execute_sql("ALTER VIEW av AS SELECT 42 AS x")
    assert env.sql_query("SELECT x FROM av").collect()[0]["x"] == 42
    env.execute_sql("ALTER VIEW av RENAME TO av2")
    assert env.sql_query("SELECT x FROM av2").collect()[0]["x"] == 42
