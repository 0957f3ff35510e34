"""Connector exercises that need no external service: the rate (datagen)
source and the socket source against an in-test TCP server. Kafka/JDBC have
no service in this container — their option-translation recipes live in
sources/connectors.py and fail with a clear error instead (asserted here).
"""

from __future__ import annotations

import socket
import threading
import time
import uuid

import pytest

from flink_parent_spark.sources.connectors import kafka_source, rate_source


def test_rate_source_produces_monotonic_rows(spark):
    """Datagen/StatefulSequenceSource parity: the rate source yields
    (timestamp, value) with consecutive values."""
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        rate_source(spark, rows_per_second=500)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.table(name).collect()
            if len(rows) >= 20:
                break
            time.sleep(0.5)
        assert len(rows) >= 20
        vals = sorted(r["value"] for r in rows)
        assert vals == list(range(vals[0], vals[0] + len(vals)))
        assert {"timestamp", "value"} == set(spark.table(name).columns)
    finally:
        q.stop()


def test_socket_source_reads_lines(spark):
    """SocketTextStreamFunction parity: stream lines from a real TCP socket."""
    lines = [f"line-{i}" for i in range(10)]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(5)  # keep the connection open while Spark polls

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        got: list[str] = []
        while time.time() < deadline:
            got = [r["value"] for r in spark.table(name).collect()]
            if len(got) >= len(lines):
                break
            time.sleep(0.5)
        assert sorted(got) == sorted(lines)
    finally:
        q.stop()
        srv.close()


def test_kafka_recipe_fails_clearly_without_broker(spark):
    with pytest.raises(RuntimeError, match="kafka connector requires"):
        kafka_source(spark, "localhost:9092", "topic")


def test_avro_ocf_roundtrip_nulls_and_types(spark):
    """Pure-Python Avro OCF codec: nullable unions, timestamps at micro
    precision, booleans, and empty partitions all round-trip exactly."""
    import datetime as dtm
    import os
    import shutil
    import tempfile

    from flink_parent_spark.sources.avro_format import read_avro, write_avro

    rows = [
        (1, dtm.datetime(2024, 1, 1, 12, 0, 0, 123456), "a", 1.5, True),
        (2, None, None, None, None),
        (3, dtm.datetime(2024, 6, 30, 23, 59, 59, 999999), "", -0.0, False),
    ]
    df = spark.createDataFrame(
        rows, "id long, ts timestamp, s string, v double, b boolean"
    ).repartition(5)  # more partitions than rows: empty-partition path
    d = os.path.join(tempfile.gettempdir(), "avro_unit_rt")
    shutil.rmtree(d, ignore_errors=True)
    write_avro(df, d)
    back = read_avro(spark, d)
    assert dict(back.dtypes) == dict(df.dtypes)
    got = sorted([tuple(r) for r in back.collect()])
    exp = sorted([tuple(r) for r in df.collect()])
    assert got == exp


def test_console_sink_runs(spark):
    """Print/console sink parity: the console writer consumes a bounded
    replay to completion (output goes to the driver log — the assertion is
    that the query lifecycle completes cleanly)."""
    import os
    import tempfile
    import uuid

    from flink_parent_spark.sources.connectors import console_sink
    from flink_parent_spark.streaming.core import stream_table

    ev = stream_table(spark, "/root/testdata/sf0.001", "events").limit(5)
    ckpt = os.path.join(tempfile.gettempdir(), f"fps_ckpt_console_{uuid.uuid4().hex[:8]}")
    q = (
        console_sink(ev)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None


def test_read_avro_probe_filters_non_avro(spark):
    """Schema probe must ignore _SUCCESS/hidden siblings (which sort first)
    and fail clearly on a directory with no .avro files."""
    import os
    import tempfile

    import pytest

    from flink_parent_spark.sources.avro_format import read_avro, write_avro

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    d = os.path.join(tempfile.gettempdir(), "avro_unit_probe")
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    write_avro(df, d)
    # sorts before any part-*.avro file; must not be picked as the probe
    open(os.path.join(d, "_SUCCESS"), "w").close()
    back = read_avro(spark, d).toPandas().sort_values("id")
    assert list(back["id"]) == [1, 2]

    empty = os.path.join(tempfile.gettempdir(), "avro_unit_empty")
    shutil.rmtree(empty, ignore_errors=True)
    os.makedirs(empty)
    open(os.path.join(empty, "_SUCCESS"), "w").close()
    with pytest.raises(FileNotFoundError, match="no \\*\\.avro"):
        read_avro(spark, empty)


def test_kafka_file_fake_ddl_roundtrip(spark):
    """DDL → kafka option translation → file-backed topic → JSON value
    decode, end-to-end without a broker: earliest reads the whole log,
    specific-offsets resumes mid-topic, and the decoded columns follow the
    declared schema."""
    import json
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources.connectors import write_kafka_file_topic

    base = os.path.join(tempfile.gettempdir(), "kafka_fake_unit")
    shutil.rmtree(base, ignore_errors=True)
    records = [
        (str(i), json.dumps({"uid": i, "amount": float(i) * 1.5}))
        for i in range(10)
    ]
    write_kafka_file_topic(records, spark, base, "payments")

    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE payments (uid BIGINT, amount DOUBLE)
        WITH ('connector' = 'kafka', 'topic' = 'payments',
              'path' = '{base}', 'format' = 'json',
              'scan.startup.mode' = 'earliest-offset')
        """
    )
    rows = env.sql_query(
        "SELECT uid, amount, offset FROM payments ORDER BY uid"
    ).collect()
    assert [r["uid"] for r in rows] == list(range(10))
    assert rows[3]["amount"] == 4.5 and rows[3]["offset"] == 3

    env.execute_sql(
        f"""
        CREATE TABLE payments_from_5 (uid BIGINT, amount DOUBLE)
        WITH ('connector' = 'kafka', 'topic' = 'payments',
              'path' = '{base}', 'format' = 'json',
              'scan.startup.mode' = 'specific-offsets',
              'scan.startup.specific-offsets' = 'partition:0,offset:5')
        """
    )
    resumed = env.sql_query(
        "SELECT uid FROM payments_from_5 ORDER BY uid"
    ).collect()
    assert [r["uid"] for r in resumed] == [5, 6, 7, 8, 9]

    # appending to the log is visible to a fresh scan (offsets continue);
    # like a new Flink job, re-resolving the table re-lists the log
    # (r11: re-CREATE of a live name now raises like the reference's
    # TableAlreadyExistException, so the re-resolution drops it first)
    write_kafka_file_topic([("x", json.dumps({"uid": 10, "amount": 15.0}))],
                           spark, base, "payments")
    env.execute_sql("DROP TABLE payments")
    env.execute_sql(
        f"""
        CREATE TABLE payments (uid BIGINT, amount DOUBLE)
        WITH ('connector' = 'kafka', 'topic' = 'payments',
              'path' = '{base}', 'format' = 'json',
              'scan.startup.mode' = 'earliest-offset')
        """
    )
    again = env.sql_query("SELECT max(offset) AS mo FROM payments").collect()
    assert again[0]["mo"] == 10


def test_upsert_kafka_ddl_normalizes_changelog(spark):
    """connector='upsert-kafka': the topic is a keyed changelog — the
    latest value per PRIMARY KEY wins and a NULL value tombstones the key
    (ChangelogNormalize parity on the DDL read path)."""
    import json
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources.connectors import write_kafka_file_topic

    base = os.path.join(tempfile.gettempdir(), "upsert_kafka_unit")
    shutil.rmtree(base, ignore_errors=True)
    key = lambda i: json.dumps({"uid": i})  # noqa: E731
    val = lambda i, a: json.dumps({"uid": i, "amount": a})  # noqa: E731
    write_kafka_file_topic(
        [
            (key(1), val(1, 10.0)),
            (key(2), val(2, 20.0)),
            (key(1), val(1, 11.0)),   # upsert: uid 1 -> 11.0
            (key(3), val(3, 30.0)),
            (key(2), None),           # tombstone: uid 2 deleted
        ],
        spark, base, "balances",
    )
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE balances (
            uid BIGINT, amount DOUBLE, PRIMARY KEY (uid) NOT ENFORCED
        ) WITH ('connector' = 'upsert-kafka', 'topic' = 'balances',
                'path' = '{base}', 'format' = 'json')
        """
    )
    rows = {
        r["uid"]: r["amount"]
        for r in env.sql_query("SELECT uid, amount FROM balances").collect()
    }
    assert rows == {1: 11.0, 3: 30.0}


def test_jdbc_roundtrip_embedded_derby(spark):
    """Real JDBC connector exercise against the Derby embedded database
    that ships in Spark's jars — write via df.write.jdbc, read back via
    the jdbc_source recipe including the partitioned parallel-read path
    (partitionColumn/bounds), no external service needed."""
    import os
    import shutil
    import tempfile

    from flink_parent_spark.sources.connectors import jdbc_source

    db = os.path.join(tempfile.gettempdir(), "derby_unit_db")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id * 1.5 AS DOUBLE) AS amount",
        "CONCAT('user_', CAST(id AS STRING)) AS name",
    )
    df.write.format("jdbc").option("url", url).option("driver", driver).option(
        "dbtable", "accounts"
    ).mode("overwrite").save()

    back = jdbc_source(spark, url, "accounts", driver=driver)
    assert back.count() == 100
    row = back.filter("id = 42").collect()[0]
    assert row["amount"] == 63.0 and row["name"] == "user_42"

    # partitioned parallel read: same rows, split across 4 JDBC partitions
    par = jdbc_source(
        spark, url, "accounts", partition_column="id",
        num_partitions=4, lower_bound=0, upper_bound=100, driver=driver,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 100
    assert sorted(r["id"] for r in par.collect()) == list(range(100))


def test_jdbc_ddl_table(spark):
    """connector='jdbc' DDL resolves through the Spark JDBC reader against
    embedded Derby (Flink JDBC table options -> Spark)."""
    import os
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment

    db = os.path.join(tempfile.gettempdir(), "derby_unit_db")  # from the
    # roundtrip test; re-create if running standalone
    url = f"jdbc:derby:{db};create=true"
    if not os.path.isdir(db):
        spark.range(0, 100).selectExpr(
            "id", "CAST(id * 1.5 AS DOUBLE) AS amount",
            "CONCAT('user_', CAST(id AS STRING)) AS name",
        ).write.format("jdbc").option("url", url).option(
            "driver", "org.apache.derby.jdbc.EmbeddedDriver"
        ).option("dbtable", "accounts").mode("overwrite").save()

    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE jdbc_accounts (id BIGINT, amount DOUBLE, name STRING)
        WITH ('connector' = 'jdbc', 'url' = '{url}',
              'table-name' = 'accounts',
              'driver' = 'org.apache.derby.jdbc.EmbeddedDriver')
        """
    )
    n = env.sql_query(
        "SELECT count(*) AS n FROM jdbc_accounts WHERE amount > 75"
    ).collect()[0]["n"]
    assert n == 49  # ids 51..99


def test_managed_catalog_table_roundtrip(spark):
    """Hive-connector analog: Spark's session catalog managed table
    (saveAsTable -> warehouse parquet + catalog entry), queryable by name
    and listable — the reference's Hive catalog maps onto this."""
    df = spark.range(0, 50).selectExpr("id", "id % 5 AS grp")
    df.write.mode("overwrite").saveAsTable("managed_groups")
    try:
        back = spark.sql(
            "SELECT grp, count(*) AS n FROM managed_groups GROUP BY grp"
        ).collect()
        assert sorted((r["grp"], r["n"]) for r in back) == [
            (i, 10) for i in range(5)
        ]
        assert any(
            t.name == "managed_groups" for t in spark.catalog.listTables()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS managed_groups")


def test_sequence_file_roundtrip(spark):
    """flink-formats sequence-file parity via the Hadoop-native RDD path."""
    import os
    import shutil
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "fps_seqfile")
    shutil.rmtree(d, ignore_errors=True)
    sc = spark.sparkContext
    sc.parallelize([(i, f"v{i}") for i in range(20)], 2).saveAsSequenceFile(d)
    back = sorted(sc.sequenceFile(d).collect())
    assert back == [(i, f"v{i}") for i in range(20)]


def test_compressed_text_roundtrip(spark):
    """flink-formats compress parity: gzip-codec text writes read back
    transparently (codec inferred from extension)."""
    import os
    import shutil
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "fps_gzip_text")
    shutil.rmtree(d, ignore_errors=True)
    lines = [f"row-{i}" for i in range(100)]
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.option("compression", "gzip").text(d)
    assert any(f.endswith(".gz") for f in os.listdir(d))
    back = sorted(r["value"] for r in spark.read.text(d).collect())
    assert back == sorted(lines)


def test_kafka_ddl_debezium_json_format(spark):
    """CREATE TABLE ... WITH (format='debezium-json') over the file-backed
    topic parses CDC messages into the __rowkind-tagged relation (the
    reference's kafka + debezium-json table factory composition)."""
    import json
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources.connectors import write_kafka_file_topic

    base = os.path.join(tempfile.gettempdir(), "kafka_fake_dbz")
    shutil.rmtree(base, ignore_errors=True)
    msgs = [
        {"before": None, "after": {"pid": 1, "price": 3.14}, "op": "c"},
        {
            "before": {"pid": 1, "price": 3.14},
            "after": {"pid": 1, "price": 5.18},
            "op": "u",
        },
        {"before": {"pid": 1, "price": 5.18}, "after": None, "op": "d"},
    ]
    write_kafka_file_topic(
        [(str(i), json.dumps(m)) for i, m in enumerate(msgs)],
        spark, base, "products",
    )
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE products (pid BIGINT, price DOUBLE)
        WITH ('connector' = 'kafka', 'topic' = 'products',
              'path' = '{base}', 'format' = 'debezium-json',
              'scan.startup.mode' = 'earliest-offset')
        """
    )
    rows = [
        (r["pid"], r["price"], r["__rowkind"])
        for r in env.sql_query("SELECT * FROM products").collect()
    ]
    assert sorted(rows, key=str) == sorted(
        [(1, 3.14, "+I"), (1, 3.14, "-U"), (1, 5.18, "+U"), (1, 5.18, "-D")],
        key=str,
    )


def test_jdbc_catalog_lists_and_resolves(spark):
    """JdbcCatalog (JdbcCatalog.java / PostgresCatalog.java parity) against
    embedded Derby: listTables from JDBC metadata, tableExists, getTable
    resolution, and register_all exposing every table to SQL."""
    import os
    import shutil
    import tempfile

    from flink_parent_spark.sources.connectors import JdbcCatalog

    db = os.path.join(tempfile.gettempdir(), "derby_catalog_db")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    for tname, n in (("products", 7), ("sales", 11)):
        spark.range(0, n).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v") \
            .write.format("jdbc").option("url", url).option("driver", driver) \
            .option("dbtable", tname).mode("overwrite").save()

    cat = JdbcCatalog(spark, "derby_cat", url, driver)
    tables = cat.list_tables()
    assert {"PRODUCTS", "SALES"} <= {t.upper() for t in tables}
    assert cat.table_exists("products") and not cat.table_exists("nope")
    assert cat.get_table("sales").count() == 11

    views = cat.register_all(prefix="jc_")
    assert "jc_products" in views
    got = spark.sql("SELECT COUNT(*) AS n FROM jc_products").collect()[0]["n"]
    assert got == 7


def test_hive_catalog_managed_table_roundtrip():
    """Hive connector exercise (flink-connectors/flink-connector-hive /
    HiveCatalog.java role): Spark's Hive catalog with the embedded Derby
    metastore creates, writes, and reads a Hive-format managed table plus
    a partitioned variant. Runs in a subprocess because the catalog
    implementation is fixed at JVM session creation (the shared test
    session is in-memory-catalog)."""
    import subprocess
    import sys
    import tempfile

    wh = tempfile.mkdtemp(prefix="hive_wh_t_")
    ms = tempfile.mkdtemp(prefix="hive_ms_t_")
    code = f"""
from pyspark.sql import SparkSession
s = (SparkSession.builder.master("local[2]")
     .config("spark.sql.warehouse.dir", {wh!r})
     .config("spark.hadoop.javax.jdo.option.ConnectionURL",
             "jdbc:derby:;databaseName=" + {ms!r} + "/metastore_db;create=true")
     .config("spark.sql.shuffle.partitions", "2")
     # fresh JVM: the java option applies pre-launch, so Derby's log
     # lands in tmp instead of the repo root (process CWD)
     .config("spark.driver.extraJavaOptions",
             "-Dderby.stream.error.file=/tmp/fps_derby_sub.log")
     .enableHiveSupport().getOrCreate())
s.sql("CREATE TABLE hv (id INT, v DOUBLE) USING hive")
s.sql("INSERT INTO hv VALUES (1, 1.5), (2, 2.5)")
assert sorted(r["id"] for r in s.sql("SELECT * FROM hv").collect()) == [1, 2]
s.sql("CREATE TABLE hvp (id INT) USING hive PARTITIONED BY (d STRING)")
s.sql("INSERT INTO hvp PARTITION (d='2024-01-01') VALUES (10)")
s.sql("INSERT INTO hvp PARTITION (d='2024-01-02') VALUES (20)")
got = s.sql("SELECT id FROM hvp WHERE d = '2024-01-02'").collect()
assert [r["id"] for r in got] == [20]
parts = s.sql("SHOW PARTITIONS hvp").collect()
assert len(parts) == 2

# ALTER TABLE ADD/DROP PARTITION through the TableEnvironment DDL layer
# (SqlAddPartitions.java / SqlDropPartitions.java -> Spark's identical
# statement on the Hive catalog): the metastore gains/loses the
# partition, SHOW PARTITIONS reflects it, and a pruned read of the added
# partition returns its rows once data lands.
from flink_parent_spark.api.table_env import TableEnvironment
env = TableEnvironment.create(spark=s)
env.execute_sql("ALTER TABLE hvp ADD PARTITION (d='2024-01-03')")
parts = sorted(r[0] for r in s.sql("SHOW PARTITIONS hvp").collect())
assert parts == ["d=2024-01-01", "d=2024-01-02", "d=2024-01-03"], parts
env.execute_sql("INSERT INTO hvp PARTITION (d='2024-01-03') VALUES (30)")
got = env.sql_query("SELECT id FROM hvp WHERE d = '2024-01-03'").collect()
assert [r["id"] for r in got] == [30], got
env.execute_sql("ALTER TABLE hvp DROP PARTITION (d='2024-01-01')")
parts = sorted(r[0] for r in s.sql("SHOW PARTITIONS hvp").collect())
assert parts == ["d=2024-01-02", "d=2024-01-03"], parts
assert env.sql_query("SELECT count(*) AS n FROM hvp").collect()[0]["n"] == 2
print("HIVE-ROUNDTRIP-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=240
    )
    assert "HIVE-ROUNDTRIP-OK" in out.stdout, out.stderr[-2000:]


def test_kafka_sink_insert_roundtrip(spark):
    """INSERT INTO a kafka table (the producer half of the file-backed
    fake): rows serialize as json values with the PRIMARY KEY column as
    the message key, offsets continue monotonically, and a subsequent
    SELECT over the same table reads them back decoded."""
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment

    base = os.path.join(tempfile.gettempdir(), "kafka_sink_rt")
    shutil.rmtree(base, ignore_errors=True)
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE clicks (uid BIGINT, amount DOUBLE, PRIMARY KEY (uid) NOT ENFORCED)
        WITH ('connector' = 'kafka', 'topic' = 'clicks',
              'path' = '{base}', 'format' = 'json',
              'scan.startup.mode' = 'earliest-offset')
        """
    )
    env.execute_sql("INSERT INTO clicks SELECT 1 AS uid, 2.5 AS amount")
    env.execute_sql(
        "INSERT INTO clicks SELECT id AS uid, CAST(id AS DOUBLE) AS amount "
        "FROM range(10, 13)"
    )
    rows = env.sql_query(
        "SELECT uid, amount, offset FROM clicks ORDER BY offset"
    ).collect()
    assert [(r["uid"], r["amount"]) for r in rows] == [
        (1, 2.5), (10, 10.0), (11, 11.0), (12, 12.0)
    ]
    assert [r["offset"] for r in rows] == [0, 1, 2, 3]


def test_jdbc_lookup_join_with_cache(spark):
    """JDBC lookup join with cache semantics (JdbcRowDataLookupFunction +
    lookup.cache.max-rows / lookup.cache.ttl vs embedded Derby): a cached
    second probe issues NO new query, TTL expiry re-queries, max-rows
    evicts LRU, and the joined values match the plain JDBC join."""
    import os
    import shutil
    import tempfile

    from flink_parent_spark.sources.connectors import (
        JdbcLookupFunction,
        jdbc_lookup_join,
        jdbc_source,
    )

    db = os.path.join(tempfile.gettempdir(), "derby_lookup_db")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    spark.range(0, 50).selectExpr(
        "id", "CONCAT('dim_', CAST(id AS STRING)) AS label",
        "CAST(id * 2.5 AS DOUBLE) AS score",
    ).write.format("jdbc").option("url", url).option("driver", driver).option(
        "dbtable", "dim"
    ).mode("overwrite").save()

    clock = [0.0]
    fn = JdbcLookupFunction(
        spark, url, "dim", "id", driver=driver,
        cache_max_rows=100, cache_ttl_seconds=60, clock=lambda: clock[0],
    )
    probe = spark.createDataFrame(
        [(i % 10, f"fact_{i}") for i in range(40)], "id long, payload string"
    )
    out = jdbc_lookup_join(
        probe, "id", fn, [("label", "string"), ("score", "double")]
    )
    got = {(r["id"], r["label"], r["score"]) for r in out.collect()}
    # oracle: the uncached plain JDBC join
    dim = jdbc_source(spark, url, "dim", driver=driver)
    exp = {
        (r["id"], r["label"], r["score"])
        for r in probe.join(dim, "id", "left").collect()
    }
    assert got == exp and len(fn.queries) == 1

    # cached second probe: same keys, NO new query
    out2 = jdbc_lookup_join(
        probe, "id", fn, [("label", "string"), ("score", "double")]
    )
    assert out2.count() == 40 and len(fn.queries) == 1

    # TTL expiry: advancing the clock past ttl re-queries
    clock[0] = 61.0
    jdbc_lookup_join(
        probe, "id", fn, [("label", "string"), ("score", "double")]
    ).count()
    assert len(fn.queries) == 2

    # max-rows LRU eviction: a tiny cache evicts, so re-probing re-queries
    fn2 = JdbcLookupFunction(
        spark, url, "dim", "id", driver=driver,
        cache_max_rows=3, cache_ttl_seconds=None,
    )
    assert set(fn2.lookup([0, 1, 2, 3, 4])) == {0, 1, 2, 3, 4}
    fn2.lookup([0])  # 0 was evicted (LRU) -> one more query
    assert len(fn2.queries) == 2
    # negative caching: a miss caches as None without re-query
    assert fn2.lookup([999])[999] is None
    assert fn2.lookup([999])[999] is None
    assert len(fn2.queries) == 3


def test_kafka_sink_composite_primary_key(spark):
    """INSERT INTO a kafka table with a COMPOSITE primary key serializes
    ALL key columns as a json struct (matching the upsert-kafka reader's
    key decode), and the write path is distributed (no driver collect)."""
    import json
    import os
    import shutil
    import tempfile

    from flink_parent_spark.api.table_env import TableEnvironment

    base = os.path.join(tempfile.gettempdir(), "kafka_sink_cpk")
    shutil.rmtree(base, ignore_errors=True)
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"""
        CREATE TABLE pageviews (site STRING, page STRING, hits BIGINT,
                                PRIMARY KEY (site, page) NOT ENFORCED)
        WITH ('connector' = 'kafka', 'topic' = 'pv',
              'path' = '{base}', 'format' = 'json',
              'scan.startup.mode' = 'earliest-offset')
        """
    )
    env.execute_sql(
        "INSERT INTO pageviews SELECT 'a' AS site, 'x' AS page, 3 AS hits"
    )
    raw = spark.read.parquet(os.path.join(base, "pv")).collect()
    assert len(raw) == 1
    key = json.loads(bytes(raw[0]["key"]).decode())
    assert key == {"site": "a", "page": "x"}
    val = json.loads(bytes(raw[0]["value"]).decode())
    assert val == {"site": "a", "page": "x", "hits": 3}


def test_jdbc_lookup_join_executor_side(spark):
    """Executor-side lookup join (JdbcRowDataLookupFunction's per-task
    deployment): the lookup function ships into mapInPandas partitions via
    a picklable DB-API connection_factory — probe keys NEVER collect to
    the driver (plan is a single mapInPandas over the probe; the
    driver-side fn issues zero queries), one bulk IN per Arrow batch per
    worker, values match the plain-join oracle, and executor-issued query
    counts surface through the Spark accumulator."""
    import os
    import tempfile
    import uuid

    import duckdb

    from flink_parent_spark.sources.connectors import (
        JdbcLookupFunction,
        jdbc_lookup_join,
    )

    db = os.path.join(tempfile.gettempdir(), f"duck_lookup_{uuid.uuid4().hex[:8]}.db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE dim AS SELECT range AS id, 'dim_' || range AS label, "
        "range * 2.5 AS score FROM range(50)"
    )
    con.close()

    fn = JdbcLookupFunction(
        None, f"duckdb:{db}", "dim", "id",
        cache_max_rows=100,
        connection_factory=lambda: duckdb.connect(db, read_only=True),
    )
    probe = spark.createDataFrame(
        [(i % 10, f"fact_{i}") for i in range(40)] + [(999, "miss")],
        "id long, payload string",
    ).repartition(4)
    out = jdbc_lookup_join(
        probe, "id", fn, [("label", "string"), ("score", "double")]
    )
    # probe keys never reach the driver: the plan is mapInPandas over the
    # probe with no broadcast of a collected dimension slice
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" in plan and "Broadcast" not in plan
    got = {(r["id"], r["label"], r["score"]) for r in out.collect()}
    exp = {(i, f"dim_{i}", i * 2.5) for i in range(10)} | {(999, None, None)}
    assert got == exp
    assert fn.queries == []  # driver-side instance untouched
    assert fn.query_count_accumulator.value >= 1  # executors did the work

    # driver fast path stays guarded: a probe wider than max_driver_keys
    # refuses to collect keys to the driver
    import pytest

    derby_fn = JdbcLookupFunction(spark, "jdbc:derby:unused", "dim", "id")
    with pytest.raises(ValueError, match="connection_factory"):
        jdbc_lookup_join(
            probe, "id", derby_fn, [("label", "string")], max_driver_keys=5
        )


def test_jdbc_lookup_quote_in_key_escaped(spark):
    """String probe keys containing single quotes are SQL-escaped in the
    bulk IN query (round-6 ADVICE: fact-data keys are an injection
    surface) — exercised against embedded Derby."""
    import os
    import shutil
    import tempfile

    from flink_parent_spark.sources.connectors import JdbcLookupFunction

    db = os.path.join(tempfile.gettempdir(), "derby_quote_db")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    spark.createDataFrame(
        [("o'brien", 1.0), ("plain", 2.0)], "name string, score double"
    ).write.format("jdbc").option("url", url).option("driver", driver).option(
        "dbtable", "qdim"
    ).option(
        # Derby maps StringType to CLOB, which cannot be IN-compared
        "createTableColumnTypes", "name VARCHAR(50)"
    ).mode("overwrite").save()
    fn = JdbcLookupFunction(spark, url, "qdim", "name", driver=driver)
    got = fn.lookup(["o'brien", "plain", "x''y"])
    assert got["o'brien"]["score"] == 1.0
    assert got["plain"]["score"] == 2.0
    assert got["x''y"] is None


def test_elasticsearch_sink_bulk_stub(spark):
    """Elasticsearch 7 sink end-to-end against an in-container bulk-API
    stub (flink-connector-elasticsearch7 parity the same way the
    file-backed kafka fake works): DDL with connector=elasticsearch-7 ->
    INSERT INTO -> the stub receives well-formed ndjson bulk payloads,
    PRIMARY KEY as the document _id (idempotent: re-inserting the same
    rows re-addresses the same ids), flush chunked by
    sink.bulk-flush.max-actions, and a bulk-level error fails the job."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from flink_parent_spark.api.table_env import TableEnvironment

    payloads = []
    fail_next = {"on": False}

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            payloads.append((self.path, body.decode()))
            resp = {"errors": fail_next["on"], "items": []}
            out = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE es_docs (
                doc_id BIGINT, title STRING, score DOUBLE,
                PRIMARY KEY (doc_id) NOT ENFORCED
            ) WITH ('connector' = 'elasticsearch-7',
                    'hosts' = 'http://127.0.0.1:{port}',
                    'index' = 'docs',
                    'sink.bulk-flush.max-actions' = '2')
        """)
        spark.createDataFrame(
            [(1, "a", 0.5), (2, "b", 0.7), (3, "c", 0.9)],
            "doc_id long, title string, score double",
        ).coalesce(1).createOrReplaceTempView("es_src")
        env.execute_sql("INSERT INTO es_docs SELECT * FROM es_src")

        assert payloads and all(p == "/_bulk" for p, _ in payloads)
        actions, docs = [], []
        for _, body in payloads:
            lines = [ln for ln in body.split("\n") if ln]
            assert len(lines) % 2 == 0  # action/doc pairs
            for a, d in zip(lines[::2], lines[1::2]):
                actions.append(json.loads(a))
                docs.append(json.loads(d))
        assert [a["index"]["_id"] for a in actions] == ["1", "2", "3"]
        assert all(a["index"]["_index"] == "docs" for a in actions)
        assert {d["title"] for d in docs} == {"a", "b", "c"}
        # max-actions=2 chunking: 3 rows on one partition -> 2 flushes
        assert len(payloads) == 2

        # idempotency: same rows -> same _ids (a retry overwrites in place)
        n0 = len(payloads)
        env.execute_sql("INSERT INTO es_docs SELECT * FROM es_src")
        again = [
            json.loads(a)["index"]["_id"]
            for _, body in payloads[n0:]
            for a in [ln for ln in body.split("\n") if ln][::2]
        ]
        assert again == ["1", "2", "3"]

        # bulk-level errors fail the write, like BulkProcessor's handler
        import pytest

        fail_next["on"] = True
        with pytest.raises(Exception, match="bulk|Runtime"):
            env.execute_sql("INSERT INTO es_docs SELECT * FROM es_src")
    finally:
        srv.shutdown()
        srv.server_close()


def test_kinesis_sink_putrecords_stub(spark):
    """Kinesis PutRecords sink end-to-end against an in-container HTTP
    stub (flink-connector-kinesis FlinkKinesisProducer parity): DDL with
    connector=kinesis -> INSERT INTO -> the stub receives well-formed
    Kinesis_20131202.PutRecords payloads with base64 json Data and the
    PRIMARY KEY as PartitionKey; a FailedRecordCount response fails the
    job."""
    import base64
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from flink_parent_spark.api.table_env import TableEnvironment

    payloads = []
    fail_next = {"n": 0}

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            payloads.append((self.headers.get("X-Amz-Target"), body.decode()))
            resp = {"FailedRecordCount": fail_next["n"], "Records": []}
            out = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE kin_out (
                uid BIGINT, amount DOUBLE,
                PRIMARY KEY (uid) NOT ENFORCED
            ) WITH ('connector' = 'kinesis', 'stream' = 'payments',
                    'aws.endpoint' = 'http://127.0.0.1:{port}',
                    'sink.batch.max-size' = '2')
        """)
        spark.createDataFrame(
            [(1, 1.5), (2, 2.5), (3, 3.5)], "uid long, amount double"
        ).coalesce(1).createOrReplaceTempView("kin_src")
        env.execute_sql("INSERT INTO kin_out SELECT * FROM kin_src")

        assert payloads
        # the DDL layer's scan half also issues ListShards probes against
        # the endpoint (view registration); the sink assertions are about
        # the PutRecords payloads specifically
        puts = [
            (t, b) for t, b in payloads if t == "Kinesis_20131202.PutRecords"
        ]
        assert puts
        recs = []
        for _, body in puts:
            p = json.loads(body)
            assert p["StreamName"] == "payments"
            recs.extend(p["Records"])
        assert [r["PartitionKey"] for r in recs] == ["1", "2", "3"]
        datas = [json.loads(base64.b64decode(r["Data"])) for r in recs]
        assert [d["amount"] for d in datas] == [1.5, 2.5, 3.5]
        assert len(puts) == 2  # batch.max-size=2 chunking of 3 rows

        import pytest

        fail_next["n"] = 1
        with pytest.raises(Exception, match="PutRecords|failed"):
            env.execute_sql("INSERT INTO kin_out SELECT * FROM kin_src")
    finally:
        srv.shutdown()
        srv.server_close()


def test_hbase_rest_lookup_join_stub(spark):
    """HBase lookup join through the REST gateway (Stargate), exercised
    against an in-container stub (HBaseRowDataLookupFunction parity):
    cache-missed rowkeys fetch in ONE multiget per probe, cell values
    decode from the gateway's base64 json, missing rows negative-cache,
    and the join runs executor-side through mapInPandas (probe keys never
    collect to the driver)."""
    import base64
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from flink_parent_spark.sources.connectors import (
        HBaseRestLookupFunction,
        jdbc_lookup_join,
    )

    dim = {str(i): {"label": f"dim_{i}", "score": str(i * 2.5)} for i in range(10)}
    requests = []

    def b64(s):
        return base64.b64encode(s.encode()).decode()

    class Stub(BaseHTTPRequestHandler):
        def do_GET(self):
            u = urlparse(self.path)
            requests.append(self.path)
            assert u.path == "/dimtab/multiget"
            keys = parse_qs(u.query).get("row", [])
            rows = [
                {
                    "key": b64(k),
                    "Cell": [
                        {"column": b64(f"cf:{q}"), "$": b64(v)}
                        for q, v in dim[k].items()
                    ],
                }
                for k in keys
                if k in dim
            ]
            if not rows:
                self.send_response(404)
                self.end_headers()
                return
            out = json.dumps({"Row": rows}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fn = HBaseRestLookupFunction(
            f"http://127.0.0.1:{port}", "dimtab", cache_max_rows=100
        )
        # direct probe: one multiget, negative caching for a miss
        got = fn.lookup(["1", "2", "nope"])
        assert got["1"]["label"] == "dim_1" and got["2"]["score"] == "5.0"
        assert got["nope"] is None and len(fn.queries) == 1
        fn.lookup(["1", "nope"])  # fully cached -> no new request
        assert len(fn.queries) == 1

        # executor-side join through the generic lookup-join dispatch
        probe = spark.createDataFrame(
            [(str(i % 5), f"fact_{i}") for i in range(20)] + [("99", "miss")],
            "id string, payload string",
        ).repartition(3)
        fn2 = HBaseRestLookupFunction(f"http://127.0.0.1:{port}", "dimtab")
        out = jdbc_lookup_join(
            probe, "id", fn2, [("label", "string"), ("score", "string")]
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "MapInPandas" in plan
        rows = {(r["id"], r["label"], r["score"]) for r in out.collect()}
        exp = {(str(i), f"dim_{i}", str(i * 2.5)) for i in range(5)} | {
            ("99", None, None)
        }
        assert rows == exp
        assert fn2.queries == []  # driver instance untouched
        assert fn2.query_count_accumulator.value >= 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_elasticsearch_composite_id_no_collision(spark):
    """Composite PRIMARY KEY document ids use an unambiguous json
    encoding: ('a_b','c') and ('a','b_c') must yield DIFFERENT _ids
    ('_'-joining collides and silently overwrites a foreign document)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from flink_parent_spark.sources.connectors import elasticsearch_bulk_sink

    payloads = []

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            payloads.append(
                self.rfile.read(int(self.headers["Content-Length"])).decode()
            )
            out = json.dumps({"errors": False, "items": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("a_b", "c", 1.0), ("a", "b_c", 2.0)], "k1 string, k2 string, v double"
        ).coalesce(1)
        elasticsearch_bulk_sink(
            df, f"http://127.0.0.1:{srv.server_address[1]}", "docs",
            id_cols=["k1", "k2"],
        )
        ids = [
            json.loads(ln)["index"]["_id"]
            for body in payloads
            for ln in body.split("\n")
            if ln and '"index"' in ln
        ]
        assert len(ids) == 2 and len(set(ids)) == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_cassandra_sink_cql_stub(spark):
    """Cassandra sink end-to-end against an in-container CQL
    native-protocol TCP stub (flink-connector-cassandra CassandraSink
    parity the same way the ES/kinesis/HBase stubs work): DDL with
    connector=cassandra -> INSERT INTO -> the stub handshakes
    STARTUP/READY and receives UNLOGGED BATCH / QUERY frames carrying the
    INSERT with positionally-bound binary values (no literal
    interpolation), chunked by sink.batch.max-size; an ERROR response
    fails the job like CassandraSinkBase's failure propagation."""
    import socketserver
    import struct
    import threading

    import pytest

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources import cassandra_cql as cql

    frames = []  # (opcode, body) for every non-STARTUP request
    fail_next = {"on": False}

    def reply(sock, stream, opcode, body=b""):
        sock.sendall(
            struct.pack(">BBhBi", 0x84, 0x00, stream, opcode, len(body)) + body
        )

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            sock = self.request
            try:
                while True:
                    hdr = cql.read_exact(sock, 9)
                    _v, _f, stream, opcode, length = cql.decode_frame_header(hdr)
                    body = cql.read_exact(sock, length) if length else b""
                    if opcode == cql.OP_STARTUP:
                        reply(sock, stream, cql.OP_READY)
                        continue
                    frames.append((opcode, body))
                    if fail_next["on"]:
                        msg = b"write timeout"
                        reply(
                            sock, stream, cql.OP_ERROR,
                            struct.pack(">i", 0x1100)
                            + struct.pack(">H", len(msg)) + msg,
                        )
                    else:
                        reply(
                            sock, stream, cql.OP_RESULT,
                            struct.pack(">i", 0x0001),  # kind 1: Void
                        )
            except (ConnectionError, OSError):
                return

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def parse_inserts(opcode, body):
        """-> list of (statement, [raw value bytes...]) in the frame."""
        out = []

        def read_long_string(off):
            (n,) = struct.unpack_from(">i", body, off)
            return body[off + 4 : off + 4 + n].decode(), off + 4 + n

        def read_values(off):
            (nv,) = struct.unpack_from(">H", body, off)
            off += 2
            vals = []
            for _ in range(nv):
                (ln,) = struct.unpack_from(">i", body, off)
                off += 4
                vals.append(None if ln < 0 else body[off : off + ln])
                off += max(ln, 0)
            return vals, off

        if opcode == cql.OP_QUERY:
            stmt, off = read_long_string(0)
            off += 2  # consistency
            assert body[off] & 0x01  # values flag
            vals, _ = read_values(off + 1)
            out.append((stmt, vals))
        else:
            assert opcode == cql.OP_BATCH
            btype, n = struct.unpack_from(">BH", body, 0)
            assert btype == 0x01  # UNLOGGED
            off = 3
            for _ in range(n):
                assert body[off] == 0x00  # kind: query string
                stmt, off = read_long_string(off + 1)
                vals, off = read_values(off)
                out.append((stmt, vals))
        return out

    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE cass_scores (
                user_id BIGINT, name STRING, score DOUBLE,
                PRIMARY KEY (user_id) NOT ENFORCED
            ) WITH ('connector' = 'cassandra',
                    'host' = '127.0.0.1', 'port' = '{port}',
                    'keyspace' = 'ks', 'table' = 'scores',
                    'sink.batch.max-size' = '2')
        """)
        rows = [(1, "a", 0.5), (2, None, 0.7), (3, "c", 0.9), (4, "d", 1.1),
                (5, "e", 1.3)]
        spark.createDataFrame(
            rows, "user_id long, name string, score double"
        ).coalesce(1).createOrReplaceTempView("cass_src")
        env.execute_sql("INSERT INTO cass_scores SELECT * FROM cass_src")

        inserts = [i for op, b in frames for i in parse_inserts(op, b)]
        assert len(inserts) == 5
        assert all(
            s == "INSERT INTO ks.scores (user_id, name, score) "
            "VALUES (?, ?, ?)" for s, _ in inserts
        )
        # batch.max-size=2 on one partition: 2 BATCH frames + 1 QUERY
        assert [op for op, _ in frames] == [
            cql.OP_BATCH, cql.OP_BATCH, cql.OP_QUERY,
        ]
        decoded = sorted(
            (
                struct.unpack(">q", v[0])[0],              # bigint
                None if v[1] is None else v[1].decode(),   # text (null row 2)
                struct.unpack(">d", v[2])[0],              # double
            )
            for _, v in inserts
        )
        assert decoded == sorted(rows)

        # an ERROR response fails the write, like the reference's
        # CassandraFailureHandler
        fail_next["on"] = True
        with pytest.raises(Exception, match="cassandra error|0x1100"):
            env.execute_sql("INSERT INTO cass_scores SELECT * FROM cass_src")
    finally:
        srv.shutdown()
        srv.server_close()


def test_cassandra_value_codec_roundtrip():
    """The CQL binary value encodings match the protocol spec's layouts
    for each mapped type (native_protocol_v4.spec section 6)."""
    import datetime
    import decimal
    import struct

    from flink_parent_spark.sources.cassandra_cql import encode_cql_value

    assert encode_cql_value(None, "string") is None
    assert encode_cql_value("héllo", "string") == "héllo".encode()
    assert encode_cql_value(7, "int") == struct.pack(">i", 7)
    assert encode_cql_value(-2, "bigint") == struct.pack(">q", -2)
    assert encode_cql_value(1.5, "double") == struct.pack(">d", 1.5)
    assert encode_cql_value(True, "boolean") == b"\x01"
    ts = datetime.datetime(2020, 1, 1, 0, 0, 0, tzinfo=datetime.timezone.utc)
    assert encode_cql_value(ts, "timestamp") == struct.pack(">q", 1577836800000)
    # date: unsigned days with epoch centered at 2^31
    assert encode_cql_value(
        datetime.date(1970, 1, 2), "date"
    ) == struct.pack(">I", 2**31 + 1)
    # decimal: [int scale][big-endian two's-complement unscaled]
    enc = encode_cql_value(decimal.Decimal("-12.34"), "decimal(7,2)")
    scale = struct.unpack(">i", enc[:4])[0]
    unscaled = int.from_bytes(enc[4:], "big", signed=True)
    assert (scale, unscaled) == (2, -1234)


def test_rabbitmq_sink_amqp_stub(spark):
    """RabbitMQ sink end-to-end against an in-container AMQP 0-9-1 TCP
    stub (flink-connector-rabbitmq RMQSink parity): DDL with
    connector=rabbitmq -> INSERT INTO -> the stub performs the
    Connection.Start/Tune/Open + Channel.Open handshake, sees the durable
    Queue.Declare and Confirm.Select, receives one
    Basic.Publish+header+body triple per row on the default exchange with
    routing key = queue name, and acks; a Basic.Nack fails the job."""
    import json
    import socketserver
    import struct
    import threading

    import pytest

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources import rabbitmq_amqp as amqp

    declares, publishes, bodies = [], [], []
    nack_mode = {"on": False}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            sock = self.request

            def send_method(channel, method, args=b""):
                sock.sendall(
                    amqp.encode_frame(
                        amqp.FRAME_METHOD, channel,
                        amqp.method_payload(*method, args),
                    )
                )

            try:
                assert amqp.read_exact(sock, 8) == amqp.PROTOCOL_HEADER
                send_method(
                    0, amqp.CONNECTION_START,
                    struct.pack(">BB", 0, 9) + struct.pack(">I", 0)
                    + amqp.longstr(b"PLAIN") + amqp.longstr(b"en_US"),
                )
                delivery_tag = 0
                while True:
                    ftype, channel, payload = amqp.read_frame(sock)
                    if ftype == amqp.FRAME_BODY:
                        bodies.append(payload.decode())
                        delivery_tag += 1
                        if nack_mode["on"]:
                            send_method(
                                channel, amqp.BASIC_NACK,
                                struct.pack(">QB", delivery_tag, 0),
                            )
                        else:
                            send_method(
                                channel, amqp.BASIC_ACK,
                                struct.pack(">QB", delivery_tag, 0),
                            )
                        continue
                    if ftype != amqp.FRAME_METHOD:
                        continue  # content headers, heartbeats
                    m, args = amqp.parse_method(payload)
                    if m == amqp.CONNECTION_START_OK:
                        send_method(
                            0, amqp.CONNECTION_TUNE,
                            struct.pack(">HIH", 2047, 131072, 60),
                        )
                    elif m == amqp.CONNECTION_TUNE_OK:
                        pass
                    elif m == amqp.CONNECTION_OPEN:
                        send_method(0, amqp.CONNECTION_OPEN_OK, b"\x00")
                    elif m == amqp.CHANNEL_OPEN:
                        send_method(
                            channel, amqp.CHANNEL_OPEN_OK, struct.pack(">I", 0)
                        )
                    elif m == amqp.QUEUE_DECLARE:
                        qlen = args[2]
                        qname = args[3 : 3 + qlen].decode()
                        flags = args[3 + qlen]
                        declares.append((qname, flags))
                        send_method(
                            channel, amqp.QUEUE_DECLARE_OK,
                            amqp.shortstr(qname) + struct.pack(">II", 0, 0),
                        )
                    elif m == amqp.CONFIRM_SELECT:
                        send_method(channel, amqp.CONFIRM_SELECT_OK)
                    elif m == amqp.BASIC_PUBLISH:
                        off = 2
                        xlen = args[off]
                        exchange = args[off + 1 : off + 1 + xlen].decode()
                        off += 1 + xlen
                        rlen = args[off]
                        rkey = args[off + 1 : off + 1 + rlen].decode()
                        publishes.append((exchange, rkey))
            except (ConnectionError, AssertionError, OSError):
                return

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE rmq_events (ev_id BIGINT, kind STRING)
            WITH ('connector' = 'rabbitmq',
                  'host' = '127.0.0.1', 'port' = '{port}',
                  'queue' = 'events_q', 'sink.confirm.max-size' = '2')
        """)
        rows = [(1, "click"), (2, "view"), (3, "buy")]
        spark.createDataFrame(rows, "ev_id long, kind string").coalesce(
            1
        ).createOrReplaceTempView("rmq_src")
        env.execute_sql("INSERT INTO rmq_events SELECT * FROM rmq_src")

        assert declares and declares[0][0] == "events_q"
        assert declares[0][1] & 0b10  # durable
        assert publishes == [("", "events_q")] * 3  # default exchange
        got = sorted(
            (json.loads(b)["ev_id"], json.loads(b)["kind"]) for b in bodies
        )
        assert got == sorted(rows)

        # a broker Nack propagates as a task failure (logFailuresOnly=false)
        nack_mode["on"] = True
        with pytest.raises(Exception, match="nack"):
            env.execute_sql("INSERT INTO rmq_events SELECT * FROM rmq_src")
    finally:
        srv.shutdown()
        srv.server_close()


def test_pubsub_publish_pull_roundtrip_stub(spark):
    """GCP Pub/Sub end-to-end against an in-container REST stub speaking
    the emulator's HTTP surface (flink-connector-gcp-pubsub PubSubSink /
    PubSubSource parity): DDL with connector=pubsub -> INSERT INTO
    publishes base64 messages in :publish chunks; pubsub_pull_read then
    drains the subscription via :pull/:acknowledge and yields the same
    rows; unacked messages would be re-served (at-least-once), acked ones
    are gone; a short messageIds response fails the job."""
    import base64
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pytest

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources.connectors import pubsub_pull_read

    topic_msgs, acked, publishes = [], set(), []
    short_ids = {"on": False}

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"])) or b"{}"
            )

            def reply(obj):
                out = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            if self.path.endswith(":publish"):
                msgs = body["messages"]
                publishes.append(len(msgs))
                start = len(topic_msgs)
                topic_msgs.extend(m["data"] for m in msgs)
                ids = [str(start + i) for i in range(len(msgs))]
                reply({"messageIds": ids[:-1] if short_ids["on"] else ids})
            elif self.path.endswith(":pull"):
                want = body.get("maxMessages", 100)
                out = []
                for i, data in enumerate(topic_msgs):
                    if str(i) in acked or len(out) >= want:
                        continue
                    out.append(
                        {
                            "ackId": str(i),
                            "message": {"data": data, "messageId": str(i)},
                        }
                    )
                reply({"receivedMessages": out})
            elif self.path.endswith(":acknowledge"):
                acked.update(body["ackIds"])
                reply({})

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE ps_events (ev_id BIGINT, kind STRING)
            WITH ('connector' = 'pubsub',
                  'gcp.endpoint' = 'http://127.0.0.1:{port}',
                  'project' = 'p1', 'topic' = 'events',
                  'sink.batch.max-size' = '2')
        """)
        rows = [(1, "click"), (2, "view"), (3, "buy")]
        spark.createDataFrame(rows, "ev_id long, kind string").coalesce(
            1
        ).createOrReplaceTempView("ps_src")
        env.execute_sql("INSERT INTO ps_events SELECT * FROM ps_src")

        assert publishes == [2, 1]  # sink.batch.max-size chunking
        decoded = [json.loads(base64.b64decode(d)) for d in topic_msgs]
        assert sorted((d["ev_id"], d["kind"]) for d in decoded) == sorted(rows)

        # pull drains and acks; a second pull sees nothing
        got = pubsub_pull_read(
            spark, f"http://127.0.0.1:{port}", "p1", "events-sub",
            "ev_id long, kind string", batch=2,
        )
        assert sorted((r.ev_id, r.kind) for r in got.collect()) == sorted(rows)
        assert len(acked) == 3
        again = pubsub_pull_read(
            spark, f"http://127.0.0.1:{port}", "p1", "events-sub",
            "ev_id long, kind string",
        )
        assert again.count() == 0

        # a short messageIds response fails the publish
        short_ids["on"] = True
        with pytest.raises(Exception, match="messageIds|messages"):
            env.execute_sql("INSERT INTO ps_events SELECT * FROM ps_src")
    finally:
        srv.shutdown()
        srv.server_close()


def test_hadoop_sequence_file_roundtrip(spark, tmp_path):
    """flink-hadoop-compatibility parity (HadoopInputs/HadoopOutputs):
    a (Text, LongWritable) SequenceFile roundtrip through the RDD bridge,
    and the newAPI TextInputFormat read exposing byte offsets."""
    from flink_parent_spark.sources.hadoop_compat import (
        read_hadoop_text,
        read_sequence_file,
        write_sequence_file,
    )

    rows = [("alpha", 1), ("beta", 2), ("gamma", 3)]
    df = spark.createDataFrame(rows, "k string, v long")
    seq = str(tmp_path / "seq")
    write_sequence_file(df, seq, "k", "v")
    back = read_sequence_file(spark, seq, "k string, v long")
    assert sorted(map(tuple, back.collect())) == sorted(rows)

    txt = str(tmp_path / "txt")
    df.select("k").coalesce(1).write.text(txt)
    lines = read_hadoop_text(spark, txt)
    got = sorted((r.offset, r.line) for r in lines.collect())
    # offsets are cumulative byte positions of each line start
    assert [o for o, _ in got] == [0, 6, 11]
    assert sorted(l for _, l in got) == ["alpha", "beta", "gamma"]


def test_twitter_sample_read_stub(spark):
    """Twitter sample-stream source against an in-container HTTP stub
    (flink-connector-twitter TwitterSource parity: raw json status
    strings off a chunked HTTP stream, keep-alive newlines skipped,
    bounded drain): statuses arrive as `(status string)` rows and parse
    downstream with from_json exactly like the reference's flatMap."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from flink_parent_spark.sources.connectors import twitter_sample_read

    statuses = [
        {"id": 1, "text": "hello spark", "lang": "en"},
        {"id": 2, "text": "bonjour flink", "lang": "fr"},
        {"id": 3, "text": "hola stream", "lang": "es"},
    ]

    class Stub(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            self.send_response(200)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(b: bytes):
                self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")

            for s in statuses:
                chunk(json.dumps(s).encode() + b"\r\n")
                chunk(b"\r\n")  # keep-alive newline between statuses
            self.wfile.write(b"0\r\n\r\n")  # end of stream

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = twitter_sample_read(
            spark, f"http://127.0.0.1:{port}/1.1/statuses/sample.json"
        )
        parsed = df.select(
            F.from_json("status", "id long, text string, lang string").alias("s")
        ).select("s.*")
        got = sorted((r.id, r.text, r.lang) for r in parsed.collect())
        assert got == sorted((s["id"], s["text"], s["lang"]) for s in statuses)

        # bounded drain stops mid-stream at max_statuses
        df2 = twitter_sample_read(
            spark, f"http://127.0.0.1:{port}/1.1/statuses/sample.json",
            max_statuses=2,
        )
        assert df2.count() == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_cassandra_read_rows_result_stub(spark):
    """Cassandra read side (CassandraInputFormat role): a CQL SELECT
    against the TCP stub returns a Rows RESULT (global table spec,
    column metadata, binary values) that decodes into a typed DataFrame,
    nulls included."""
    import datetime
    import decimal
    import socketserver
    import struct
    import threading

    from flink_parent_spark.sources import cassandra_cql as cql

    def shortstr(s):
        b = s.encode()
        return struct.pack(">H", len(b)) + b

    cols = [("user_id", 0x0002), ("name", 0x000D), ("score", 0x0007),
            ("born", 0x0011), ("bal", 0x0006)]
    data = [
        (struct.pack(">q", 1), b"ada", struct.pack(">d", 0.5),
         struct.pack(">I", 2**31 + 10),
         struct.pack(">i", 2) + (1234).to_bytes(2, "big", signed=True)),
        (struct.pack(">q", 2), None, struct.pack(">d", 1.5),
         struct.pack(">I", 2**31 - 3),
         struct.pack(">i", 2) + (-50).to_bytes(1, "big", signed=True)),
    ]

    def rows_result():
        out = [struct.pack(">iii", 0x0002, 0x0001, len(cols))]  # kind/flags/n
        out.append(shortstr("ks") + shortstr("scores"))  # global spec
        for n, tid in cols:
            out.append(shortstr(n) + struct.pack(">H", tid))
        out.append(struct.pack(">i", len(data)))
        for row in data:
            for v in row:
                out.append(cql.encode_bytes(v))
        return b"".join(out)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            sock = self.request
            try:
                while True:
                    hdr = cql.read_exact(sock, 9)
                    _v, _f, stream, opcode, length = cql.decode_frame_header(hdr)
                    if length:
                        cql.read_exact(sock, length)
                    if opcode == cql.OP_STARTUP:
                        body = b""
                        op = cql.OP_READY
                    else:
                        body = rows_result()
                        op = cql.OP_RESULT
                    sock.sendall(
                        struct.pack(">BBhBi", 0x84, 0, stream, op, len(body))
                        + body
                    )
            except (ConnectionError, OSError):
                return

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = cql.cassandra_cql_read(
            spark, "127.0.0.1", srv.server_address[1],
            "SELECT user_id, name, score, born, bal FROM ks.scores",
        )
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "string", "double", "date", "decimal(38,18)",
        ]
        got = sorted(df.collect(), key=lambda r: r.user_id)
        assert (got[0].user_id, got[0].name, got[0].score) == (1, "ada", 0.5)
        assert got[0].born == datetime.date(1970, 1, 11)
        assert got[0].bal == decimal.Decimal("12.34")
        assert got[1].name is None
        assert got[1].born == datetime.date(1969, 12, 29)
        assert got[1].bal == decimal.Decimal("-0.50")
    finally:
        srv.shutdown()
        srv.server_close()


def test_rabbitmq_bounded_read_stub(spark):
    """RabbitMQ read side (RMQSource's pull form): Basic.Get drains the
    queue message-by-message with explicit post-buffer acks — the stub
    serves stored bodies via GetOk + header + body frames, marks them
    acked only on Basic.Ack, and a second drain sees GetEmpty at once."""
    import json
    import socketserver
    import struct
    import threading

    from flink_parent_spark.sources import rabbitmq_amqp as amqp

    msgs = [json.dumps({"ev_id": i, "kind": k}).encode()
            for i, k in [(1, "click"), (2, "view"), (3, "buy")]]
    state = {"next": 0, "acked": set()}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            sock = self.request

            def send_method(channel, method, args=b""):
                sock.sendall(
                    amqp.encode_frame(
                        amqp.FRAME_METHOD, channel,
                        amqp.method_payload(*method, args),
                    )
                )

            try:
                assert amqp.read_exact(sock, 8) == amqp.PROTOCOL_HEADER
                send_method(
                    0, amqp.CONNECTION_START,
                    struct.pack(">BB", 0, 9) + struct.pack(">I", 0)
                    + amqp.longstr(b"PLAIN") + amqp.longstr(b"en_US"),
                )
                while True:
                    ftype, channel, payload = amqp.read_frame(sock)
                    if ftype != amqp.FRAME_METHOD:
                        continue
                    m, args = amqp.parse_method(payload)
                    if m == amqp.CONNECTION_START_OK:
                        send_method(
                            0, amqp.CONNECTION_TUNE,
                            struct.pack(">HIH", 2047, 131072, 60),
                        )
                    elif m == amqp.CONNECTION_OPEN:
                        send_method(0, amqp.CONNECTION_OPEN_OK, b"\x00")
                    elif m == amqp.CHANNEL_OPEN:
                        send_method(
                            channel, amqp.CHANNEL_OPEN_OK, struct.pack(">I", 0)
                        )
                    elif m == amqp.QUEUE_DECLARE:
                        qlen = args[2]
                        qname = args[3 : 3 + qlen].decode()
                        send_method(
                            channel, amqp.QUEUE_DECLARE_OK,
                            amqp.shortstr(qname) + struct.pack(">II", 0, 0),
                        )
                    elif m == amqp.BASIC_GET:
                        i = state["next"]
                        while i < len(msgs) and i + 1 in state["acked"]:
                            i += 1
                        if i >= len(msgs):
                            send_method(
                                channel, amqp.BASIC_GET_EMPTY, amqp.shortstr("")
                            )
                            continue
                        state["next"] = i + 1
                        body = msgs[i]
                        send_method(
                            channel, amqp.BASIC_GET_OK,
                            struct.pack(">QB", i + 1, 0)  # tag, redelivered
                            + amqp.shortstr("") + amqp.shortstr("events_q")
                            + struct.pack(">I", len(msgs) - i - 1),
                        )
                        sock.sendall(
                            amqp.encode_frame(
                                amqp.FRAME_HEADER, channel,
                                struct.pack(">HHQH", 60, 0, len(body), 0),
                            )
                        )
                        # split the body across two frames: the reader
                        # must reassemble
                        mid = max(1, len(body) // 2)
                        for chunk in (body[:mid], body[mid:]):
                            sock.sendall(
                                amqp.encode_frame(
                                    amqp.FRAME_BODY, channel, chunk
                                )
                            )
                    elif m == amqp.BASIC_ACK:
                        (tag,) = struct.unpack_from(">Q", args, 0)
                        state["acked"].add(tag)
            except (ConnectionError, AssertionError, OSError):
                return

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = amqp.rabbitmq_bounded_read(
            spark, "127.0.0.1", port, "events_q", "ev_id long, kind string"
        )
        got = sorted((r.ev_id, r.kind) for r in df.collect())
        assert got == [(1, "click"), (2, "view"), (3, "buy")]
        assert state["acked"] == {1, 2, 3}  # acked after buffering
        again = amqp.rabbitmq_bounded_read(
            spark, "127.0.0.1", port, "events_q", "ev_id long, kind string"
        )
        assert again.count() == 0
    finally:
        srv.shutdown()
        srv.server_close()


def test_nifi_site_to_site_roundtrip_stub(spark):
    """NiFi site-to-site connector end-to-end against an in-container HTTP
    stub implementing the documented data-transfer surface
    (flink-connector-nifi: NiFiSink.java createTransaction/send/confirm/
    complete; NiFiSource.java transaction receive loop). Checks the full
    two-phase discipline: packets become visible only after
    CONFIRM_TRANSACTION; a corrupted checksum echo aborts with
    BAD_CHECKSUM and fails the job; the receive side drains the port with
    checksum-confirmed transactions and yields the NiFiDataPacket shape."""
    import json
    import re
    import threading
    import zlib
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from flink_parent_spark.api.table_env import TableEnvironment
    from flink_parent_spark.sources import nifi_s2s

    state = {
        "next_tx": 0,
        "pending": {},      # tx id -> raw body bytes (sent, not committed)
        "committed": [],    # packet stream bodies, in commit order
        "deletes": [],      # (tx, responseCode, checksum)
        "corrupt_crc": False,
        "lock": threading.Lock(),
    }
    TX_RE = re.compile(
        r"^/nifi-api/data-transfer/(input|output)-ports/([\w-]+)/transactions"
        r"(?:/(\d+)(/flow-files)?)?(?:\?(.*))?$"
    )

    class Stub(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _respond(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            m = TX_RE.match(self.path)
            assert m, self.path
            kind, _port, tx, ff = m.group(1), m.group(2), m.group(3), m.group(4)
            if tx is None:  # create transaction
                with state["lock"]:
                    txid = state["next_tx"]
                    state["next_tx"] += 1
                loc = (
                    f"/nifi-api/data-transfer/{kind}-ports/{_port}"
                    f"/transactions/{txid}"
                )
                self._respond(
                    201,
                    json.dumps({"transaction": {"id": txid}}).encode(),
                    [("Location", loc)],
                )
                return
            assert ff and kind == "input"  # send data
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with state["lock"]:
                state["pending"][int(tx)] = body
            crc = zlib.crc32(body) & 0xFFFFFFFF
            if state["corrupt_crc"]:
                crc = (crc + 1) & 0xFFFFFFFF
            self._respond(202, str(crc).encode())

        def do_GET(self):
            m = TX_RE.match(self.path)
            assert m and m.group(1) == "output" and m.group(4), self.path
            with state["lock"]:
                if not state["committed"]:
                    self._respond(204)
                    return
                body = state["committed"].pop(0)
                state["pending"][int(m.group(3))] = body
            self._respond(200, body)

        def do_DELETE(self):
            m = TX_RE.match(self.path)
            assert m, self.path
            kind, tx, q = m.group(1), int(m.group(3)), m.group(5) or ""
            params = dict(p.split("=", 1) for p in q.split("&") if "=" in p)
            code = params.get("responseCode", "")
            with state["lock"]:
                body = state["pending"].pop(tx, None)
                state["deletes"].append((tx, code, params.get("checksum")))
                if code == "CONFIRM_TRANSACTION" and kind == "input":
                    assert body is not None
                    state["committed"].append(body)
                if code == "CONFIRM_TRANSACTION" and kind == "output":
                    expect = zlib.crc32(body) & 0xFFFFFFFF
                    assert int(params["checksum"]) == expect
            self._respond(200, json.dumps({"flowFileSent": 0}).encode())

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE nifi_out (
                doc_id BIGINT, lang STRING, body STRING
            ) WITH ('connector' = 'nifi',
                    'url' = 'http://127.0.0.1:{port}',
                    'port-id' = 'in-port-1',
                    'content.column' = 'body',
                    'sink.batch.max-flowfiles' = '2')
        """)
        spark.createDataFrame(
            [(1, "en", "hello"), (2, "de", "hallo"), (3, "fr", "salut")],
            "doc_id long, lang string, body string",
        ).coalesce(1).createOrReplaceTempView("nifi_src")
        env.execute_sql("INSERT INTO nifi_out SELECT * FROM nifi_src")

        # batch.max-flowfiles=2 -> 3 rows on one partition = 2 transactions,
        # each committed via CONFIRM_TRANSACTION after the checksum echo
        confirms = [d for d in state["deletes"] if d[1] == "CONFIRM_TRANSACTION"]
        assert len(confirms) == 2 and len(state["committed"]) == 2

        # receive side: drain the output port; NiFiDataPacket shape back
        df = nifi_s2s.nifi_s2s_read(
            spark, f"http://127.0.0.1:{port}", "out-port-1"
        )
        got = sorted(
            (r.attributes["doc_id"], r.attributes["lang"], bytes(r.content))
            for r in df.collect()
        )
        assert got == [
            ("1", "en", b"hello"),
            ("2", "de", b"hallo"),
            ("3", "fr", b"salut"),
        ]
        # receive transactions confirmed WITH a checksum param
        out_confirms = [
            d for d in state["deletes"][len(confirms) + 1 :]
            if d[1] == "CONFIRM_TRANSACTION"
        ]
        assert out_confirms and all(c[2] is not None for c in out_confirms)
        # port now empty: next read returns no rows
        assert (
            nifi_s2s.nifi_s2s_read(
                spark, f"http://127.0.0.1:{port}", "out-port-1"
            ).count()
            == 0
        )

        # a corrupted checksum echo aborts with BAD_CHECKSUM, commits
        # nothing, and fails the job (Transaction.confirm() contract)
        import pytest

        state["corrupt_crc"] = True
        n_committed = len(state["committed"])
        with pytest.raises(Exception, match="checksum|BAD"):
            env.execute_sql("INSERT INTO nifi_out SELECT * FROM nifi_src")
        assert len(state["committed"]) == n_committed
        assert any(d[1] == "BAD_CHECKSUM" for d in state["deletes"])
    finally:
        srv.shutdown()
        srv.server_close()


def test_kafka_confluent_registry_avro_roundtrip_stub(spark, tmp_path):
    """Confluent Schema Registry avro wire format end-to-end against an
    in-container registry stub (flink-avro-confluent-registry:
    ConfluentSchemaRegistryCoder magic-0 + int32 schema id framing;
    ConfluentRegistryAvro[De]serializationSchema roles): the sink
    registers the writer schema once and frames every record
    executor-side; the source discovers the reader schema from the
    subject's latest version and resolves writer ids per record —
    including reading OLD frames under an EVOLVED reader schema (missing
    field -> null). A foreign magic byte fails the decode like
    readSchema's magic check."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pytest

    from flink_parent_spark.sources import avro_confluent as ac
    from flink_parent_spark.sources.connectors import kafka_file_source

    schemas: dict[int, str] = {}
    subjects: dict[str, list[int]] = {}

    class Stub(BaseHTTPRequestHandler):
        def _json(self, obj, status=200):
            out = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def do_POST(self):
            # /subjects/{subject}/versions
            subject = self.path.split("/")[2]
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            schema = body["schema"]
            for sid, s in schemas.items():
                if s == schema and sid in subjects.get(subject, []):
                    self._json({"id": sid})
                    return
            sid = len(schemas) + 1
            schemas[sid] = schema
            subjects.setdefault(subject, []).append(sid)
            self._json({"id": sid})

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts[0] == "schemas":  # /schemas/ids/{id}
                sid = int(parts[2])
                if sid not in schemas:
                    self._json({"error_code": 40403}, 404)
                    return
                self._json({"schema": schemas[sid]})
            else:  # /subjects/{subject}/versions/latest
                sid = subjects[parts[1]][-1]
                self._json({"id": sid, "schema": schemas[sid], "version": 1})

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    topic_dir = str(tmp_path / "ctopics")
    try:
        df = spark.createDataFrame(
            [(1, "alpha", 0.5), (2, "beta", 1.5), (3, None, 2.5)],
            "ev_id long, name string, score double",
        )
        sid = ac.kafka_confluent_sink(
            df, topic_dir, "events_avro", url, key_cols=["ev_id"]
        )
        assert sid == 1

        # wire check: every message value is magic 0x00 + BE schema id
        import struct

        raws = [
            bytes(r.value)
            for r in kafka_file_source(
                spark, topic_dir, "events_avro", streaming=False
            ).collect()
        ]
        assert len(raws) == 3
        assert all(v[0] == 0 for v in raws)
        assert all(struct.unpack(">i", v[1:5])[0] == sid for v in raws)

        back = ac.kafka_confluent_source(spark, topic_dir, "events_avro", url)
        got = sorted((r.ev_id, r.name, r.score) for r in back.collect())
        assert got == [(1, "alpha", 0.5), (2, "beta", 1.5), (3, None, 2.5)]

        # schema evolution: a writer with an extra field registers v2; old
        # frames decode under the evolved reader with the new field null
        df2 = spark.createDataFrame(
            [(4, "gamma", 3.5, 7)],
            "ev_id long, name string, score double, shard long",
        )
        ac.kafka_confluent_sink(df2, topic_dir, "events_avro", url)
        evolved = ac.kafka_confluent_source(spark, topic_dir, "events_avro", url)
        rows = {r.ev_id: r for r in evolved.collect()}
        assert rows[4].shard == 7
        assert rows[1].shard is None  # old frame, evolved reader

        # foreign magic byte -> decode failure (readSchema parity)
        with pytest.raises(ValueError, match="magic"):
            ac.decode_confluent_frame(b"\x01rest", lambda i: {})
    finally:
        srv.shutdown()
        srv.server_close()
