"""Coverage queries for the remaining SURVEY §2 surface: format sources and
the partitioned filesystem sink (read-back checked), lookup join, the
Python UDF surface (scalar / grouped-agg / table function), count windows,
and the broadcast-state pattern (stream-static join)."""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from flink_parent_spark.functions.udf import agg_udf, scalar_udf, table_function
from flink_parent_spark.operators.joins import lookup_join
from flink_parent_spark.queries.registry import df_query, dsum
from flink_parent_spark.sources.formats import read_table, write_table
from flink_parent_spark.streaming.core import run_stream_to_df, stream_table
from flink_parent_spark.streaming.stateful import _micros_double
from flink_parent_spark.tables import load_tables

# --- filesystem sink (partitioned) + csv/json sources ------------------------


@df_query(
    "sink_partitioned_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_partitioned_roundtrip(spark, sf_dir):
    """FileSystemTableSink parity: write lineitem partitioned by returnflag
    (hive-style layout), read it back, aggregate. Partition values survive
    the directory-encoding round trip; partition pruning applies on read."""
    t = load_tables(spark, sf_dir)
    out = os.path.join(tempfile.gettempdir(), "fps_sink_roundtrip")
    write_table(
        t["lineitem"].select("l_returnflag", "l_linestatus", "l_quantity"),
        out,
        fmt="parquet",
        partition_by=["l_returnflag"],
    )
    back = read_table(spark, out, fmt="parquet")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("sum_qty"),
    )


@df_query(
    "source_csv_json_roundtrip",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def source_csv_json_roundtrip(spark, sf_dir):
    """csv + json format coverage: nation -> csv -> json -> aggregate."""
    t = load_tables(spark, sf_dir)
    base = os.path.join(tempfile.gettempdir(), "fps_fmt_roundtrip")
    write_table(t["nation"], f"{base}/csv", fmt="csv")
    csv_back = read_table(
        spark,
        f"{base}/csv",
        fmt="csv",
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    write_table(csv_back, f"{base}/json", fmt="json")
    json_back = read_table(
        spark,
        f"{base}/json",
        fmt="json",
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    return json_back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"), F.min("n_name").alias("first_name")
    )


# --- lookup join --------------------------------------------------------------


@df_query(
    "lookup_join_enrich_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, n_name
    FROM orders
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderkey < 500
    """,
)
def lookup_join_enrich_orders(spark, sf_dir):
    """LookupJoinRunner parity: fact stream enriched against broadcast dims."""
    t = load_tables(spark, sf_dir)
    facts = t["orders"].filter(F.col("o_orderkey") < 500)
    enriched = lookup_join(facts, t["customer"], [("o_custkey", "c_custkey")])
    enriched = lookup_join(enriched, t["nation"], [("c_nationkey", "n_nationkey")])
    return enriched.select("o_orderkey", "o_totalprice", "c_name", "n_name")


# --- Python UDF surface -------------------------------------------------------


@df_query(
    "udf_scalar_pandas",
    oracle="""
    SELECT c_custkey,
           c_acctbal * 1.1 + 5 AS adjusted,
           length(c_name) + c_nationkey AS mix
    FROM customer WHERE c_custkey < 200
    """,
)
def udf_scalar_pandas(spark, sf_dir):
    t = load_tables(spark, sf_dir)

    @scalar_udf("double")
    def adjust(bal: pd.Series) -> pd.Series:
        return bal * 1.1 + 5

    @scalar_udf("long")
    def mix(name: pd.Series, nk: pd.Series) -> pd.Series:
        return name.str.len() + nk

    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            adjust("c_acctbal").alias("adjusted"),
            mix("c_name", "c_nationkey").alias("mix"),
        )
    )


@df_query(
    "udaf_grouped_agg_pandas",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(c_acctbal) AS mean_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def udaf_grouped_agg_pandas(spark, sf_dir):
    """AggregateFunction parity: custom vectorized mean with the decimal
    determinism contract applied inside the UDAF."""
    t = load_tables(spark, sf_dir)
    from decimal import ROUND_HALF_UP, Decimal

    @agg_udf("double")
    def decimal_mean(v: pd.Series) -> float:
        q = Decimal("0.000001")
        total = sum(Decimal(float(x)).quantize(q, rounding=ROUND_HALF_UP) for x in v)
        # float division of the exact decimal total matches the oracle's
        # CAST(decimal-sum AS DOUBLE) / COUNT double division
        return float(total) / len(v) if len(v) else None

    return t["customer"].groupBy("c_mktsegment").agg(
        decimal_mean("c_acctbal").alias("mean_bal")
    )


@df_query(
    "udtf_tokenize",
    oracle=r"""
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents WHERE doc_id < 10
    """,
)
def udtf_tokenize(spark, sf_dir):
    """TableFunction (UDTF) parity: one input row -> n output rows."""
    t = load_tables(spark, sf_dir)

    def tokenize(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for tok in str(text).strip().split():
                rows.append({"doc_id": doc_id, "token": tok})
        return pd.DataFrame(rows, columns=["doc_id", "token"])

    return table_function(
        t["documents"].filter(F.col("doc_id") < 10).select("doc_id", "text"),
        tokenize,
        "doc_id bigint, token string",
    )


@df_query(
    "async_lookup_join_regions",
    oracle="""
    SELECT n_nationkey, n_name, r.r_name AS region_name
    FROM nation LEFT JOIN region r ON n_regionkey = r_regionkey
    """,
)
def async_lookup_join_regions(spark, sf_dir):
    """AsyncDataStream/AsyncTableFunction parity: batched external lookups
    via mapInPandas; the 'service' here is an in-memory bulk client built
    from the region table (collected once on the driver — it is a dim)."""
    from flink_parent_spark.operators.async_lookup import async_lookup_join, dict_client

    t = load_tables(spark, sf_dir)
    region_map = {
        r["r_regionkey"]: {"region_name": r["r_name"]} for r in t["region"].collect()
    }
    enriched = async_lookup_join(
        t["nation"].select("n_nationkey", "n_name", "n_regionkey"),
        "n_regionkey",
        dict_client(region_map),
        [("region_name", "string")],
    )
    return enriched.select("n_nationkey", "n_name", "region_name")


@df_query(
    "flat_aggregate_top2",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 2
    """,
)
def flat_aggregate_top2(spark, sf_dir):
    """TableAggregateFunction (flatAggregate) parity: a grouped aggregate
    that EMITS MULTIPLE ROWS per group (Flink's emitValue surface), via
    applyInPandas."""
    t = load_tables(spark, sf_dir)

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).head(2)[["c_mktsegment", "c_custkey", "c_acctbal"]]

    return t["customer"].groupBy("c_mktsegment").applyInPandas(
        top2, "c_mktsegment string, c_custkey bigint, c_acctbal double"
    )


@df_query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_disc(l_quantity, 0.25) AS p25_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact percentile aggregates (continuous + discrete interpolation)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile_approx(l_quantity, 0.25, 2147483647)").alias("p25_disc"),
    )


# --- count windows (streaming-only machinery, §2.9) ---------------------------


@df_query(
    "stream_count_window",
    oracle=f"""
    WITH numbered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS rn
      FROM events
    )
    SELECT user_id, CAST(rn // 5 AS INT) AS win_id, COUNT(*) AS n,
           {dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, rn // 5
    HAVING COUNT(*) = 5
    """,
)
def stream_count_window(spark, sf_dir):
    """Count-tumbling window (CountTumblingWindowAssigner parity): every 5
    events per key form a window; only complete windows emit. Implemented as
    a stateful row counter per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_table(spark, sf_dir, "events")
    size = 5

    def fn(key, pdfs, state):
        # state: (next ordinal, carried partial-window rows' values)
        if state.exists:
            start, carried = state.get
            carried = list(carried)
        else:
            start, carried = 0, []
        rows = []
        for pdf in pdfs:
            rows.extend(
                pdf[["user_id", "ts", "event_id", "value"]]
                .sort_values(["ts", "event_id"])
                .to_dict("records")
            )
        vals = carried + [r["value"] for r in rows]
        out = []
        win_id = start // size
        while len(vals) >= size:
            chunk, vals = vals[:size], vals[size:]
            from decimal import ROUND_HALF_UP, Decimal

            q = Decimal("0.000001")
            s = sum(Decimal(float(x)).quantize(q, rounding=ROUND_HALF_UP) for x in chunk)
            out.append(
                {
                    "user_id": key[0],
                    "win_id": win_id,
                    "n": size,
                    "sum_value": float(s),
                }
            )
            win_id += 1
        state.update((win_id * size, vals))
        yield pd.DataFrame(out, columns=["user_id", "win_id", "n", "sum_value"])

    res = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id bigint, win_id int, n bigint, sum_value double",
        "start bigint, carried array<double>",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return run_stream_to_df(res, "append")


@df_query(
    "stream_count_window_sliding",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER w AS rn,
             CAST(SUM(CAST(value AS DECIMAL(30,6)))
                  OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS s,
             COUNT(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(rn / 2 - 1 AS INT) AS win_id, n, s AS sum_value
    FROM numbered WHERE rn % 2 = 0
    """,
)
def stream_count_window_sliding(spark, sf_dir):
    """Count-SLIDING window (KeyedStream.countWindow(size, slide) →
    CountSlidingWindowAssigner / GlobalWindows + CountEvictor(size) +
    CountTrigger(slide)): the window FIRES every `slide`=2 elements per
    key, aggregating over the last `size`=5 elements (fewer while the key
    warms up — the evictor caps, it does not wait). Stateful per-key ring
    buffer of the last `size` values + a fire counter; integer-micros
    accumulation like every other streaming aggregate."""
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    ev = stream_table(spark, sf_dir, "events")
    size, slide = 5, 2
    q = Decimal("0.000001")

    def fn(key, pdfs, state):
        cnt, buf = (state.get if state.exists else (0, []))
        buf = list(buf)
        rows = []
        for pdf in pdfs:
            rows.extend(
                pdf[["user_id", "ts", "event_id", "value"]]
                .sort_values(["ts", "event_id"])
                .to_dict("records")
            )
        out = []
        for r in rows:
            buf.append(
                int(Decimal(float(r["value"])).quantize(q, rounding=ROUND_HALF_UP)
                    * 1_000_000)
            )
            if len(buf) > size:
                buf.pop(0)
            cnt += 1
            if cnt % slide == 0:
                out.append(
                    {
                        "user_id": key[0],
                        "win_id": cnt // slide - 1,
                        "n": len(buf),
                        "sum_value": _micros_double(sum(buf)),
                    }
                )
        state.update((cnt, buf))
        yield pd.DataFrame(out, columns=["user_id", "win_id", "n", "sum_value"])

    res = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id bigint, win_id int, n bigint, sum_value double",
        "cnt bigint, buf array<bigint>",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return run_stream_to_df(res, "append")


# --- broadcast-state pattern: stream-static join ------------------------------


@df_query(
    "stream_static_join",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_events, {dsum('value', 'sum_value')}
    FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey
    GROUP BY n_name
    """,
)
def stream_static_join(spark, sf_dir):
    """Broadcast-state parity (BroadcastConnectedStream): a streaming fact
    joined against a static broadcast dimension, then aggregated."""
    t = load_tables(spark, sf_dir)
    ev = stream_table(spark, sf_dir, "events").withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    joined = ev.join(F.broadcast(t["nation"]), ev.nk == t["nation"].n_nationkey)
    agg = joined.groupBy("n_name").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )
    return run_stream_to_df(agg, "complete")


@df_query(
    "udtf_native_lateral",
    oracle=r"""
    SELECT doc_id, t.pos, t.token
    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 10) d,
    LATERAL (
      SELECT CAST(i - 1 AS INT) AS pos, toks[i] AS token
      FROM (SELECT string_split_regex(trim(d.text), '\s+') AS toks) s,
           UNNEST(generate_series(1, len(toks))) AS u(i)
    ) t
    """,
)
def udtf_native_lateral(spark, sf_dir):
    """Python UDTF via the native @udtf API (Spark 3.5+) in a LATERAL join —
    the direct equivalent of Flink's TableFunction + CROSS APPLY
    (flink-table-common/.../functions/TableFunction.java; PyFlink udtf at
    flink-python/pyflink/table/udf.py:373). Arrow-batched eval; falls back
    to the mapInPandas formulation on builds without UDTF support."""
    from pyspark.sql.functions import udtf

    t = load_tables(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 10).select("doc_id", "text")

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(str(text).strip().split()):
                yield i, tok

    spark.udtf.register("fps_tokenize", Tokenize)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM __udtf_docs d, "
        "LATERAL fps_tokenize(d.text) t"
    )


@df_query(
    "cogroup_order_reconcile",
    oracle="""
    SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS orderkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(l.n_items, 0) AS n_items,
           COALESCE(l.item_total, 0.0) AS item_total
    FROM (SELECT o_orderkey, COUNT(*) AS n_orders
          FROM orders WHERE o_orderkey < 500 GROUP BY o_orderkey) o
    FULL OUTER JOIN
         (SELECT l_orderkey, COUNT(*) AS n_items,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                   AS item_total
          FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey) l
      ON o.o_orderkey = l.l_orderkey
    """,
)
def cogroup_order_reconcile(spark, sf_dir):
    """DataStream coGroup / DataSet coGroup parity via PySpark's native
    cogroup (CoGroupedStreams.java -> df.groupBy().cogroup()): both sides
    shuffle once by key, the pandas function sees each key's rows from BOTH
    relations together — including keys present on only one side (the
    outer-ness a join+agg would need FULL OUTER for). Decimal-exact item
    totals via integer micros."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderkey") < 500).select("o_orderkey")
    items = t["lineitem"].filter(F.col("l_orderkey") < 500).select(
        "l_orderkey", "l_extendedprice"
    )
    q = Decimal("0.000001")

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = left["o_orderkey"].iloc[0] if len(left) else right["l_orderkey"].iloc[0]
        micros = sum(
            int(Decimal(float(v)).quantize(q, rounding=ROUND_HALF_UP) * 1_000_000)
            for v in right["l_extendedprice"]
        )
        return pd.DataFrame(
            [
                {
                    "orderkey": key,
                    "n_orders": len(left),
                    "n_items": len(right),
                    "item_total": _micros_double(micros),
                }
            ]
        )

    return (
        orders.groupBy("o_orderkey")
        .cogroup(items.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "orderkey bigint, n_orders bigint, n_items bigint, item_total double",
        )
    )


@df_query(
    "side_output_route_counts",
    oracle="""
    SELECT 'errors' AS tag, COUNT(*) AS n FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT 'big_value', COUNT(*) FROM events WHERE value > 90
    UNION ALL
    SELECT 'rest', COUNT(*) FROM events
    WHERE NOT (event_type = 'error') AND NOT (value > 90)
    """,
)
def side_output_route_counts(spark, sf_dir):
    """OutputTag side outputs (ProcessFunction#Context.output): predicate
    routing over one scanned source; rows matching several tags land in
    each, non-matching rows in the default tag. Catalyst reuses the scan
    across the filtered passes."""
    from flink_parent_spark.streaming.side_outputs import route

    t = load_tables(spark, sf_dir)
    routed = route(
        t["events"],
        {
            "errors": F.col("event_type") == "error",
            "big_value": F.col("value") > 90,
        },
        default_tag="rest",
    )
    parts = [
        df.groupBy().agg(F.count("*").alias("n")).select(F.lit(tag).alias("tag"), "n")
        for tag, df in routed.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@df_query(
    "format_avro_roundtrip",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE user_id < 50
    """,
)
def format_avro_roundtrip(spark, sf_dir):
    """Avro format coverage (flink-formats/flink-avro parity): events ->
    Avro object container files (pure-Python OCF codec; the spark-avro
    module jar is absent in this container) -> distributed binaryFile +
    mapInPandas read-back. Values, nulls, and timestamp-micros must
    round-trip bit-exactly."""
    import shutil

    from flink_parent_spark.sources.avro_format import read_avro, write_avro

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 50).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = os.path.join(tempfile.gettempdir(), "fps_avro_roundtrip")
    shutil.rmtree(out, ignore_errors=True)
    write_avro(ev.repartition(4), out)
    return read_avro(spark, out)


@df_query(
    "format_debezium_json",
    oracle="""
    SELECT o_orderkey, o_totalprice AS price, '+I' AS op_kind
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice AS price, '-U' AS op_kind
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice * 1.1 AS price, '+U' AS op_kind
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice AS price, '-D' AS op_kind
    FROM orders WHERE o_orderstatus NOT IN ('F', 'O')
    """,
)
def format_debezium_json(spark, sf_dir):
    """debezium-json CDC format (flink-formats/flink-json
    DebeziumJsonDeserializationSchema.java:126-144): fabricate a Debezium
    message per order (F -> create, O -> update with a 10% price bump,
    else -> delete), parse through the format operator, and emit the
    RowKind-tagged relation. Round-trips doubles through JSON bit-exactly;
    the oracle derives the same relation directly — proving op->RowKind
    mapping and row multiplicity over the whole table. Pure codegen: one
    scan, to_json/from_json/explode, no shuffle until the gate's sort."""
    from flink_parent_spark.sources.changelog_formats import (
        debezium_json_to_changelog,
    )

    t = load_tables(spark, sf_dir)
    row = lambda price: F.to_json(  # noqa: E731
        F.struct(
            F.col("o_orderkey").alias("o_orderkey"), price.alias("price")
        )
    )
    msg = F.concat(
        F.lit('{"before": '),
        F.when(F.col("o_orderstatus") == "F", F.lit("null")).otherwise(
            row(F.col("o_totalprice"))
        ),
        F.lit(', "after": '),
        F.when(
            F.col("o_orderstatus") == "F", row(F.col("o_totalprice"))
        )
        .when(F.col("o_orderstatus") == "O", row(F.col("o_totalprice") * 1.1))
        .otherwise(F.lit("null")),
        F.lit(', "op": "'),
        F.when(F.col("o_orderstatus") == "F", F.lit("c"))
        .when(F.col("o_orderstatus") == "O", F.lit("u"))
        .otherwise(F.lit("d")),
        F.lit('"}'),
    )
    msgs = t["orders"].select(msg.alias("value"))
    tagged = debezium_json_to_changelog(
        msgs, "value", "o_orderkey BIGINT, price DOUBLE"
    )
    return tagged.select(
        "o_orderkey", "price", F.col("__rowkind").alias("op_kind")
    )


@df_query(
    "window_flat_aggregate_top2",
    oracle="""
    WITH ranked AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
             event_type, user_id, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
               ORDER BY value DESC, event_id) AS rn
      FROM events
    )
    SELECT w_start, w_end, event_type, user_id, event_id, value
    FROM ranked WHERE rn <= 2
    """,
)
def window_flat_aggregate_top2(spark, sf_dir):
    """WINDOWED flatAggregate (StreamExecGroupWindowTableAggregate.scala
    parity): a TableAggregateFunction emitting the top-2 rows per
    (tumbling hour, event_type) window group, through the Table API's
    window(Tumble...).group_by(w, key).flat_aggregate(...) surface —
    multi-row-per-window emission with the window bounds projected onto
    every emitted row."""
    from flink_parent_spark.api.table_env import (  # noqa: PLC0415
        Table,
        TableEnvironment,
        Tumble,
    )

    t = load_tables(spark, sf_dir)
    env = TableEnvironment(spark)
    tbl = Table(t["events"], env)

    def top2(key, pdf):
        return pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(2)[["user_id", "event_id", "value"]]

    out = (
        tbl.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "event_type")
        .flat_aggregate(
            top2, "user_id bigint, event_id bigint, value double"
        )
    )
    return out._df
