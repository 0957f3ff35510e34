"""Event-time windowing queries: TUMBLE / HOP / SESSION group windows,
interval join, temporal/as-of join — batch-mode checks of the streaming
window semantics (the assignments are identical; streaming adds watermarks).

Reference parity: blink window assigners + WindowOperator
(flink-table-runtime-blink/.../operators/window/), TimeIntervalJoin
(.../join/interval/), TemporalRowTimeJoinOperator (.../join/temporal/).

Oracles express the same window assignment arithmetically (epoch-aligned
buckets; session islands via gap-and-cumsum) — an independent formulation,
which is the point of the check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parent_spark.operators.joins import asof_join, interval_join
from flink_parent_spark.operators.rank import dedup_keep_last
from flink_parent_spark.operators.windows import flatten_window, hop, session, tumble
from flink_parent_spark.queries.registry import df_query, dsum, sql_query
from flink_parent_spark.tables import load_tables

# --- TUMBLE -----------------------------------------------------------------


@df_query(
    "window_tumble_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumble_hourly(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    g = tumble(t["events"], "ts", "1 hour", keys=["event_type"])
    agg = g.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )
    return flatten_window(agg).select("window_start", "window_end", "event_type", "n", "sum_value")


# --- HOP (sliding) ----------------------------------------------------------


@df_query(
    "window_hop_1h_slide_15m",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
             AS window_start,
           COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM events, (SELECT unnest(generate_series(0, 3)) AS j) offs
    WHERE ts < time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
               + INTERVAL '1' HOUR
    GROUP BY 1
    """,
)
def window_hop_1h_slide_15m(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    g = hop(t["events"], "ts", "1 hour", "15 minutes")
    agg = g.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )
    return flatten_window(agg).select("window_start", "n", "sum_value")


# --- SESSION (gap-merged) ---------------------------------------------------


@df_query(
    "window_session_30m_per_user",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30' MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30' MINUTE AS session_end,
           COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_30m_per_user(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    g = session(t["events"], "ts", "30 minutes", keys=["user_id"])
    agg = g.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )
    return flatten_window(agg, "session_start", "session_end").select(
        "user_id", "session_start", "session_end", "n", "sum_value"
    )


# --- Flink-SQL group-window dialect (TUMBLE/HOP/SESSION in GROUP BY) --------
# These run through TableEnvironment.sql_query, which rewrites the reference's
# FlinkSqlOperatorTable TUMBLE..SESSION block onto Spark's native
# window()/session_window() grouping — a Flink user's first streaming query
# works verbatim. Oracles recompute the assignment arithmetically in DuckDB.


def _flink_sql(sql: str):
    def run(spark, sf_dir):
        from flink_parent_spark.api.table_env import TableEnvironment

        load_tables(spark, sf_dir)
        return TableEnvironment.create(spark=spark).sql_query(sql).to_df()

    return run


@df_query(
    "sql_tumble_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
             - INTERVAL 1 MILLISECOND AS rowtime,
           event_type, COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def sql_tumble_hourly(spark, sf_dir):
    return _flink_sql(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,
               TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) AS rowtime,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """
    )(spark, sf_dir)


@df_query(
    "sql_hop_1h_15m",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
             AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
             + INTERVAL '1' HOUR AS window_end,
           COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM events, (SELECT unnest(generate_series(0, 3)) AS j) offs
    WHERE ts < time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
               + INTERVAL '1' HOUR
    GROUP BY 1, 2
    """,
)
def sql_hop_1h_15m(spark, sf_dir):
    return _flink_sql(
        """
        SELECT HOP_START(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)
                 AS window_start,
               HOP_END(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)
                 AS window_end,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)
        """
    )(spark, sf_dir)


@df_query(
    "sql_session_30m_user",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30' MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30' MINUTE AS session_end,
           COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sql_session_30m_user(spark, sf_dir):
    return _flink_sql(
        """
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTE) AS session_start,
               SESSION_END(ts, INTERVAL '30' MINUTE) AS session_end,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
        """
    )(spark, sf_dir)


# --- interval join (time-bounded stream-stream join, batch check) -----------


@df_query(
    "interval_join_view_then_purchase",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '10' MINUTE
    """,
)
def interval_join_view_then_purchase(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    views = t["events"].filter(F.col("event_type") == "view")
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    j = interval_join(
        views,
        purchases,
        keys=[("user_id", "user_id")],
        left_ts="ts",
        right_ts="ts",
        lower="'0' SECOND",
        upper="'10' MINUTE",
    )
    return j.select(
        F.col("event_id").alias("view_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("user_id"),
        F.col("value_r").alias("purchase_value"),
    )


# --- temporal / as-of join --------------------------------------------------


@df_query(
    "asof_join_purchase_last_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS view_event_id, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_join_purchase_last_view(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    views = t["events"].filter(F.col("event_type") == "view")
    j = asof_join(
        purchases,
        views,
        keys=[("user_id", "user_id")],
        left_ts="ts",
        right_ts="ts",
        right_payload={"view_event_id": "event_id", "view_value": "value"},
    )
    return j.select("event_id", "user_id", "ts", "view_event_id", "view_value")


# --- temporal sort (event-time ordered emit; RowTimeSortOperator parity) ----

sql_query(
    "temporal_sort_first_events",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts, event_id
    LIMIT 50
    """,
)


# --- evictors + count trigger (CountEvictor/TimeEvictor/DeltaEvictor,
#     CountTrigger early firing — flink-streaming-java windowing) -----------


@df_query(
    "evictor_count_window",
    oracle=f"""
    SELECT window_start, event_type, COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) b WHERE rn <= 5
    GROUP BY 1, 2
    """,
)
def evictor_count_window(spark, sf_dir):
    """CountEvictor(5): hourly tumble per event_type aggregates only the
    newest 5 buffer elements (CountEvictor.java evictBefore keeps the tail)."""
    from flink_parent_spark.operators.evictors import count_evict

    t = load_tables(spark, sf_dir)
    kept = count_evict(t["events"], "ts", "1 hour", 5, keys=["event_type"], tiebreak=["event_id"])
    # group by the struct window (not the extracted start) → exchange reuse
    return kept.groupBy("window", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    ).select(F.col("window.start").alias("window_start"), "event_type", "n", "sum_value")


@df_query(
    "evictor_time_window",
    oracle=f"""
    SELECT window_start, COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, value, ts,
             MAX(ts) OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts)) AS maxts
      FROM events
    ) b WHERE ts > maxts - INTERVAL '10 minutes'
    GROUP BY 1
    """,
)
def evictor_time_window(spark, sf_dir):
    """TimeEvictor(10 min): hourly tumble keeps only elements within 10
    minutes of the newest element in the window buffer."""
    from flink_parent_spark.operators.evictors import time_evict

    t = load_tables(spark, sf_dir)
    kept = time_evict(t["events"], "ts", "1 hour", "10 minutes")
    return kept.groupBy("window").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    ).select(F.col("window.start").alias("window_start"), "n", "sum_value")


@df_query(
    "evictor_delta_window",
    oracle=f"""
    SELECT window_start, event_type, COUNT(*) AS n, {dsum('value', 'sum_value')}
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, value,
             FIRST_VALUE(value) OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
                                      ORDER BY ts DESC, event_id DESC) AS lastv
      FROM events
    ) b WHERE ABS(value - lastv) <= 50.0
    GROUP BY 1, 2
    """,
)
def evictor_delta_window(spark, sf_dir):
    """DeltaEvictor(|v - v_last| > 50 evicts): hourly tumble per event_type
    keeps only elements within 50.0 of the buffer's newest value."""
    from flink_parent_spark.operators.evictors import delta_evict

    t = load_tables(spark, sf_dir)
    kept = delta_evict(
        t["events"], "ts", "1 hour", "value", 50.0, keys=["event_type"], tiebreak=["event_id"]
    )
    return kept.groupBy("window", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    ).select(F.col("window.start").alias("window_start"), "event_type", "n", "sum_value")


@df_query(
    "trigger_count_fires",
    oracle="""
    SELECT window_start, event_type, fire_seq, elements_seen,
           CAST(run_sum AS DOUBLE) AS fire_value
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             ROW_NUMBER() OVER w AS elements_seen,
             CAST(ROW_NUMBER() OVER w / 10 AS INT) AS fire_seq,
             SUM(CAST(value AS DECIMAL(30,6)))
               OVER (w ROWS UNBOUNDED PRECEDING) AS run_sum
      FROM events
      WINDOW w AS (PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
                   ORDER BY ts, event_id)
    ) b WHERE elements_seen % 10 = 0
    """,
)
def trigger_count_fires(spark, sf_dir):
    """CountTrigger(10) early-firing trace: one output row per firing with
    the running decimal-exact sum over the buffer prefix it covers."""
    from flink_parent_spark.operators.evictors import count_trigger_fires

    t = load_tables(spark, sf_dir)
    out = count_trigger_fires(
        t["events"], "ts", "1 hour", 10,
        F.sum(F.col("value").cast("decimal(30,6)")),
        keys=["event_type"], tiebreak=["event_id"],
    )
    return out.select(
        "window_start", "event_type", "fire_seq", "elements_seen",
        F.col("fire_value").cast("double").alias("fire_value"),
    )


@df_query(
    "window_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 3600 ELSE 900 END AS gap_s,
             epoch_us(ts) AS ts_us
      FROM events
    ), marked AS (
      SELECT *,
             CASE WHEN MAX(ts_us + CAST(gap_s AS BIGINT) * 1000000) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR ts_us >= MAX(ts_us + CAST(gap_s AS BIGINT) * 1000000) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS is_new
      FROM g
    ), sess AS (
      -- CAST: DuckDB SUM(INT) yields HUGEINT; Spark side is BIGINT
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS sid
      FROM marked
    )
    SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def window_session_dynamic_gap(spark, sf_dir):
    """Session windows with a per-element dynamic gap
    (SessionWindowAssigner + SessionWindows.withDynamicGap parity):
    each element opens a window [ts, ts + gap(element)); overlapping windows
    merge transitively. Expressed declaratively as a running-max merge scan
    — one shuffle by key, both window passes and the final aggregation reuse
    the same sort/exchange (no pandas, whole-stage codegen)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    gap_s = F.when(F.col("event_type") == "purchase", 3600).otherwise(900)
    g = t["events"].select(
        "user_id", "ts", "event_id", "value",
        gap_s.alias("gap_s"), F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_max_end = F.max(
        F.col("ts_us") + F.col("gap_s").cast("bigint") * F.lit(1_000_000).cast("bigint")
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = g.withColumn(
        "is_new",
        F.when(prev_max_end.isNull() | (F.col("ts_us") >= prev_max_end), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )


@df_query(
    "trigger_delta_fires",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
             ts, value,
             ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts),
                                             user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), scan AS (
      SELECT window_start, user_id, rn, value AS last_ref, FALSE AS fired,
             ts, value
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.window_start, o.user_id, o.rn,
             CASE WHEN ABS(o.value - s.last_ref) > 75.0
                  THEN o.value ELSE s.last_ref END,
             ABS(o.value - s.last_ref) > 75.0,
             o.ts, o.value
      FROM scan s
      JOIN ordered o ON o.window_start = s.window_start
                    AND o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT window_start, user_id, ts AS fire_ts, value AS fire_value,
           CAST(rn AS INT) AS elements_seen
    FROM scan WHERE fired
    """,
)
def trigger_delta_fires(spark, sf_dir):
    """DeltaTrigger(75) firing trace: within each (hour window, user)
    buffer, fire on every element that moves more than 75 away from the
    last reference point (first element saved silently — DeltaTrigger.java
    onElement semantics). Oracle replays the same sequential scan as a
    recursive CTE."""
    from flink_parent_spark.operators.evictors import delta_trigger_fires

    t = load_tables(spark, sf_dir)
    return delta_trigger_fires(
        t["events"], "ts", "1 hour", "value", 75.0,
        keys=["user_id"], tiebreak=["event_id"],
    )


@df_query(
    "trigger_continuous_event_time",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             CAST(FLOOR((epoch(ts) - epoch(time_bucket(INTERVAL '1 hour', ts)))
                        / 900) + 1 AS INT) AS bi,
             value
      FROM events
    ), perb AS (
      SELECT window_start, event_type, bi, COUNT(*) AS c,
             SUM(CAST(value AS DECIMAL(30,6))) AS s
      FROM assigned GROUP BY 1, 2, 3
    ), cum AS (
      -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark side is BIGINT
      SELECT window_start, event_type, bi,
             CAST(SUM(c) OVER w AS BIGINT) AS cn, SUM(s) OVER w AS cs
      FROM perb
      WINDOW w AS (PARTITION BY window_start, event_type ORDER BY bi
                   ROWS UNBOUNDED PRECEDING)
    ), grid AS (
      SELECT window_start, event_type, g.g AS bi
      FROM (SELECT window_start, event_type, MIN(bi) AS b0
            FROM perb GROUP BY 1, 2) f,
           LATERAL (SELECT unnest(generate_series(f.b0, 4)) AS g) g
    )
    SELECT g.window_start, g.event_type,
           g.window_start + g.bi * INTERVAL '900' SECOND AS fire_time,
           c.cn AS n_seen, CAST(c.cs AS DOUBLE) AS sum_seen
    FROM grid g
    JOIN cum c
      ON c.window_start = g.window_start AND c.event_type = g.event_type
     AND c.bi = (SELECT MAX(c2.bi) FROM cum c2
                 WHERE c2.window_start = g.window_start
                   AND c2.event_type = g.event_type AND c2.bi <= g.bi)
    """,
)
def trigger_continuous_event_time(spark, sf_dir):
    """ContinuousEventTimeTrigger(15 min) trace inside 1-hour windows keyed
    by event type: fires at every aligned 15-minute boundary from the first
    element's bucket to the window end, each firing covering the elements
    strictly before its boundary. The whole trace is declarative — bucket
    partial aggregates, a cumulative pass over the tiny bucket axis, and a
    grid as-of fill — one shuffle, no Python."""
    from flink_parent_spark.operators.evictors import (
        continuous_event_time_trigger_fires,
    )

    t = load_tables(spark, sf_dir)
    return continuous_event_time_trigger_fires(
        t["events"], "ts", "1 hour", 900, 3600, "value", keys=["event_type"]
    )


@df_query(
    "trigger_count_purging",
    oracle="""
    SELECT window_start, event_type, fire_seq, chunk_n,
           CAST(chunk_sum AS DOUBLE) AS fire_value
    FROM (
      SELECT window_start, event_type, fire_seq, COUNT(*) AS chunk_n,
             SUM(CAST(value AS DECIMAL(30,6))) AS chunk_sum
      FROM (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               value,
               CAST(CEIL(ROW_NUMBER() OVER
                 (PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
                  ORDER BY ts, event_id) / 10.0) AS INT) AS fire_seq
        FROM events) b
      GROUP BY 1, 2, 3) c
    WHERE chunk_n = 10
    """,
)
def trigger_count_purging(spark, sf_dir):
    """PurgingTrigger(CountTrigger(10)): each firing covers its own
    disjoint 10-element chunk (the buffer purges on fire); partial trailing
    chunks never fire."""
    from flink_parent_spark.operators.evictors import count_trigger_purging_fires

    t = load_tables(spark, sf_dir)
    return count_trigger_purging_fires(
        t["events"], "ts", "1 hour", 10, keys=["event_type"], tiebreak=["event_id"]
    )


@df_query(
    "sql_temporal_join_system_time",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS view_event_id, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def sql_temporal_join_system_time(spark, sf_dir):
    """Flink's SQL temporal-join syntax — `JOIN R FOR SYSTEM_TIME AS OF
    l.ts ON l.k = r.k` (LogicalCorrelateToJoinFromTemporalTableRule /
    TemporalRowTimeJoinOperator) — parsed by the TableEnvironment and
    lowered onto the asof_join verb; DuckDB's native ASOF JOIN is the
    oracle."""
    from flink_parent_spark.api.table_env import TableEnvironment

    t = load_tables(spark, sf_dir)
    t["events"].filter(F.col("event_type") == "purchase").createOrReplaceTempView(
        "systime_purchases"
    )
    t["events"].filter(F.col("event_type") == "view").createOrReplaceTempView(
        "systime_views"
    )
    env = TableEnvironment.create(spark=spark)
    return env.sql_query(
        """
        SELECT p.event_id, p.user_id, p.ts,
               v.event_id AS view_event_id, v.value AS view_value
        FROM systime_purchases p
        JOIN systime_views FOR SYSTEM_TIME AS OF p.ts v
          ON p.user_id = v.user_id
        """
    ).to_df()


@df_query(
    "table_api_tumble_fluent",
    oracle="""
    SELECT CAST(ws AS TIMESTAMP) AS w_start, event_type, n FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2) t
    """,
)
def table_api_tumble_fluent(spark, sf_dir):
    """Fluent Table-API group window (Table.window(Tumble...) — PyFlink
    window descriptors) under the oracle gate: equal to the SQL tumbling
    aggregation."""
    from flink_parent_spark.api.table_env import Table, TableEnvironment, Tumble

    t = load_tables(spark, sf_dir)
    env = TableEnvironment.create(spark=spark)
    tbl = Table(t["events"], env)
    return (
        tbl.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "event_type")
        .select("w.start", "event_type", "count(1) AS n")
        .to_df()
        .select(
            F.col("w_start"), F.col("event_type"), F.col("n")
        )
    )


@df_query(
    "window_hop_paned_1h_15m",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
             AS window_start,
           event_type, COUNT(*) AS n, {dsum('value', 'sum_value')},
           MAX(value) AS max_value
    FROM events, (SELECT unnest(generate_series(0, 3)) AS j) offs
    WHERE ts < time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15' MINUTE
               + INTERVAL '1' HOUR
    GROUP BY 1, 2
    """,
)
def window_hop_paned_1h_15m(spark, sf_dir):
    """Same HOP semantics as window_hop_1h_slide_15m, but planned with pane
    sharing (PanedWindowAssigner/HeapWindowsGrouping parity): rows aggregate
    once into 15-minute panes, pane partials fan out to the 4 covering
    windows — the shuffle carries pane partials, not 4x-replicated rows.
    The oracle is the naive per-row window assignment, so the value-exact
    match proves the shared plan computes the identical answer."""
    from flink_parent_spark.operators.windows import hop_paned_agg  # noqa: PLC0415

    t = load_tables(spark, sf_dir)
    return hop_paned_agg(
        t["events"], "ts", "1 hour", "15 minutes", keys=["event_type"],
        count_alias="n", sum_cols=[("value", "sum_value")],
        max_cols=[("value", "max_value")],
    ).select("window_start", "event_type", "n", "sum_value", "max_value")
