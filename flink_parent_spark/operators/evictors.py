"""Window evictors and count-trigger firing — DataFrame-native.

Reference semantics (algorithms re-expressed, no code reuse):
- CountEvictor.java (flink-streaming-java/.../windowing/evictors/): before
  the window function runs, keep only the last `n` elements of the window
  buffer (eviction order = arrival; with event-time replay that is ts order).
- TimeEvictor.java: keep only elements younger than `max(ts) - keep` within
  the window buffer.
- DeltaEvictor.java: evict elements whose delta(value, last_element) exceeds
  a threshold; "last element" is the newest element in the buffer.
- CountTrigger.java + ContinuousEventTimeTrigger.java (.../triggers/): fire
  the window every `n` elements / every interval, emitting the aggregate
  over the buffer accumulated so far (early firing).

Spark-first design: Flink implements these imperatively over a per-window
state buffer. At rest, the same semantics are a *declarative* two-phase
plan — (1) assign the window, (2) rank/filter rows within (window, key) via
an OVER window, (3) aggregate survivors. Everything stays in whole-stage
codegen; the only shuffle is the one the windowed aggregation needs anyway
(rank + agg share the same (key, window) hash partitioning, so Catalyst
reuses a single exchange — no second shuffle).

At 100 TB: eviction-before-aggregation prunes rows *before* the final agg,
and because the rank filter is applied per-partition after one shuffle, no
buffer ever materializes beyond a partition — unlike a naive collect_list
formulation which would OOM on skewed windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _assigned(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    return df.withColumn("__win", F.window(ts_col, size))


def _win_spec(keys: Sequence[str]):
    return Window.partitionBy("__win", *keys)


def _finish(df: DataFrame) -> DataFrame:
    """Expose start/end, but ALSO keep the struct window column (renamed
    `window`): a downstream groupBy("window", keys) then matches the rank
    stage's hash partitioning exactly, so Catalyst reuses one exchange
    instead of re-shuffling on the extracted start field."""
    return (
        df.withColumn("window_start", F.col("__win.start"))
        .withColumn("window_end", F.col("__win.end"))
        .withColumnRenamed("__win", "window")
    )


def count_evict(
    df: DataFrame,
    ts_col: str,
    size: str,
    n: int,
    keys: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Tumbling window buffer reduced to its last `n` elements by event time
    (CountEvictor.evictBefore keeps the buffer tail). Returns the surviving
    rows with `window_start`/`window_end` attached; aggregate downstream."""
    w = _win_spec(keys).orderBy(F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak])
    out = (
        _assigned(df, ts_col, size)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return _finish(out)


def time_evict(
    df: DataFrame,
    ts_col: str,
    size: str,
    keep: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Keep only elements within `keep` (an INTERVAL string, e.g. '10 minutes')
    of the newest element in each window buffer (TimeEvictor semantics:
    evict everything older than max(ts) - keep)."""
    w = _win_spec(keys)
    out = (
        _assigned(df, ts_col, size)
        .withColumn("__maxts", F.max(ts_col).over(w))
        .filter(F.col(ts_col) > F.col("__maxts") - F.expr(f"INTERVAL {keep}"))
        .drop("__maxts")
    )
    return _finish(out)


def delta_evict(
    df: DataFrame,
    ts_col: str,
    size: str,
    value_col: str,
    threshold: float,
    keys: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """DeltaEvictor with the absolute-difference delta function: evict rows
    whose |value - value(last element)| > threshold, where the last element
    is the newest row (by ts, then tiebreak) in the window buffer."""
    w = _win_spec(keys).orderBy(F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak])
    out = (
        _assigned(df, ts_col, size)
        .withColumn("__lastv", F.first(value_col).over(w))
        .filter(F.abs(F.col(value_col) - F.col("__lastv")) <= F.lit(threshold))
        .drop("__lastv")
    )
    return _finish(out)


def count_trigger_fires(
    df: DataFrame,
    ts_col: str,
    size: str,
    n: int,
    agg_value: Column,
    keys: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """CountTrigger(n) early-firing trace: for each window buffer, emit one
    row per firing — at every n-th element (by event time) — carrying the
    aggregate over the elements seen so far (fire #k covers the first k*n
    elements). This is the materialized history of what Flink's
    WindowOperator emits under a non-purging CountTrigger.

    `agg_value` is an aggregate Column (e.g. F.sum(...)); it is evaluated
    with a ROWS UNBOUNDED PRECEDING frame so each firing sees exactly its
    prefix of the buffer. Cast/rename `fire_value` downstream if needed.
    """
    w = _win_spec(keys).orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak])
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        _assigned(df, ts_col, size)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("fire_value", agg_value.over(frame))
        .filter(F.col("__rn") % n == 0)
        .withColumn("fire_seq", (F.col("__rn") / n).cast("int"))
        .withColumn("elements_seen", F.col("__rn"))
        .drop("__rn")
    )
    return out.select(
        F.col("__win.start").alias("window_start"),
        F.col("__win.end").alias("window_end"),
        *keys,
        "fire_seq",
        "elements_seen",
        "fire_value",
    )


def delta_trigger_fires(
    df: DataFrame,
    ts_col: str,
    size: str,
    value_col: str,
    threshold: float,
    keys: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """DeltaTrigger(threshold) firing trace (DeltaTrigger.java semantics,
    re-derived): per window buffer, scanning elements in event-time order,
    the trigger saves the first element without firing and then fires on
    every element whose |value - value(last fired-or-saved element)| exceeds
    the threshold, saving it as the new reference point.

    The reference point depends on the previous FIRE (not the previous
    row), so this is a genuine per-window sequential scan — Flink runs the
    same loop against its trigger state.

    Execution shape: (window, key) groups are near-singletons (hour
    windows x fine-grained keys), and applyInPandas pays milliseconds of
    pandas overhead PER GROUP — a naive per-group deployment spends ~6 ms
    x groups on fixed cost. Instead groups hash into
    spark.sql.shuffle.partitions buckets (complete groups per bucket) and
    ONE numpy scan per bucket walks all its groups with boundary
    detection; per-bucket memory is total/buckets, the same sizing
    discipline as any shuffle at scale. Output: one row per firing
    (window_start, keys..., fire_ts, fire_value, elements_seen)."""
    import pandas as pd

    assigned = _assigned(df, ts_col, size).withColumn(
        "__ws", F.col("__win.start")
    )
    n_buckets = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    assigned = assigned.withColumn(
        "__bkt", F.pmod(F.hash("__ws", *keys), F.lit(n_buckets))
    )
    dt = dict(df.dtypes)
    key_schema = "".join(f", `{k}` {dt[k]}" for k in keys)
    out_schema = (
        "`window_start` timestamp"
        + key_schema
        + f", `fire_ts` {dt[ts_col]}, `fire_value` {dt[value_col]}"
        + ", `elements_seen` int"
    )
    out_cols = ["window_start", *keys, "fire_ts", "fire_value", "elements_seen"]
    group_cols = ["__ws", *keys]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*group_cols, ts_col, *tiebreak],
                              kind="mergesort")
        cols = [pdf[c].to_numpy() for c in group_cols]
        vals = pdf[value_col].to_numpy()
        ts = pdf[ts_col].to_numpy()
        recs = []
        prev_group = None
        last = 0.0
        seen = 0
        for i in range(len(pdf)):
            grp = tuple(c[i] for c in cols)
            if grp != prev_group:
                prev_group = grp
                last = vals[i]
                seen = 1
                continue
            seen += 1
            if abs(vals[i] - last) > threshold:
                last = vals[i]
                recs.append((*grp, ts[i], vals[i], seen))
        return pd.DataFrame(recs, columns=out_cols)

    return assigned.groupBy("__bkt").applyInPandas(scan, out_schema)


def continuous_event_time_trigger_fires(
    df: DataFrame,
    ts_col: str,
    size: str,
    interval_seconds: int,
    size_seconds: int,
    value_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """ContinuousEventTimeTrigger(interval) firing trace
    (ContinuousEventTimeTrigger.java semantics, re-derived): within each
    window, the first element registers an event-time timer at the next
    aligned interval boundary; every firing re-registers the next one, so
    the window fires at EVERY boundary from the first element's bucket to
    the window end — each firing carrying the aggregate over elements
    strictly before its boundary (plus the final full-window firing at the
    end boundary).

    Declarative plan: bucket elements by boundary index, partial-aggregate
    per (window, key, bucket), cumulative over the tiny bucket axis, then
    fill the firing grid with a LAST_VALUE-ignore-nulls as-of over the
    union of buckets and grid markers — one shuffle on (window, key), no
    Python. Output: (window_start, keys..., fire_time, n_seen, sum_seen)."""
    n_buckets = size_seconds // interval_seconds
    assigned = _assigned(df, ts_col, size).select(
        F.col("__win.start").alias("window_start"),
        *keys,
        (
            F.floor(
                (F.col(ts_col).cast("long") - F.col("__win.start").cast("long"))
                / interval_seconds
            )
            + 1
        ).cast("int").alias("bi"),
        F.col(value_col).alias("__v"),
    )
    perb = assigned.groupBy("window_start", *keys, "bi").agg(
        F.count("*").alias("c"),
        F.sum(F.col("__v").cast("decimal(30,6)")).alias("s"),
    )
    w = Window.partitionBy("window_start", *keys).orderBy("bi")
    cum = perb.select(
        "window_start",
        *keys,
        "bi",
        F.lit(0).alias("is_grid"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cn"),
        F.sum("s").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
    )
    grid = (
        perb.groupBy("window_start", *keys)
        .agg(F.min("bi").alias("b0"))
        .select(
            "window_start",
            *keys,
            F.explode(
                F.sequence(F.col("b0"), F.lit(int(n_buckets)))
            ).alias("bi"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("bigint").alias("cn"),
            F.lit(None).cast("decimal(30,6)").alias("cs"),
        )
    )
    both = cum.unionByName(grid)
    # the firing at boundary index g (time start + g*interval) covers
    # elements strictly before that time = buckets bi <= g: order each
    # grid marker AFTER the bucket row of the same index and carry the
    # last known cumulative forward
    w2 = (
        Window.partitionBy("window_start", *keys)
        .orderBy("bi", "is_grid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = both.select(
        "window_start",
        *keys,
        "bi",
        "is_grid",
        F.last("cn", ignorenulls=True).over(w2).alias("n_seen"),
        F.last("cs", ignorenulls=True).over(w2).alias("sum_seen"),
    )
    return (
        filled.filter((F.col("is_grid") == 1) & F.col("n_seen").isNotNull())
        .select(
            "window_start",
            *keys,
            (
                F.col("window_start").cast("long") + F.col("bi") * interval_seconds
            ).cast("timestamp").alias("fire_time"),
            "n_seen",
            F.col("sum_seen").cast("double").alias("sum_seen"),
        )
    )


def count_trigger_purging_fires(
    df: DataFrame,
    ts_col: str,
    size: str,
    n: int,
    keys: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """PurgingTrigger(CountTrigger(n)) trace (PurgingTrigger.java wraps a
    trigger, turning FIRE into FIRE_AND_PURGE): the window buffer clears on
    every firing, so fire #k covers ONLY elements (k-1)*n+1 .. k*n — the
    disjoint-chunk counterpart of the accumulating count_trigger_fires.
    Trailing elements short of n never fire (the purge leaves them waiting).
    Declarative: chunk id = ceil(row_number/n); aggregate full chunks."""
    w = _win_spec(keys).orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak])
    chunked = (
        _assigned(df, ts_col, size)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("fire_seq", F.ceil(F.col("__rn") / n).cast("int"))
    )
    agg = chunked.groupBy(F.col("__win").alias("window"), *keys, "fire_seq").agg(
        F.count("*").alias("chunk_n"),
        F.sum(F.col(value_col).cast("decimal(30,6)"))
        .cast("double")
        .alias("fire_value"),
    )
    return (
        agg.filter(F.col("chunk_n") == n)  # only full chunks fired
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "fire_seq",
            "chunk_n",
            "fire_value",
        )
    )
