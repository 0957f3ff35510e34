"""Group-window operators: TUMBLE / HOP / SESSION (batch + streaming-capable).

Reference semantics: blink window assigners
(flink-table-runtime-blink/.../operators/window/ — TumblingWindowAssigner,
SlidingWindowAssigner, SessionWindowAssigner; runtime WindowOperator.java) and
the SQL TUMBLE()/HOP()/SESSION() group-window functions
(FlinkSqlOperatorTable.java TUMBLE..SESSION_PROCTIME block).

Spark-first mapping: `F.window(ts, size, slide)` and `F.session_window(ts,
gap)` express the identical assignment (epoch-aligned windows; session end =
last element + gap). These work in both batch and Structured Streaming, so
the same operator serves both modes — the streaming layer only adds
`withWatermark` before calling these.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, GroupedData, functions as F


def _window_cols(df: DataFrame, win: Column, keys: Sequence[str]) -> GroupedData:
    return df.groupBy(win, *keys)


def tumble(df: DataFrame, ts_col: str, size: str, keys: Sequence[str] = ()) -> GroupedData:
    """TUMBLE(ts, INTERVAL size): non-overlapping epoch-aligned windows."""
    return _window_cols(df, F.window(ts_col, size), keys)


def hop(df: DataFrame, ts_col: str, size: str, slide: str, keys: Sequence[str] = ()) -> GroupedData:
    """HOP(ts, slide, size): overlapping sliding windows; each row lands in
    size/slide windows."""
    return _window_cols(df, F.window(ts_col, size, slide), keys)


def session(df: DataFrame, ts_col: str, gap: str, keys: Sequence[str] = ()) -> GroupedData:
    """SESSION(ts, gap): merge rows closer than `gap` per key; window end is
    last event + gap (matches SessionWindowAssigner semantics)."""
    return _window_cols(df, F.session_window(ts_col, gap), keys)


def flatten_window(df: DataFrame, start_alias: str = "window_start", end_alias: str = "window_end") -> DataFrame:
    """Expand the struct window column (named `window` or `session_window`)
    into start/end columns (the TUMBLE_START/TUMBLE_END auxiliaries of the
    reference dialect)."""
    name = "session_window" if "session_window" in df.columns else "window"
    return (
        df.withColumn(start_alias, F.col(f"{name}.start"))
        .withColumn(end_alias, F.col(f"{name}.end"))
        .drop(name)
    )


# --- pane-based sliding-window sharing --------------------------------------

_UNIT_S = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _dur_s(dur: str) -> int:
    n, unit = dur.strip().split()
    return int(n) * _UNIT_S[unit.lower()]


def hop_paned_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str] = (),
    count_alias: str | None = None,
    sum_cols: Sequence[tuple[str, str]] = (),
    min_cols: Sequence[tuple[str, str]] = (),
    max_cols: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """HOP aggregation with pane sharing (PanedWindowAssigner.java +
    HeapWindowsGrouping.java parity): rows are aggregated ONCE into
    non-overlapping panes of gcd(size, slide), and each pane's partial is
    then fanned out to the size/slide sliding windows that cover it and
    combined. The naive plan replicates every ROW into size/slide windows
    before aggregating; this plan replicates only the (tiny) pane PARTIALS
    — at 100 TB with a 1h/5min hop that is a 12x cut in shuffled rows, the
    exact sharing the reference's pane optimization buys.

    Supported aggregates are the decomposable ones the reference shares
    across panes: COUNT, SUM, MIN, MAX (AVG = SUM/COUNT downstream). SUMs
    accumulate in DECIMAL(30,6) per the engine's exactness contract, so
    pane-then-window summation is bit-identical to direct summation.

    Returns columns: window_start, *keys, *aliases.
    """
    import math  # noqa: PLC0415

    size_s, slide_s = _dur_s(size), _dur_s(slide)
    pane_s = math.gcd(size_s, slide_s)

    partials = []
    if count_alias:
        partials.append(F.count(F.lit(1)).alias(f"__c_{count_alias}"))
    for col, alias in sum_cols:
        partials.append(
            F.sum(F.col(col).cast("decimal(30,6)")).alias(f"__s_{alias}")
        )
    for col, alias in min_cols:
        partials.append(F.min(col).alias(f"__mn_{alias}"))
    for col, alias in max_cols:
        partials.append(F.max(col).alias(f"__mx_{alias}"))

    pane = df.groupBy(F.window(ts_col, f"{pane_s} seconds"), *keys).agg(*partials)
    pane = pane.withColumn("__pane_s", F.unix_timestamp("window.start")).drop("window")

    # fan the pane partial out to every slide-aligned window covering it:
    # w = latest slide multiple <= pane_start, minus j*slide while the
    # window still overlaps the pane
    base = F.floor(F.col("__pane_s") / slide_s) * slide_s
    exploded = (
        pane.withColumn("__j", F.explode(F.sequence(F.lit(0), F.lit(size_s // slide_s))))
        .withColumn("__w_s", base - F.col("__j") * slide_s)
        .filter(
            (F.col("__w_s") <= F.col("__pane_s"))
            & (F.col("__w_s") + size_s > F.col("__pane_s"))
        )
    )

    finals = []
    if count_alias:
        finals.append(F.sum(f"__c_{count_alias}").alias(count_alias))
    for _, alias in sum_cols:
        finals.append(
            F.sum(F.col(f"__s_{alias}").cast("decimal(30,6)"))
            .cast("double")
            .alias(alias)
        )
    for _, alias in min_cols:
        finals.append(F.min(f"__mn_{alias}").alias(alias))
    for _, alias in max_cols:
        finals.append(F.max(f"__mx_{alias}").alias(alias))

    return (
        exploded.groupBy(F.col("__w_s"), *keys)
        .agg(*finals)
        .withColumn("window_start", F.timestamp_seconds(F.col("__w_s")))
        .drop("__w_s")
        .select("window_start", *keys, *[c for c in
                ([count_alias] if count_alias else [])
                + [a for _, a in sum_cols]
                + [a for _, a in min_cols]
                + [a for _, a in max_cols]])
    )
