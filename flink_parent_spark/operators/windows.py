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
