"""Side outputs (OutputTag / ProcessFunction#Context.output parity).

Flink routes one stream into tagged side streams inside a single operator;
Spark has no multi-output operator, so the idiomatic mapping is predicate
routing — one filtered pass per tag over the SAME cached/scanned source
(Catalyst reuses the exchange/scan), or a single `foreachBatch` that splits
and writes each tag (exactly one pass, for sinks).

`route` returns {tag: DataFrame}; rows matching several predicates go to
every matching tag; `default_tag` (if given) collects rows matching none —
the main-output + late-data-side-output shape of WindowedStream
.sideOutputLateData (WindowedStream.java:178)."""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def route(
    df: DataFrame,
    tags: Mapping[str, Column],
    default_tag: str | None = None,
) -> dict[str, DataFrame]:
    out = {tag: df.filter(pred) for tag, pred in tags.items()}
    if default_tag is not None:
        none_match = None
        for pred in tags.values():
            none_match = ~pred if none_match is None else none_match & ~pred
        out[default_tag] = df.filter(none_match)
    return out


def split_late_data(
    df: DataFrame, ts_col: str, watermark_ts, tag: str = "late"
) -> dict[str, DataFrame]:
    """allowedLateness side-output shape: rows at/after the watermark go to
    'main', older rows to the late tag."""
    pred = F.col(ts_col) >= F.lit(watermark_ts)
    return {"main": df.filter(pred), tag: df.filter(~pred)}
