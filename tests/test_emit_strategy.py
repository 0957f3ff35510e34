"""Group-window emit strategies (WindowEmitStrategy.scala parity): the
table.exec.emit.* surface — early-fire partial emission before the
watermark closes a window, late-fire re-emission within allowed lateness,
final-only emission by default — realized through Structured Streaming's
output modes (see flink_parent_spark/streaming/emit.py)."""

from __future__ import annotations

import datetime as dtm
import os
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from flink_parent_spark.streaming.emit import WindowEmitStrategy, tumble_agg_emit


def _t(s: str) -> dtm.datetime:
    return dtm.datetime.fromisoformat(s)


SCHEMA = "ts timestamp, user_id long, value double"


def _run(spark, batches, strategy, base_wm="0 seconds"):
    """Replay batches (one micro-batch per file) through a tumbling 1-hour
    count/sum aggregate under `strategy`; returns [(batch_id, pandas)]."""
    from tests.test_streaming_semantics import _write_batches

    d = _write_batches(spark, batches, SCHEMA)
    sdf = (
        spark.readStream.schema(SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    out, mode = tumble_agg_emit(
        sdf,
        "ts",
        "1 hour",
        ["user_id"],
        [F.count("*").alias("n"), F.sum("value").alias("sum_v")],
        strategy,
        base_watermark_delay=base_wm,
    )
    captured = []

    def sink(bdf, bid):
        pdf = bdf.toPandas()
        if len(pdf):
            captured.append((bid, pdf))

    ckpt = os.path.join(
        tempfile.gettempdir(), f"fps_ckpt_emit_{uuid.uuid4().hex[:8]}"
    )
    q = (
        out.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return captured


# --- validation parity (WindowEmitStrategy.checkValidation) ------------------


def test_validation_session_rejects_emit():
    with pytest.raises(ValueError, match="Session window"):
        WindowEmitStrategy(
            is_session_window=True, early_fire_enabled=True,
            early_fire_delay_ms=0,
        )


def test_validation_late_fire_requires_lateness():
    with pytest.raises(ValueError, match="allowed lateness"):
        WindowEmitStrategy(late_fire_enabled=True, late_fire_delay_ms=0)


def test_validation_negative_delay():
    with pytest.raises(ValueError, match="Early-fire delay"):
        WindowEmitStrategy(early_fire_enabled=True, early_fire_delay_ms=-1)


def test_produce_updates_matrix():
    # event time: early or late fire -> updates; proc time ignores late
    assert not WindowEmitStrategy().produce_updates
    assert WindowEmitStrategy(
        early_fire_enabled=True, early_fire_delay_ms=0
    ).produce_updates
    assert WindowEmitStrategy(
        late_fire_enabled=True, late_fire_delay_ms=0, allow_lateness_ms=1000
    ).produce_updates
    assert not WindowEmitStrategy(
        is_event_time=False,
        late_fire_enabled=True,
        late_fire_delay_ms=0,
        allow_lateness_ms=1000,
    ).produce_updates


def test_from_config_keys():
    s = WindowEmitStrategy.from_config(
        {
            "table.exec.emit.early-fire.enabled": "true",
            "table.exec.emit.early-fire.delay": "500 ms",
            "table.exec.emit.allow-lateness": "2 h",
        }
    )
    assert s.early_fire_enabled and s.early_fire_delay_ms == 500
    assert s.allow_lateness_ms == 2 * 3_600_000
    assert s.output_mode == "update"
    assert s.trigger_interval == "500 milliseconds"


# --- behavior ---------------------------------------------------------------


def test_early_fire_emits_partials_then_final(spark):
    """Early-fire: each micro-batch emits the window's CURRENT partial
    before the watermark closes it; the last emission is the final result
    (the reference's afterEndOfWindow.withEarlyFirings sequence)."""
    w0 = [  # three batches all inside the 10:00 window
        [(_t("2024-01-01 10:00:10"), 1, 1.0)],
        [(_t("2024-01-01 10:05:00"), 1, 2.0)],
        [(_t("2024-01-01 10:10:00"), 1, 3.0), (_t("2024-01-01 12:00:00"), 9, 0.0)],
    ]
    strat = WindowEmitStrategy(early_fire_enabled=True, early_fire_delay_ms=0)
    captured = _run(spark, w0, strat)
    u1 = [
        pdf[pdf.user_id == 1] for _, pdf in captured if (pdf.user_id == 1).any()
    ]
    seq = [(int(p.iloc[0]["n"]), float(p.iloc[0]["sum_v"])) for p in u1]
    # partials strictly grow, final = full window aggregate
    assert seq == [(1, 1.0), (2, 3.0), (3, 6.0)]


def test_default_emits_final_only_on_watermark(spark):
    """No emit strategy -> append mode: exactly ONE emission per window,
    after the watermark passes its end (afterEndOfWindow default)."""
    w0 = [
        [(_t("2024-01-01 10:00:10"), 1, 1.0)],
        [(_t("2024-01-01 10:05:00"), 1, 2.0)],
        [(_t("2024-01-01 12:00:00"), 9, 0.0)],  # advancer closes the window
    ]
    captured = _run(spark, w0, WindowEmitStrategy())
    rows = [
        (int(r["n"]), float(r["sum_v"]))
        for _, pdf in captured
        for _, r in pdf[pdf.user_id == 1].iterrows()
    ]
    assert rows == [(2, 3.0)]  # one final emission only
    # and it appears only after the advancer batch moved the watermark
    first_emit_bid = min(
        bid for bid, pdf in captured if (pdf.user_id == 1).any()
    )
    assert first_emit_bid >= 2


def test_late_fire_within_allowed_lateness(spark):
    """Late-fire: a row arriving after the watermark passed the window end
    but within allowed lateness re-fires the corrected result; without
    lateness the same row is dropped."""
    batches = [
        [(_t("2024-01-01 10:00:10"), 1, 1.0)],
        [(_t("2024-01-01 11:30:00"), 9, 0.0)],  # watermark past 11:00
        [(_t("2024-01-01 10:20:00"), 1, 5.0)],  # late for the 10:00 window
        [(_t("2024-01-01 14:00:00"), 9, 0.0)],  # final advancer
    ]
    late = WindowEmitStrategy(
        early_fire_enabled=True,
        early_fire_delay_ms=0,
        late_fire_enabled=True,
        late_fire_delay_ms=0,
        allow_lateness_ms=2 * 3_600_000,
    )
    captured = _run(spark, batches, late)
    seq = [
        (int(p.iloc[0]["n"]), float(p.iloc[0]["sum_v"]))
        for _, p in [
            (bid, pdf[pdf.user_id == 1])
            for bid, pdf in captured
        ]
        if len(p)
    ]
    # on-time partial, then the LATE re-fire with the corrected aggregate
    assert seq == [(1, 1.0), (2, 6.0)]

    # without lateness the late row is dropped — deterministically once
    # its window state has been evicted. Spark evicts one micro-batch
    # after the watermark passes the window (the reference drops at
    # arrival — divergence window documented in streaming/emit.py), so
    # the control inserts a second advancer batch between the close and
    # the late row.
    batches_evicted = [
        [(_t("2024-01-01 10:00:10"), 1, 1.0)],
        [(_t("2024-01-01 11:30:00"), 9, 0.0)],  # watermark past 11:00
        [(_t("2024-01-01 11:40:00"), 9, 0.0)],  # eviction happens here
        [(_t("2024-01-01 10:20:00"), 1, 5.0)],  # too late: dropped
        [(_t("2024-01-01 14:00:00"), 9, 0.0)],
    ]
    no_late = WindowEmitStrategy(early_fire_enabled=True, early_fire_delay_ms=0)
    captured2 = _run(spark, batches_evicted, no_late)
    seq2 = [
        (int(p.iloc[0]["n"]), float(p.iloc[0]["sum_v"]))
        for _, p in [
            (bid, pdf[pdf.user_id == 1])
            for bid, pdf in captured2
        ]
        if len(p)
    ]
    assert seq2 == [(1, 1.0)]


def test_table_env_emit_config_and_hop(spark):
    """TableEnvironment.window_emit_strategy reads the table.exec.emit.*
    config keys; the emit operator also covers HOP windows (the reference
    applies the same strategy to sliding group windows)."""
    from pyspark.sql import functions as F

    from flink_parent_spark.api.table_env import TableEnvironment

    env = TableEnvironment(spark)
    env.get_config()["table.exec.emit.early-fire.enabled"] = "true"
    env.get_config()["table.exec.emit.early-fire.delay"] = "0 ms"
    strat = env.window_emit_strategy()
    assert strat.early_fire_enabled and strat.output_mode == "update"

    w0 = [
        [(_t("2024-01-01 10:00:10"), 1, 1.0)],
        [(_t("2024-01-01 10:20:00"), 1, 2.0),
         (_t("2024-01-01 12:00:00"), 9, 0.0)],
    ]
    from tests.test_streaming_semantics import _write_batches

    d = _write_batches(spark, w0, SCHEMA)
    sdf = (
        spark.readStream.schema(SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    out, mode = tumble_agg_emit(
        sdf, "ts", "1 hour", ["user_id"],
        [F.count("*").alias("n")], strat, slide="30 minutes",
    )
    assert mode == "update"
    captured = []

    def sink(bdf, bid):
        pdf = bdf.toPandas()
        if len(pdf):
            captured.append(pdf)

    ckpt = os.path.join(
        tempfile.gettempdir(), f"fps_ckpt_emit_hop_{uuid.uuid4().hex[:8]}"
    )
    q = (
        out.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = [
        (int(r["n"]),)
        for pdf in captured
        for _, r in pdf[pdf.user_id == 1].iterrows()
    ]
    # hop 1h/30m: row 1 lands in 2 windows (partials n=1), row 2 joins the
    # 10:00 window (n=2) and a new 10:30-less... the partial sequence must
    # contain both a first-batch partial and an updated second-batch value
    assert (1,) in rows and (2,) in rows


def test_duration_parsing_long_forms():
    """ADVICE r13: long-form and day units Flink's TimeUtils accepts must
    parse ('2 hours', '1 d', '1 day'), compound CalendarInterval strings
    too ('1 hour 30 minutes'), and unknown units raise a descriptive
    error naming the key/value instead of a bare int()/KeyError."""
    from flink_parent_spark.streaming.emit import duration_ms

    assert duration_ms("2 hours") == 7_200_000
    assert duration_ms("1 d") == 86_400_000
    assert duration_ms("1 day") == 86_400_000
    assert duration_ms("500ms") == 500
    assert duration_ms("3 min") == 180_000
    assert duration_ms("1 hour 30 minutes") == 5_400_000
    assert duration_ms("250") == 250  # bare number = ms (TimeUtils default)
    with pytest.raises(ValueError, match="my.key.*fortnight"):
        duration_ms("1 fortnight", key="my.key")
    with pytest.raises(ValueError, match="empty"):
        duration_ms("   ")

    s = WindowEmitStrategy.from_config(
        {
            "table.exec.emit.early-fire.enabled": "true",
            "table.exec.emit.early-fire.delay": "2 hours",
            "table.exec.emit.allow-lateness": "1 day",
        }
    )
    assert s.early_fire_delay_ms == 7_200_000
    assert s.allow_lateness_ms == 86_400_000
    # watermark_delay accepts day / compound base delays
    assert s.watermark_delay("1 day") == f"{2 * 86_400_000} milliseconds"
    assert (
        s.watermark_delay("1 hour 30 minutes")
        == f"{5_400_000 + 86_400_000} milliseconds"
    )
