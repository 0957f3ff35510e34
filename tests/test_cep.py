"""CEP matcher semantics tests with hand-fed sequences — mirrors the
reference's flink-cep harness tests (NFAITCase-style): quantifiers,
contiguity, within-windows, and after-match skip strategies."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern, cep_pattern

T0 = dt.datetime(2024, 1, 1)


def rows(*types, gap_s: int = 10):
    return [
        {"k": 1, "id": i, "ts": T0 + dt.timedelta(seconds=i * gap_s), "t": t}
        for i, t in enumerate(types)
    ]


def names(match):
    return [(stage, idx) for stage, idx in match]


def test_strict_next():
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").next("b").where(lambda r: r["t"] == "B")
    rs = rows("A", "B", "A", "C", "B")
    ms = pat.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("b", 1)]]  # A@2 has C next


def test_followed_by_relaxed():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    rs = rows("A", "C", "C", "B")
    ms = pat.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("b", 3)]]


def test_times_exact():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A").times(2)
        .next("b").where(lambda r: r["t"] == "B")
    )
    rs = rows("A", "A", "B")
    ms = pat.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("a", 1), ("b", 2)]]
    assert pat.find_matches(rows("A", "B"), "ts") == []


def test_one_or_more_greedy_vs_reluctant():
    greedy = (
        Pattern.begin("a").where(lambda r: r["t"] == "A").one_or_more().greedy()
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    rs = rows("A", "A", "A", "B")
    ms = greedy.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("a", 1), ("a", 2), ("b", 3)]]

    reluctant = (
        Pattern.begin("a").where(lambda r: r["t"] == "A").one_or_more()
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    ms2 = reluctant.find_matches(rs, "ts", AfterMatchSkip.SKIP_PAST_LAST)
    # reluctant takes the minimal repetition: a@0 then first B
    assert names(ms2[0])[0] == ("a", 0)
    assert names(ms2[0])[-1] == ("b", 3)


def test_optional():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .next("x").where(lambda r: r["t"] == "X").optional()
        .next("b").where(lambda r: r["t"] == "B")
    )
    assert [names(m) for m in pat.find_matches(rows("A", "X", "B"), "ts")] == [
        [("a", 0), ("x", 1), ("b", 2)]
    ]
    assert [names(m) for m in pat.find_matches(rows("A", "B"), "ts")] == [
        [("a", 0), ("b", 1)]
    ]


def test_within_window():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
        .within(dt.timedelta(seconds=15))
    )
    # B arrives 30s after A -> outside window
    assert pat.find_matches(rows("A", "C", "C", "B"), "ts") == []
    # B at 10s -> inside
    assert len(pat.find_matches(rows("A", "B"), "ts")) == 1


def test_skip_strategies():
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").next("b").where(
        lambda r: r["t"] == "A"
    )
    rs = rows("A", "A", "A")
    past = pat.find_matches(rs, "ts", AfterMatchSkip.SKIP_PAST_LAST)
    assert [names(m) for m in past] == [[("a", 0), ("b", 1)]]  # A@2 alone can't pair
    nosk = pat.find_matches(rs, "ts", AfterMatchSkip.NO_SKIP)
    assert [names(m) for m in nosk] == [
        [("a", 0), ("b", 1)],
        [("a", 1), ("b", 2)],
    ]


def test_or_where():
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").or_where(
        lambda r: r["t"] == "B"
    )
    assert len(pat.find_matches(rows("A", "B", "C"), "ts", AfterMatchSkip.NO_SKIP)) == 2


def test_cep_operator_on_spark(spark):
    pdf = pd.DataFrame(rows("A", "B", "A", "B", "C"))
    df = spark.createDataFrame(pdf)
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").next("b").where(
        lambda r: r["t"] == "B"
    )
    out = cep_pattern(df, pat, ["k"], "ts", "id").orderBy("match_id", "seq").collect()
    assert [(r["match_id"], r["stage"], r["id"]) for r in out] == [
        (0, "a", 0), (0, "b", 1), (1, "a", 2), (1, "b", 3),
    ]


def vrows(*vals, gap_s: int = 10):
    return [
        {"k": 1, "id": i, "ts": T0 + dt.timedelta(seconds=i * gap_s), "v": float(v)}
        for i, v in enumerate(vals)
    ]


def test_prev_navigation_strict_rise():
    # B AS B.v > PREV(B.v): strict pair where the second value rises
    pat = (
        Pattern.begin("a")
        .next("b")
        .where(lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v"))
    )
    ms = pat.find_matches(vrows(3, 5, 4, 6, 2), "ts")
    assert [names(m) for m in ms] == [
        [("a", 0), ("b", 1)],  # 3<5
        [("a", 2), ("b", 3)],  # 4<6
    ]


def test_prev_null_at_partition_start():
    # a single-stage pattern whose condition references PREV: first row has
    # no PREV -> condition false (SQL three-valued logic)
    pat = Pattern.begin("up").where(
        lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v")
    )
    ms = pat.find_matches(vrows(1, 2, 3), "ts", AfterMatchSkip.NO_SKIP)
    assert [m[0][1] for m in ms] == [1, 2]  # row 0 can't match


def test_last_stage_navigation():
    # C AS C.v > LAST(B.v) + FIRST(A.v): stage navigation across the match
    pat = (
        Pattern.begin("a")
        .next("b")
        .where(lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v"))
        .next("c")
        .where(lambda r, c: r["v"] > c.last("b", "v") and r["v"] > c.first("a", "v"))
    )
    ms = pat.find_matches(vrows(1, 3, 5, 1, 2, 0), "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("b", 1), ("c", 2)]]


def test_prev_within_quantified_run():
    # DOWN+ AS v < PREV(v): greedy maximal descending run, then UP
    pat = (
        Pattern.begin("strt")
        .next("down")
        .where(lambda r, c: c.prev("v") is not None and r["v"] < c.prev("v"))
        .one_or_more()
        .greedy()
        .next("up")
        .where(lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v"))
    )
    ms = pat.find_matches(vrows(9, 7, 4, 3, 8, 10), "ts")
    assert [names(m) for m in ms] == [
        [("strt", 0), ("down", 1), ("down", 2), ("down", 3), ("up", 4)]
    ]


def test_next_navigation():
    # lookahead: A rows whose NEXT value doubles them
    pat = Pattern.begin("a").where(
        lambda r, c: c.next("v") is not None and c.next("v") >= 2 * r["v"]
    )
    ms = pat.find_matches(vrows(2, 5, 1, 3), "ts", AfterMatchSkip.NO_SKIP)
    assert [m[0][1] for m in ms] == [0, 2]


# --- watermark-held streaming CEP (CepOperator watermark semantics) ---------


def test_match_from2_pending_frontier():
    """Matcher-level frontier awareness: a failed attempt is `pending` iff
    future (post-watermark) rows could still complete it."""
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").next("b").where(
        lambda r: r["t"] == "B"
    )
    rs = rows("A")
    wm = rs[0]["ts"]  # watermark at the A row: B may still arrive
    m, pend = pat._match_from2(rs, 0, "ts", future_lb=wm)
    assert m is None and pend
    # an existing sealed row already failed the strict B slot: definitive
    rs2 = rows("A", "C")
    m, pend = pat._match_from2(rs2, 0, "ts", future_lb=rs2[1]["ts"])
    assert m is None and not pend
    # relaxed contiguity: failure is always curable while within is open
    rel = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
        .within(dt.timedelta(seconds=30))
    )
    m, pend = rel._match_from2(rs2, 0, "ts", future_lb=rs2[1]["ts"])
    assert m is None and pend
    # ... but once the watermark passes the within deadline, it is final
    late_wm = rs2[0]["ts"] + dt.timedelta(seconds=31)
    m, pend = rel._match_from2(rs2, 0, "ts", future_lb=late_wm)
    assert m is None and not pend


def _cep_stream_batches(spark, batches, op_builder, delay="20 seconds"):
    """Replay hand-built event batches through a streaming CEP operator via
    foreachBatch, capturing (batch_id, rows) pairs."""
    import datetime as dtm

    from tests.test_streaming_semantics import _write_batches

    schema = "ts timestamp, user_id long, event_id long, event_type string"
    typed = [
        [(dtm.datetime.fromisoformat(t), u, i, e) for t, u, i, e in b]
        for b in batches
    ]
    d = _write_batches(spark, typed, schema)
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(d)
        .withWatermark("ts", delay)
    )
    out = op_builder(sdf)
    captured = []

    def sink(bdf, bid):
        captured.append((bid, bdf.toPandas()))

    import os
    import tempfile
    import uuid

    ckpt = os.path.join(tempfile.gettempdir(), f"fps_ckpt_cep_{uuid.uuid4().hex[:8]}")
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return captured


def _signup_next_purchase():
    return (
        Pattern.begin("signup").where(lambda r: r["event_type"] == "signup")
        .next("purchase").where(lambda r: r["event_type"] == "purchase")
    )


def test_stream_watermark_corrects_out_of_order(spark):
    """An out-of-order event arriving within the watermark delay must break
    a strict-contiguity match that looked adjacent in arrival order. The
    naive immediate-emission operator gets this wrong; the watermark-held
    operator waits until the gap is sealed."""
    from flink_parent_spark.streaming.cep import (
        cep_pattern_stream,
        cep_pattern_stream_watermarked,
    )

    batches = [
        # arrival order: signup then purchase look adjacent
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:30", 1, 3, "purchase")],
        # but a browse between them arrives late (above watermark 00:00:10)
        [("2024-01-01 00:00:15", 1, 2, "browse"),
         ("2024-01-01 00:02:00", 1, 9, "noise")],
    ]
    held = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id"
        ),
    )
    assert sum(len(p) for _, p in held) == 0  # browse breaks strict contiguity

    naive = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id"
        ),
    )
    assert sum(len(p) for _, p in naive) > 0  # the naive op emits the false match


def test_stream_watermark_holds_then_flushes(spark):
    """Matches are held until sealed: nothing emits while the watermark is
    behind the rows; the event-time timeout flushes once it passes."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream_watermarked

    batches = [
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:01", 1, 2, "purchase")],
        [("2024-01-01 00:01:00", 1, 9, "noise")],
    ]
    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id"
        ),
    )
    per_batch = {bid: len(p) for bid, p in cap}
    assert per_batch.get(0, 0) == 0 and per_batch.get(1, 0) == 0
    total = sum(per_batch.values())
    assert total == 2  # signup + purchase rows of the single match, flushed late


def test_stream_watermark_drops_late_events(spark):
    """Events at/behind the watermark are discarded (Flink CEP late-data
    behavior): they can neither form nor break matches."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream_watermarked

    batches = [
        [("2024-01-01 00:10:00", 1, 9, "noise")],  # watermark -> 00:09:40
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:05", 1, 2, "purchase")],  # both behind wm: dropped
        [("2024-01-01 00:20:00", 1, 10, "noise")],
    ]
    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id"
        ),
    )
    assert sum(len(p) for _, p in cap) == 0


# --- FIRST/LAST navigation inside SQL DEFINE --------------------------------


def test_compile_nav_predicate():
    from flink_parent_spark.streaming.cep import MatchCtx
    from flink_parent_spark.streaming.match_recognize_sql import (
        _compile_nav_predicate,
    )

    variables = {"UP", "DOWN", "A"}
    pred = _compile_nav_predicate(
        "UP.value > LAST(DOWN.value) AND value <> 5",
        defining="UP",
        variables=variables,
    )
    rows = [{"value": 10}, {"value": 11}, {"value": 9}, {"value": 5}]
    taken = [("DOWN", 0)]  # LAST(DOWN.value) = 10
    assert pred(rows[1], MatchCtx(rows, 1, taken))
    assert not pred(rows[2], MatchCtx(rows, 2, taken))
    assert not pred(rows[3], MatchCtx(rows, 3, taken))

    # NULL navigation (no DOWN rows) -> condition is false, not an error
    assert not pred(rows[1], MatchCtx(rows, 1, []))

    # FIRST + string literal + arithmetic
    p2 = _compile_nav_predicate(
        "t = 'up' AND value >= FIRST(A.value) * 2",
        defining="B",
        variables={"A", "B"},
    )
    rows2 = [
        {"t": "a", "value": 3},
        {"t": "up", "value": 6},
        {"t": "down", "value": 6},
        {"t": "up", "value": 5},
    ]
    tk = [("A", 0)]  # FIRST(A.value) = 3
    assert p2(rows2[1], MatchCtx(rows2, 1, tk))
    assert not p2(rows2[2], MatchCtx(rows2, 2, tk))
    assert not p2(rows2[3], MatchCtx(rows2, 3, tk))

    # running self-aggregate: the row under test counts as the defining
    # variable's last row (SQL running semantics)
    p3 = _compile_nav_predicate(
        "SUM(A.price) < 6", defining="A", variables={"A"}
    )
    rows3 = [{"price": 1}, {"price": 2}, {"price": 3}]
    assert p3(rows3[0], MatchCtx(rows3, 0, []))  # 1 < 6
    assert p3(rows3[1], MatchCtx(rows3, 1, [("A", 0)]))  # 3 < 6
    assert not p3(rows3[2], MatchCtx(rows3, 2, [("A", 0), ("A", 1)]))  # 6<6


def test_match_recognize_sql_last_define(spark):
    """End-to-end: PATTERN (DOWN+ UP) with UP AS value > LAST(DOWN.value)
    finds the maximal descending run and its strict recovery."""
    import datetime as dtm

    from flink_parent_spark.streaming.match_recognize_sql import (
        match_recognize_sql,
    )

    vals = [9.0, 7.0, 4.0, 3.0, 8.0, 2.0, 2.0, 5.0]
    data = [
        (1, i, dtm.datetime(2024, 1, 1, 0, 0, i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )
    clause = """
      PARTITION BY user_id ORDER BY ts
      PATTERN ( DOWN+ UP )
      DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
             UP AS UP.value > LAST(DOWN.value)
    """
    out = match_recognize_sql(df, clause, "event_id").toPandas()
    out = out.sort_values(["match_id", "seq"]).reset_index(drop=True)
    # match 0: DOWN 7,4,3 then UP 8; match 1: DOWN 2 (8->2), UP is 2==2? no ->
    # 2,2 breaks the run (not <), next: 2->5 is UP but needs a DOWN first:
    # DOWN run = [5] (idx5, 8->2), UP candidate idx6 (2 > 2 false) -> no match
    assert list(out["event_id"]) == [1, 2, 3, 4]
    assert list(out["stage"]) == ["DOWN", "DOWN", "DOWN", "UP"]


# --- SKIP TO FIRST/LAST after-match strategies ------------------------------


def _abc_pattern():
    # consecutive(): these tests pin after-match-skip behavior, so the b-run
    # must not bridge across non-B rows (Flink's default relaxed internal
    # contiguity would make b+ span the C/A gaps)
    return (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .next("b").where(lambda r: r["t"] == "B").one_or_more().consecutive().greedy()
        .next("c").where(lambda r: r["t"] == "C")
    )


def test_skip_to_first_var():
    # A B B C: match [a0 b1 b2 c3]; SKIP TO FIRST b resumes at row 1 — no
    # second match there (B is not A), cursor then walks on
    rs = rows("A", "B", "B", "C", "A", "B", "C")
    ms = _abc_pattern().find_matches(rs, "ts", AfterMatchSkip.skip_to_first("b"))
    assert [names(m) for m in ms] == [
        [("a", 0), ("b", 1), ("b", 2), ("c", 3)],
        [("a", 4), ("b", 5), ("c", 6)],
    ]


def test_skip_to_last_var_overlap():
    # overlapping windows: D+ U where SKIP TO LAST d resumes AT the last
    # down row, letting it start the next V shape
    pat = (
        Pattern.begin("d").where(lambda r, c: c.prev("v") is not None and r["v"] < c.prev("v"))
        .one_or_more().consecutive().greedy()
        .next("u").where(lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v"))
    )
    rs = vrows(9, 5, 3, 7, 2, 8)
    # NO overlap under SKIP_PAST_LAST: [d1 d2 u3], [d4 u5]
    past = pat.find_matches(rs, "ts", AfterMatchSkip.SKIP_PAST_LAST)
    assert [names(m) for m in past] == [
        [("d", 1), ("d", 2), ("u", 3)],
        [("d", 4), ("u", 5)],
    ]
    # SKIP TO LAST d after the first match resumes at row 2 -> same result
    # here, but after the second V it would re-probe row 4 (end of data)
    last = pat.find_matches(rs, "ts", AfterMatchSkip.skip_to_last("d"))
    assert [names(m) for m in last][0] == [("d", 1), ("d", 2), ("u", 3)]


def test_skip_to_first_never_loops():
    # SKIP TO FIRST of the pattern's first variable would re-match forever;
    # the cursor is clamped strictly forward instead (Flink raises here)
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A")
    rs = rows("A", "A")
    ms = pat.find_matches(rs, "ts", AfterMatchSkip.skip_to_first("a"))
    assert [m[0][1] for m in ms] == [0, 1]


def test_match_recognize_sql_skip_to_first(spark):
    import datetime as dtm

    from flink_parent_spark.streaming.match_recognize_sql import (
        match_recognize_sql,
    )

    data = [
        (1, i, dtm.datetime(2024, 1, 1, 0, 0, i), t)
        for i, t in enumerate(["A", "B", "B", "C", "A", "B", "C"])
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, t string"
    )
    clause = """
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO FIRST B
      PATTERN ( A B+ C )
      DEFINE A AS A.t = 'A', B AS B.t = 'B', C AS C.t = 'C'
    """
    out = match_recognize_sql(df, clause, "event_id").toPandas()
    assert sorted(set(out["match_id"])) == [0, 1]
    m0 = out[out["match_id"] == 0].sort_values("seq")
    assert list(m0["event_id"]) == [0, 1, 2, 3]


# --- negative patterns (notNext / notFollowedBy) ----------------------------


def test_not_followed_by_blocks_gap():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .not_followed_by("x").where(lambda r: r["t"] == "X")
        .followed_by("c").where(lambda r: r["t"] == "C")
    )
    # A..C clean -> match; A X C -> blocked
    ms = pat.find_matches(rows("A", "B", "C"), "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("c", 2)]]
    ms = pat.find_matches(rows("A", "X", "C"), "ts")
    assert ms == []
    # the violating row blocks ONLY gaps containing it
    ms = pat.find_matches(rows("A", "C", "X", "A", "C"), "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("c", 1)], [("a", 3), ("c", 4)]]


def test_not_next_checks_immediate_row():
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .not_next("x").where(lambda r: r["t"] == "X")
        .followed_by("c").where(lambda r: r["t"] == "C")
    )
    assert pat.find_matches(rows("A", "X", "C"), "ts") == []
    # X later than the immediate next row does not block not_next
    ms = pat.find_matches(rows("A", "B", "X", "C"), "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("c", 3)]]


def test_negative_pattern_restrictions():
    with pytest.raises(ValueError):
        (
            Pattern.begin("a").where(lambda r: True)
            .not_followed_by("x").where(lambda r: True)
            .one_or_more()
        )
    pat = Pattern.begin("a").where(lambda r: r["t"] == "A").not_followed_by(
        "x"
    ).where(lambda r: r["t"] == "X")
    with pytest.raises(ValueError):
        pat.find_matches(rows("A"), "ts")


def test_not_followed_by_streaming_pending(spark):
    """Watermark-held streaming with a negative stage: the match cannot emit
    until the gap to the closing stage is sealed — a late-arriving
    violating row inside the gap kills it."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream_watermarked

    pat = (
        Pattern.begin("signup").where(lambda r: r["event_type"] == "signup")
        .not_followed_by("err").where(lambda r: r["event_type"] == "error")
        .followed_by("purchase").where(lambda r: r["event_type"] == "purchase")
    )
    batches = [
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:30", 1, 3, "purchase")],
        # the error between them arrives late but within the delay
        [("2024-01-01 00:00:15", 1, 2, "error"),
         ("2024-01-01 00:02:00", 1, 9, "noise")],
    ]
    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, pat, ["user_id"], "ts", "event_id"
        ),
    )
    assert sum(len(p) for _, p in cap) == 0


def test_until_stops_loop():
    # B+ until X: the run stops before a row satisfying the stop condition
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .next("b").where(lambda r: r["t"] in ("B", "X")).one_or_more().greedy()
        .until(lambda r: r["t"] == "X")
        .next("c").where(lambda r: r["t"] == "C")
    )
    # without until, b+ would swallow X; with it the run is B,B then C fails
    # at X -> backtracking cannot help (strict next) -> no match
    assert pat.find_matches(rows("A", "B", "B", "X", "C"), "ts") == []
    ms = pat.find_matches(rows("A", "B", "B", "C"), "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("b", 1), ("b", 2), ("c", 3)]]


def test_subtype_refinement():
    pat = (
        Pattern.begin("s").subtype("signup", type_col="t")
        .followed_by("p").subtype("purchase", type_col="t")
    )
    ms = pat.find_matches(rows("signup", "view", "purchase"), "ts")
    assert [names(m) for m in ms] == [[("s", 0), ("p", 2)]]


def test_watermarked_stream_equals_batch_on_scrambled_replay(spark):
    """Equivalence: the watermark-held streaming CEP over a 4-batch,
    out-of-order (within delay) replay must produce exactly the batch
    matcher's matches on the same events."""
    import datetime as dtm

    import pandas as pd

    from flink_parent_spark.streaming.cep import (
        cep_pattern,
        cep_pattern_stream_watermarked,
    )

    # two keys, interleaved signup/browse/purchase runs
    seq = [
        (1, "signup"), (1, "purchase"), (2, "signup"), (1, "signup"),
        (2, "browse"), (2, "purchase"), (1, "browse"), (1, "signup"),
        (1, "purchase"), (2, "signup"), (2, "purchase"), (1, "noise"),
    ]
    events = [
        (f"2024-01-01 {i // 6:02d}:{(i % 6) * 10:02d}:00", uid, i, et)
        for i, (uid, et) in enumerate(seq)
    ]
    # scramble: neighbors (10 min apart) swapped across batch boundaries,
    # within the 15-minute watermark delay; a far-future advancer seals all
    order = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 11]
    scrambled = [events[i] for i in order]
    advancer = ("2024-01-01 09:00:00", 1, 99, "noise")
    batches = [scrambled[i : i + 3] for i in range(0, len(scrambled), 3)]
    batches.append([advancer])
    events.append(advancer)

    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id"
        ),
        delay="15 minutes",
    )
    streamed = pd.concat([p for _, p in cap], ignore_index=True)

    batch_df = spark.createDataFrame(
        [(dtm.datetime.fromisoformat(t), u, i, e) for t, u, i, e in events],
        "ts timestamp, user_id long, event_id long, event_type string",
    )
    expected = cep_pattern(
        batch_df, _signup_next_purchase(), ["user_id"], "ts", "event_id"
    ).toPandas()

    key = ["user_id", "match_id", "seq"]
    s = streamed.sort_values(key).reset_index(drop=True)
    e = expected.sort_values(key).reset_index(drop=True)
    assert list(s["event_id"]) == list(e["event_id"])
    assert list(s["stage"]) == list(e["stage"])


def test_bounded_quantifier_held_at_seal_boundary():
    """A greedy times(m,n) run ending exactly at the seal boundary with
    taken < n must be held (future events could extend it), matching the
    batch matcher on full replay; once taken == n or the boundary moves
    past, it finalizes."""
    from flink_parent_spark.streaming.cep import _scan_frontier

    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .times(2, 4).consecutive().greedy()
    )
    rs = rows("A", "A")
    recs, n, retain = _scan_frontier(
        pat, rs, len(rs), ["k"], "ts", "id", AfterMatchSkip.SKIP_PAST_LAST,
        0, future_lb=pd.Timestamp.min, wm_ms=None,
    )
    assert n == 0 and retain == 0  # held: run has headroom (2 < 4)

    rs4 = rows("A", "A", "A", "A")
    recs, n, retain = _scan_frontier(
        pat, rs4, len(rs4), ["k"], "ts", "id", AfterMatchSkip.SKIP_PAST_LAST,
        0, future_lb=pd.Timestamp.min, wm_ms=None,
    )
    assert n == 1 and len(recs) == 4  # saturated at n=4: final, emitted

    rs_done = rows("A", "A", "B")  # a non-matching row past the run seals it
    recs, n, retain = _scan_frontier(
        pat, rs_done, len(rs_done), ["k"], "ts", "id",
        AfterMatchSkip.SKIP_PAST_LAST, 0,
        future_lb=pd.Timestamp.min, wm_ms=None,
    )
    assert n == 1 and len(recs) == 2 and retain == 3


def test_stream_times_bounded_equals_batch_on_split_replay(spark):
    """times(2,4).greedy straddling micro-batch boundaries: the watermark-
    held stream must produce the batch matcher's maximal run, not the
    early-sealed prefixes."""
    import datetime as dtm

    from flink_parent_spark.streaming.cep import (
        cep_pattern,
        cep_pattern_stream_watermarked,
    )

    pat = lambda: (  # noqa: E731
        Pattern.begin("c").where(lambda r: r["event_type"] == "click")
        .times(2, 4).greedy()
    )
    events = [
        ("2024-01-01 00:00:00", 1, 0, "click"),
        ("2024-01-01 00:00:10", 1, 1, "click"),
        ("2024-01-01 00:00:20", 1, 2, "click"),
        ("2024-01-01 00:00:30", 1, 3, "click"),
        ("2024-01-01 01:00:00", 1, 9, "noise"),
    ]
    batches = [events[0:2], events[2:4], events[4:]]
    cap = _cep_stream_batches(
        spark, batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, pat(), ["user_id"], "ts", "event_id"
        ),
        delay="5 seconds",
    )
    streamed = pd.concat([p for _, p in cap], ignore_index=True)

    batch_df = spark.createDataFrame(
        [(dtm.datetime.fromisoformat(t), u, i, e) for t, u, i, e in events],
        "ts timestamp, user_id long, event_id long, event_type string",
    )
    expected = cep_pattern(batch_df, pat(), ["user_id"], "ts", "event_id").toPandas()
    key = ["match_id", "seq"]
    s = streamed.sort_values(key).reset_index(drop=True)
    e = expected.sort_values(key).reset_index(drop=True)
    assert list(s["event_id"]) == list(e["event_id"]) == [0, 1, 2, 3]


def test_naive_stream_frontier_gc_no_reemission(spark):
    """The no-watermark streaming operator must GC consumed rows for EVERY
    skip strategy: under NO_SKIP, a match found in batch k must not be
    re-found (and re-emitted) in batch k+1 from the retained buffer."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream

    batches = [
        [("2024-01-01 00:00:00", 1, 0, "signup"),
         ("2024-01-01 00:00:10", 1, 1, "purchase")],
        [("2024-01-01 00:01:00", 1, 2, "signup"),
         ("2024-01-01 00:01:10", 1, 3, "purchase")],
        [("2024-01-01 00:02:00", 1, 4, "signup"),
         ("2024-01-01 00:02:10", 1, 5, "purchase")],
    ]
    cap = _cep_stream_batches(
        spark, batches,
        lambda sdf: cep_pattern_stream(
            sdf, _signup_next_purchase(), ["user_id"], "ts", "event_id",
            AfterMatchSkip.NO_SKIP,
        ),
    )
    streamed = pd.concat([p for _, p in cap], ignore_index=True)
    # 3 matches x 2 rows, each exactly once; match_ids stay distinct
    assert len(streamed) == 6
    assert sorted(streamed["event_id"]) == [0, 1, 2, 3, 4, 5]
    assert streamed["match_id"].nunique() == 3


# --- Flink combinators: relaxed/consecutive, followedByAny, combinations,
# --- group patterns (NFAITCase-style hand-fed sequences) ---------------------


def test_relaxed_internal_contiguity_default():
    """Flink default for looping stages: non-matching rows between
    repetitions are skipped (consecutive() opts back into strict runs)."""
    relaxed = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B").one_or_more().greedy()
        .followed_by("c").where(lambda r: r["t"] == "C")
    )
    rs = rows("A", "B", "X", "B", "C")
    ms = relaxed.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [[("a", 0), ("b", 1), ("b", 3), ("c", 4)]]

    strict = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
        .one_or_more().consecutive().greedy()
        .followed_by("c").where(lambda r: r["t"] == "C")
    )
    ms2 = strict.find_matches(rs, "ts")
    assert [names(m) for m in ms2] == [[("a", 0), ("b", 1), ("c", 4)]]


def test_followed_by_any_branches_every_start():
    """followedByAny: every qualifying event after the previous stage forms
    its own match (NFAITCase testFollowedByAny shape)."""
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by_any("b").where(lambda r: r["t"] == "B")
    )
    rs = rows("A", "B", "X", "B")
    ms = pat.find_matches(rs, "ts", AfterMatchSkip.NO_SKIP)
    assert [names(m) for m in ms] == [
        [("a", 0), ("b", 1)],
        [("a", 0), ("b", 3)],
    ]
    # plain followed_by commits to the first B only
    plain = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    assert [names(m) for m in plain.find_matches(rs, "ts", AfterMatchSkip.NO_SKIP)] == [
        [("a", 0), ("b", 1)]
    ]


def test_allow_combinations_enumerates_subsets():
    """allowCombinations: the quantified run branches on every ordered
    subset of qualifying rows anchored at the run's first row
    (NFAITCase testAllowCombinations shape: a b1 b2 -> {b1,b2},{b1},... )."""
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
        .one_or_more().allow_combinations().greedy()
        .followed_by("c").where(lambda r: r["t"] == "C")
    )
    rs = rows("A", "B", "B", "B", "C")
    ms = pat.find_matches(rs, "ts", AfterMatchSkip.NO_SKIP)
    got = {tuple(i for s, i in m if s == "b") for m in ms}
    # all subsets of {1,2,3} containing the anchor row 1
    assert got == {(1, 2, 3), (1, 2), (1, 3), (1,)}


def test_group_pattern_quantified():
    """Group pattern with times(2): (X Y){2} — the whole sub-pattern must
    repeat back to back (GroupPattern via Pattern.java begin/next(Pattern))."""
    inner = (
        Pattern.begin("x").where(lambda r: r["t"] == "X")
        .next("y").where(lambda r: r["t"] == "Y")
    )
    pat = Pattern.begin(inner).times(2).consecutive()
    ms = pat.find_matches(rows("X", "Y", "X", "Y"), "ts")
    assert [names(m) for m in ms] == [[("x", 0), ("y", 1), ("x", 2), ("y", 3)]]
    assert pat.find_matches(rows("X", "Y", "X", "X"), "ts") == []


def test_group_pattern_relaxed_repetition_and_tail():
    """Quantified group with relaxed repetition contiguity skips noise
    between repetitions; a following stage continues after the group."""
    inner = (
        Pattern.begin("x").where(lambda r: r["t"] == "X")
        .next("y").where(lambda r: r["t"] == "Y")
    )
    pat = (
        Pattern.begin(inner).times(2)
        .followed_by("z").where(lambda r: r["t"] == "Z")
    )
    rs = rows("X", "Y", "N", "X", "Y", "Z")
    ms = pat.find_matches(rs, "ts")
    assert [names(m) for m in ms] == [
        [("x", 0), ("y", 1), ("x", 3), ("y", 4), ("z", 5)]
    ]


def test_group_pattern_optional():
    """(X Y)? between A and C. A greedy optional group prefers taking the
    repetition; a reluctant one prefers zero (same preference order as
    single-stage optionals); absent rows fall through either way."""
    def mk(greedy: bool):
        inner = (
            Pattern.begin("x").where(lambda r: r["t"] == "X")
            .next("y").where(lambda r: r["t"] == "Y")
        )
        p = (
            Pattern.begin("a").where(lambda r: r["t"] == "A")
            .followed_by(inner).optional()
        )
        if greedy:
            p = p.greedy()
        return p.followed_by("c").where(lambda r: r["t"] == "C")

    rs = rows("A", "X", "Y", "C")
    assert [names(m) for m in mk(True).find_matches(rs, "ts")] == [
        [("a", 0), ("x", 1), ("y", 2), ("c", 3)]
    ]
    assert [names(m) for m in mk(False).find_matches(rs, "ts")] == [
        [("a", 0), ("c", 3)]
    ]
    assert [names(m) for m in mk(True).find_matches(rows("A", "C"), "ts")] == [
        [("a", 0), ("c", 1)]
    ]


# --- round-5 regressions: no-watermark finalization clock + group-stage
# --- extendability (ADVICE r4) ----------------------------------------------


def test_naive_stream_within_finalizes_relaxed_quantified_match(spark):
    """No-watermark mode: a completed match ending in a relaxed quantified
    stage with headroom, bounded by `within`, must finalize and EMIT once a
    later sealed event passes the within deadline (the max sealed event time
    is the finalization clock). Previously such matches were held forever
    and their rows never GC'd."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream

    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "signup")
        .followed_by("b").where(lambda r: r["event_type"] == "purchase")
        .one_or_more()
        .within(dt.timedelta(hours=1))
    )
    batches = [
        [("2024-01-01 00:00:00", 1, 0, "signup"),
         ("2024-01-01 00:00:10", 1, 1, "purchase")],
        [("2024-01-01 05:00:00", 1, 2, "noise"),
         ("2024-01-01 06:00:00", 1, 3, "noise")],
    ]
    cap = _cep_stream_batches(
        spark, batches,
        lambda sdf: cep_pattern_stream(sdf, pat, ["user_id"], "ts", "event_id"),
    )
    streamed = pd.concat([p for _, p in cap], ignore_index=True)
    assert sorted(streamed["event_id"]) == [0, 1]
    assert streamed["match_id"].nunique() == 1


def test_naive_stream_expired_partial_match_closes_and_gcs(spark):
    """No-watermark mode: a partial match (signup, no purchase) whose
    `within` deadline has passed per the max sealed event time must stop
    pinning the buffer — later matches still emit and the stale head cannot
    complete."""
    from flink_parent_spark.streaming.cep import cep_pattern_stream

    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "signup")
        .followed_by("b").where(lambda r: r["event_type"] == "purchase")
        .within(dt.timedelta(minutes=10))
    )
    batches = [
        [("2024-01-01 00:00:00", 1, 0, "signup")],
        [("2024-01-01 02:00:00", 1, 1, "noise")],
        # fresh pair well past the stale head's deadline
        [("2024-01-01 03:00:00", 1, 2, "signup"),
         ("2024-01-01 03:00:05", 1, 3, "purchase")],
    ]
    cap = _cep_stream_batches(
        spark, batches,
        lambda sdf: cep_pattern_stream(sdf, pat, ["user_id"], "ts", "event_id"),
    )
    streamed = pd.concat([p for _, p in cap], ignore_index=True)
    # exactly the fresh pair; the expired signup never matches
    assert sorted(streamed["event_id"]) == [2, 3]


def test_final_stage_index_resolves_group_inner_names():
    """Matches record inner group-stage names while the owning stage is
    named '<group>': the reverse scan must map them back to the owning
    top-level stage, not fall through to the last stage."""
    from flink_parent_spark.streaming.cep import _final_stage_index

    inner = (
        Pattern.begin("x").where(lambda r: r["t"] == "X")
        .next("y").where(lambda r: r["t"] == "Y")
    )
    pat = (
        Pattern.begin(inner).one_or_more()
        .followed_by("c").where(lambda r: r["t"] == "C").optional()
    )
    # match ends on the group's inner stage 'y' -> owning stage index 0
    assert _final_stage_index(pat._stages, [("x", 0), ("y", 1)]) == 0
    # match ends on the plain trailing stage
    assert _final_stage_index(pat._stages, [("x", 0), ("y", 1), ("c", 2)]) == 1


def test_backtracking_guard_trips_on_adversarial_pattern():
    """Guard rail: a (A+)+-style nested enumeration over a long all-A input
    with an unsatisfiable tail explodes exponentially in the backtracking
    matcher — it must raise CepComplexityError instead of hanging (the
    reference's NFA stays polynomial here; we fail loudly)."""
    from flink_parent_spark.streaming.cep import CepComplexityError

    inner = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .one_or_more().allow_combinations()
    )
    pat = (
        Pattern.begin(inner).one_or_more().allow_combinations()
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    rs = rows(*(["A"] * 26))  # no B anywhere -> full exploration
    with pytest.raises(CepComplexityError, match="backtracking"):
        pat.find_matches(rs, "ts")


def test_backtracking_guard_budget_is_per_anchor():
    """Ordinary patterns over long inputs stay far under the budget: the
    step counter resets per anchor, so a benign scan of many rows does not
    trip the guard."""
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "A")
        .followed_by("b").where(lambda r: r["t"] == "B")
    )
    rs = rows(*(["A", "X", "B"] * 400))
    ms = pat.find_matches(rs, "ts")
    assert len(ms) == 400


def test_stream_permute_alternation_and_exclusion(spark):
    """Round-6: PERMUTE (whole-pattern alternation) and {- -} exclusion run
    in the watermark-held streaming operator (StreamExecMatch.scala:68 runs
    the full clause set on streams). PERMUTE(signup, purchase) matches both
    orderings; excluding the purchase stage emits only the signup rows."""
    from flink_parent_spark.streaming.cep import (
        Pattern,
        cep_pattern_stream_watermarked,
    )

    def pat(a, b):
        return (
            Pattern.begin(a).where(lambda r: r["event_type"] == a)
            .next(b).where(lambda r: r["event_type"] == b)
        )

    batches = [
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:10", 1, 2, "purchase"),   # S P -> first variant
         ("2024-01-01 00:01:00", 2, 3, "purchase"),
         ("2024-01-01 00:01:10", 2, 4, "signup")],    # P S -> second variant
        [("2024-01-01 00:05:00", 1, 9, "noise")],
    ]
    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, pat("signup", "purchase"), ["user_id"], "ts", "event_id",
            alternatives=[pat("purchase", "signup")],
        ),
    )
    rows = [r for _, p in cap for r in p.to_dict("records")]
    got = {(r["user_id"], r["event_id"], r["stage"]) for r in rows}
    assert got == {
        (1, 1, "signup"), (1, 2, "purchase"),
        (2, 3, "purchase"), (2, 4, "signup"),
    }

    cap_ex = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, pat("signup", "purchase"), ["user_id"], "ts", "event_id",
            alternatives=[pat("purchase", "signup")],
            exclude=frozenset(["purchase"]),
        ),
    )
    rows_ex = [r for _, p in cap_ex for r in p.to_dict("records")]
    assert {(r["user_id"], r["event_id"], r["stage"], r["seq"]) for r in rows_ex} == {
        (1, 1, "signup", 0), (2, 4, "signup", 0),
    }


def test_alternative_pending_does_not_withhold_completed_match(spark):
    """A completed HIGHER-preference match emits even while a
    lower-preference alternative is still pending at the same position
    (round-6 ADVICE): lower-preference pending cannot change the outcome,
    so holding for it (with no WITHIN: indefinitely, pinning keyed state)
    is wrong. Preferred = signup->purchase completes on rows 1,2; the
    alternative signup->refund never completes (no refund ever arrives)."""
    from flink_parent_spark.streaming.cep import (
        Pattern,
        cep_pattern_stream_watermarked,
    )

    def pat(b):
        return (
            Pattern.begin("signup").where(lambda r: r["event_type"] == "signup")
            .followed_by(b).where(lambda r, _b=b: r["event_type"] == _b)
        )

    batches = [
        [("2024-01-01 00:00:00", 1, 1, "signup"),
         ("2024-01-01 00:00:10", 1, 2, "purchase")],
        # advances the watermark well past the match; still no refund
        [("2024-01-01 02:00:00", 1, 9, "noise")],
        [("2024-01-01 04:00:00", 1, 10, "noise")],
    ]
    cap = _cep_stream_batches(
        spark,
        batches,
        lambda sdf: cep_pattern_stream_watermarked(
            sdf, pat("purchase"), ["user_id"], "ts", "event_id",
            alternatives=[pat("refund")],
        ),
    )
    rows = [r for _, p in cap for r in p.to_dict("records")]
    got = {(r["event_id"], r["stage"]) for r in rows}
    assert got == {(1, "signup"), (2, "purchase")}
