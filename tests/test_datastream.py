"""DataStream API veneer tests (DataStream.java / KeyedStream.java verb
parity at the Python surface, bounded-replay semantics checked against
plain-Python models)."""

from __future__ import annotations

import pandas as pd
import pytest

from flink_parent_spark.api.datastream import StreamExecutionEnvironment


@pytest.fixture(scope="module")
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


def test_map_filter_expr_and_callable(env):
    ds = env.from_collection([(1, "a"), (2, "b"), (3, "c")], "n int, s string")
    # SQL-expression fast path
    out = ds.map("n * 10 AS n10").filter("n10 > 10").execute_and_collect()
    assert out == [20, 30]
    # Python-callable path (Arrow-batched)
    out2 = (
        ds.map(lambda r: {"v": r["n"] + 100, "tag": r["s"].upper()},
               "v int, tag string")
        .filter(lambda r: r["v"] % 2 == 1)
        .execute_and_collect()
    )
    assert out2 == [(101, "A"), (103, "C")]


def test_flat_map_emits_in_order(env):
    ds = env.from_collection([("x y",), ("z",)], "line string")
    out = ds.flat_map(
        lambda r: [{"w": w} for w in r["line"].split()], "w string"
    ).execute_and_collect()
    assert out == ["x", "y", "z"]


def test_keyed_running_reduce_emits_per_element(env):
    """KeyedStream.reduce emits a running result for EVERY input element in
    arrival order (DataStream semantics, not a final-only aggregate)."""
    data = [("a", 1), ("b", 10), ("a", 2), ("a", 3), ("b", 20)]
    ds = env.from_collection(data, "k string, v int")
    out = (
        ds.key_by("k")
        .reduce(lambda acc, cur: {"k": cur["k"], "v": acc["v"] + cur["v"]})
        .execute_and_collect()
    )
    assert out == [("a", 1), ("b", 10), ("a", 3), ("a", 6), ("b", 30)]

    sums = ds.key_by("k").sum("v").execute_and_collect()
    assert sums == out
    assert ds.key_by("k").max("v").execute_and_collect()[-1] == ("b", 20)


def test_union_and_print_order(env, capsys):
    a = env.from_collection([(1,)], "n int")
    b = env.from_collection([(2,)], "n int")
    assert sorted(a.union(b).to_df().collect()) == [(1,), (2,)]


def test_keyed_process_function(env):
    ds = env.from_collection(
        [("a", 5), ("a", 7), ("b", 1)], "k string, v int"
    )

    def top_value(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [key[0]], "best": [int(pdf["v"].max())]})

    out = sorted(
        ds.key_by("k").process(top_value, "k string, best long")
        .execute_and_collect()
    )
    assert out == [("a", 7), ("b", 1)]


def test_event_time_window_aggregate(env, spark):
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        ("u", t0 + dtm.timedelta(minutes=m), float(v))
        for m, v in [(1, 1.0), (2, 2.0), (61, 10.0)]
    ]
    ds = env.from_collection(rows, "k string, ts timestamp, v double")
    out = (
        ds.key_by("k")
        .window("ts", "1 hour")
        .aggregate("sum(v) AS total", "count(*) AS n")
        .to_df()
        .orderBy("window_start")
        .collect()
    )
    assert [(r["total"], r["n"]) for r in out] == [(3.0, 2), (10.0, 1)]


def test_count_window(env):
    data = [("a", i) for i in range(5)]
    ds = env.from_collection(data, "k string, v int")
    out = (
        ds.key_by("k").count_window(2).aggregate("sum(v) AS s")
        .to_df().orderBy("window_id").collect()
    )
    # windows [0,1] [2,3] [4]
    assert [(r["window_id"], r["s"]) for r in out] == [(0, 1), (1, 5), (2, 4)]


def test_connected_streams_co_map(env):
    """CoMapFunction parity: each side of a connected pair routes through
    its own function into one output type."""
    nums = env.from_collection([(1,), (2,)], "n int")
    words = env.from_collection([("abc",), ("de",)], "s string")
    out = sorted(
        nums.connect(words)
        .map(
            lambda r: {"v": r["n"] * 10},
            lambda r: {"v": len(r["s"])},
            "v int",
        )
        .to_df()
        .collect()
    )
    assert [r["v"] for r in out] == [2, 3, 10, 20]


def test_iterative_stream_decrement_until_zero(env):
    """The reference's canonical iteration example (IterativeStream javadoc /
    Flink docs): subtract one, feed back while still positive, emit at zero.
    Every input must exit exactly once with value 0, after `n` feedback
    rounds for input n."""
    ds = env.from_collection([(1,), (3,), (5,), (2,)], "n int")
    it = ds.iterate(max_iterations=10)
    minus_one = it.map("n - 1 AS n")
    still_positive = minus_one.filter("n > 0")
    closed = it.close_with(still_positive)
    # body over originals + all feedback; terminal elements exit at <= 0
    out = closed.map("n - 1 AS n").filter("n <= 0").execute_and_collect()
    assert sorted(out) == [0, 0, 0, 0]
    # head saw originals + every feedback round: chains 1 | 3,2,1 | 5,4,3,2,1 | 2,1
    assert sorted(closed.execute_and_collect()) == [1, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5]


def test_iterative_stream_max_iterations_bounds_loop(env):
    """An always-true feedback predicate terminates at max_iterations (the
    bounded analog of the reference's maxWaitTime shutdown)."""
    ds = env.from_collection([(0,)], "n int")
    it = ds.iterate(max_iterations=3)
    fb = it.map("n + 1 AS n").filter("n > -999")
    closed = it.close_with(fb)
    assert sorted(closed.execute_and_collect()) == [0, 1, 2, 3]


def test_iterative_stream_rejects_foreign_feedback(env):
    ds = env.from_collection([(1,)], "n int")
    other = env.from_collection([(2,)], "n int")
    it = ds.iterate()
    with pytest.raises(ValueError, match="replayable lineage"):
        it.close_with(other)


def test_map_pandas_vectorized_equals_per_row(env):
    """map_pandas hands the callable the whole Arrow batch (vectorized
    default for real pipelines, round-5 verdict #7): same results as the
    per-row map(callable) path, arrival order preserved."""
    data = [(float(i), f"r{i}") for i in range(50)]
    ds = env.from_collection(data, "v double, tag string")

    per_row = ds.map(
        lambda r: {"v2": r["v"] * 2 + 1, "tag": r["tag"]},
        "v2 double, tag string",
    ).execute_and_collect()
    vec = ds.map_pandas(
        lambda pdf: pdf.assign(v2=pdf["v"] * 2 + 1)[["v2", "tag"]],
        "v2 double, tag string",
    ).execute_and_collect()
    assert vec == per_row

    # cardinality-changing batch fn (vectorized flat_map)
    import pandas as pd

    doubled = ds.map_pandas(
        lambda pdf: pd.concat([pdf, pdf])[["v"]].rename(columns={"v": "v2"}),
        "v2 double",
    ).execute_and_collect()
    assert len(doubled) == 100


def test_map_pandas_cardinality_change_unique_arrivals(env):
    """Cardinality-changing map_pandas derives arrival ids from the
    batch's input arrivals (flat_map's sub-ordinal scheme) — ids must not
    restart at 0 per Arrow batch/partition, or downstream order-sensitive
    ops (to_list's orderBy(ARRIVAL)) go nondeterministic (round-6 ADVICE).
    With several partitions, colliding ids would collapse/reorder rows."""
    import pandas as pd

    data = [(float(i),) for i in range(60)]
    ds = env.from_collection(data, "v double")
    # duplicate every row (cardinality 2x) then collect ordered by arrival
    out = ds.map_pandas(
        lambda pdf: pd.concat([pdf, pdf]).sort_values("v")[["v"]],
        "v double",
    ).execute_and_collect()
    assert len(out) == 120
    vals = list(out)  # single-column collect yields scalars
    # every value exactly twice, and batch-local pairs stay adjacent under
    # the global arrival order (unique monotone ids per batch)
    from collections import Counter

    assert Counter(vals) == Counter([float(i) for i in range(60)] * 2)


def test_map_pandas_mixed_cardinality_batches_keep_order(env):
    """A fn that changes cardinality in only SOME batches (data-dependent
    vectorized filter) must not mix id scales: preserved and synthesized
    arrival ids live in one ordered space, so downstream
    orderBy(ARRIVAL) keeps the stream's original order (code-review
    round-7 finding)."""
    data = [(float(i),) for i in range(90)]
    ds = env.from_collection(data, "v double")
    # drop the single value 40.0 — only the batch containing it changes
    # cardinality; every other batch keeps its length
    out = ds.map_pandas(
        lambda pdf: pdf[pdf["v"] != 40.0][["v"]],
        "v double",
    ).execute_and_collect()
    vals = list(out)
    assert len(vals) == 89 and 40.0 not in vals
    assert vals == sorted(vals)  # arrival order preserved end-to-end


def test_count_window_sliding(env):
    """countWindow(size, slide) — CountSlidingWindowAssigner semantics:
    fire every `slide` elements over the last `size` (CountEvictor caps,
    it does not wait for a full window during warm-up)."""
    data = [("a", i) for i in [1, 2, 4, 8, 16, 32]] + [("b", 100), ("b", 200)]
    ds = env.from_collection(data, "k string, v int")
    out = (
        ds.key_by("k").count_window(3, 2)
        .aggregate("sum(v) AS s", "count(v) AS n")
        .to_df().orderBy("k", "window_id").collect()
    )
    got = [(r["k"], r["window_id"], r["s"], r["n"]) for r in out]
    # key a fires at elements 2,4,6: last-3 sums 1+2, 2+4+8, 8+16+32
    # key b fires at element 2: 100+200 (warm-up, only 2 rows available)
    assert got == [
        ("a", 0, 3, 2), ("a", 1, 14, 3), ("a", 2, 56, 3),
        ("b", 0, 300, 2),
    ]
