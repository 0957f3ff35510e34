"""Focused tests for the round-16 optimization changes: non-finite parsed
literals, scoped persist release, the MinHash-LSH hot-band guard, and the
bench --ab instrument hardening (r15 ADVICE items)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_lit_d_nonfinite_literals(spark):
    """repr(nan) renders 'nanD' which Spark cannot resolve (r15 ADVICE);
    non-finite values must round-trip through double() casts instead."""
    from flink_parent_spark.datapipe.similarity import _lit_d1, _lit_d2

    nan, inf = float("nan"), float("inf")
    row = spark.range(1).select(
        _lit_d1([1.5, nan, inf, -inf]).alias("a"),
        _lit_d2([[nan, 2.0], [-inf, 0.25]]).alias("b"),
    ).collect()[0]
    assert row["a"][0] == 1.5
    assert math.isnan(row["a"][1])
    assert row["a"][2] == inf and row["a"][3] == -inf
    assert math.isnan(row["b"][0][0]) and row["b"][0][1] == 2.0
    assert row["b"][1][0] == -inf and row["b"][1][1] == 0.25


def test_lit_d_finite_bit_identical_to_flit(spark):
    """The finite path is unchanged: parsed literal == F.lit bit-for-bit."""
    from flink_parent_spark.datapipe.similarity import _lit_d1

    vals = [0.1, 1 / 3, 2.5e-17, -7.25]
    row = spark.range(1).select(
        _lit_d1(vals).alias("p"),
        F.array(*[F.lit(v) for v in vals]).alias("l"),
    ).collect()[0]
    assert row["p"] == row["l"]


def test_persist_scoped_releases_previous_generation(spark):
    from flink_parent_spark.datapipe.cachereg import (
        persist_scoped,
        release_intermediates,
    )

    d1 = persist_scoped(spark.range(10), "test.gen")
    assert d1.is_cached
    d2 = persist_scoped(spark.range(20), "test.gen")
    assert not d1.is_cached  # previous generation released
    assert d2.is_cached
    other = persist_scoped(spark.range(5), "test.other")
    assert d2.is_cached  # different key untouched
    release_intermediates()
    assert not d2.is_cached and not other.is_cached


def _near_dup_corpus(spark, n_hot: int, n_bg: int):
    """n_hot identical docs (every band digest shared by all of them) plus
    n_bg unrelated docs."""
    hot_text = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, hot_text) for i in range(n_hot)]
    rows += [
        (1000 + j, " ".join(f"bg{j}w{i}" for i in range(30)))
        for j in range(n_bg)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_minhash_band_cap_drops_hot_bands(spark):
    from flink_parent_spark.datapipe.dedup import minhash_lsh_pairs

    df = _near_dup_corpus(spark, n_hot=6, n_bg=4)
    # uncapped: the 6 identical docs pair completely = 15 candidate pairs
    full = minhash_lsh_pairs(
        df, "text", "doc_id", n=3, k=16, bands=4, verify_threshold=None
    )
    assert full.count() == 15
    # every band of the hot docs has frequency 6 > 3 -> all dropped
    capped = minhash_lsh_pairs(
        df, "text", "doc_id", n=3, k=16, bands=4,
        verify_threshold=None, max_band_freq=3,
    )
    assert capped.count() == 0
    # a cap above the hot frequency changes nothing
    loose = minhash_lsh_pairs(
        df, "text", "doc_id", n=3, k=16, bands=4,
        verify_threshold=None, max_band_freq=100,
    )
    assert loose.count() == 15


def test_minhash_default_unchanged(spark):
    """max_band_freq defaults to None: declared-query output byte-unchanged."""
    import inspect

    from flink_parent_spark.datapipe.dedup import minhash_lsh_pairs

    sig = inspect.signature(minhash_lsh_pairs)
    assert sig.parameters["max_band_freq"].default is None


def _stub_ab(monkeypatch, a_runs, b_runs):
    import subprocess

    import bench

    a_it, b_it = iter(a_runs), iter(b_runs)
    monkeypatch.setattr(bench, "run_bench", lambda: dict(next(a_it)))
    monkeypatch.setattr(bench, "_bench_other_tree", lambda wt: dict(next(b_it)))
    monkeypatch.setattr(bench, "_stop_active_session", lambda: None)

    class _Ok:
        returncode = 0

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Ok())
    return bench


def _mkrun(queries, value, cpu=None):
    r = {"queries": dict(queries), "value": value}
    if cpu is not None:
        r["calib"] = {"cpu": {"median": cpu}}
    return r


def test_ab_degraded_b_without_value_does_not_crash(monkeypatch):
    """b_value uses min(..., default=None): a degraded B run (both brackets
    missing 'value') must not raise after four brackets were paid for."""
    qs = {f"q{i}": 1.0 for i in range(5)}
    bench = _stub_ab(
        monkeypatch,
        [_mkrun(qs, 5.0), _mkrun(qs, 5.0)],
        [{"queries": dict(qs)}, {"queries": dict(qs)}],
    )
    ab = bench.run_ab("deadbeefcafe")["ab"]
    assert ab["b_value"] is None
    assert ab["median_ratio"] == 1.0


def test_ab_insufficient_survivors_is_flat(monkeypatch):
    """<4 surviving ratios -> no IQR -> verdict capped at FLAT even when
    the bare median would read FASTER (r15 ADVICE)."""
    a = {"q1": 0.5, "q2": 0.5, "q3": 0.5}
    b = {"q1": 1.0, "q2": 1.0, "q3": 1.0}
    bench = _stub_ab(
        monkeypatch,
        [_mkrun(a, 1.5), _mkrun(a, 1.5)],
        [_mkrun(b, 3.0), _mkrun(b, 3.0)],
    )
    ab = bench.run_ab("deadbeefcafe")["ab"]
    assert ab["median_ratio"] == 0.5
    assert "FLAT" in ab["verdict"] and "insufficient" in ab["verdict"]


def test_ab_calib_skew_downgrades_directional_verdict(monkeypatch):
    """When the fixed-work cpu probe itself ran 2x apart between the A and
    B sides, a FASTER verdict is box asymmetry, not engine (r15 ADVICE)."""
    a = {f"q{i}": 0.5 for i in range(8)}
    b = {f"q{i}": 1.0 for i in range(8)}
    bench = _stub_ab(
        monkeypatch,
        [_mkrun(a, 4.0, cpu=0.3), _mkrun(a, 4.0, cpu=0.3)],
        [_mkrun(b, 8.0, cpu=0.6), _mkrun(b, 8.0, cpu=0.6)],
    )
    ab = bench.run_ab("deadbeefcafe")["ab"]
    assert ab["calib_ratio_cpu"] == 0.5
    assert "FLAT" in ab["verdict"] and "calib-skewed" in ab["verdict"]


def test_ab_calib_parity_keeps_directional_verdict(monkeypatch):
    """With the probes in agreement the directional verdict still fires."""
    a = {f"q{i}": 0.5 for i in range(8)}
    b = {f"q{i}": 1.0 for i in range(8)}
    bench = _stub_ab(
        monkeypatch,
        [_mkrun(a, 4.0, cpu=0.3), _mkrun(a, 4.0, cpu=0.3)],
        [_mkrun(b, 8.0, cpu=0.31), _mkrun(b, 8.0, cpu=0.31)],
    )
    ab = bench.run_ab("deadbeefcafe")["ab"]
    assert "FASTER" in ab["verdict"]


def test_chunk_documents_values_after_hof_bind(spark):
    """chunk_documents re-tokenized per chunk (O(T^2) HOF bug class, fixed
    r16); pin the exact output against a Python recomputation."""
    from flink_parent_spark.datapipe.text import chunk_documents

    rows = [
        (1, "a b c d e f g h"),
        (2, "x y"),
        (3, "  lone  "),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }

    def expected(text):
        toks = text.strip().split()
        stride = 3
        out = {}
        for ci, s in enumerate(range(0, max(len(toks) - 1, 0) + 1, stride)):
            out[ci] = (" ".join(toks[s:s + 4]), min(len(toks) - s, 4))
        return out

    want = {
        (i, ci): v for i, t in rows for ci, v in expected(t).items()
    }
    assert got == want


def test_pq_codes_subvector_bound_once(spark):
    """_pq_codes binds the query subvector slice as a lambda variable; the
    codes must be unchanged vs a direct argmin recomputation."""
    from flink_parent_spark.datapipe.similarity import _pq_codes

    from pyspark.sql import functions as F

    cb = [
        [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]],
        [[0.0, 1.0], [5.0, 5.0], [1.0, 0.0]],
    ]
    cb_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(f"{v!r}D" for v in code) + ")" for code in cbj
            ) + ")"
            for cbj in cb
        )
        + ")"
    )
    vecs = [
        (1, [0.1, 0.1, 4.9, 5.1]),
        (2, [2.1, 1.9, 0.9, 0.05]),
        (3, [1.0, 1.2, 0.1, 0.9]),
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    got = {
        r["vec_id"]: r["codes"]
        for r in df.select(
            "vec_id", _pq_codes(cb_lit, 2, 2, 3, F.col("embedding")).alias("codes")
        ).collect()
    }

    def argmin(sub, cbj):
        ds = [sum((float(x) - c) ** 2 for x, c in zip(sub, code)) for code in cbj]
        return ds.index(min(ds))

    want = {
        vid: [argmin(v[0:2], cb[0]), argmin(v[2:4], cb[1])] for vid, v in vecs
    }
    assert got == want


def test_pq_adist_table_bit_identical(spark):
    """The per-query ADC table must reproduce the per-pair fold's values
    exactly (same doubles, same left-to-right subspace sum)."""
    from pyspark.sql import functions as F

    from flink_parent_spark.datapipe.similarity import (
        _pq_adist,
        _pq_dtab,
        _pq_sub,
        sqdist,
    )

    cb = [
        [[0.1, -0.2], [1.5, 2.5], [-3.0, 0.25]],
        [[2.0, 0.0], [0.3, -0.7], [1.0, 1.0]],
    ]
    cb_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(f"{v!r}D" for v in code) + ")" for code in cbj
            ) + ")"
            for cbj in cb
        )
        + ")"
    )
    df = spark.createDataFrame(
        [(1, [0.11, 0.33, 0.77, -0.2], [0, 1]), (2, [1.4, 2.4, 1.1, 0.9], [1, 2])],
        "vec_id int, embedding array<float>, codes array<int>",
    )
    # old per-pair fold, reconstructed
    old = None
    for j in range(2):
        term = sqdist(
            _pq_sub(F.col("embedding"), j, 2),
            F.element_at(cb_lit[j], F.col("codes")[j] + 1),
        )
        old = term if old is None else old + term
    out = df.select(
        old.alias("a_old"),
        _pq_adist(
            _pq_dtab(cb_lit, 2, 2, F.col("embedding")), F.col("codes"), 2
        ).alias("a_new"),
    ).selectExpr("sum(CASE WHEN a_old IS DISTINCT FROM a_new THEN 1 ELSE 0 END) AS d")
    assert out.collect()[0]["d"] == 0  # bitwise equality, not epsilon
