"""Focused tests for the r15 optimization-round internals:

- parsed-expression literals (`_lit_d1`/`_lit_d2`) must be bit-identical to
  the per-element F.lit construction they replaced;
- `_best_cells` must rank identically to a direct cosine argmax (the
  norm-precompute rewrite must not move a single ranking);
- `load_tables` memoizes scan *plans* per (session, dir, file-stat
  signature) — same handles on a warm call, invalidation on signature
  change, and views still re-registered every call.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_lit_helpers_bit_identical_to_per_element_lits(spark):
    from flink_parent_spark.datapipe.similarity import _lit_d1, _lit_d2

    vals = [0.1, -0.0, 1.5e-9, 123456.789, 2.0 / 3.0, 1e16, -7.25e-200]
    rows = [vals, [x * 3.0 for x in vals]]
    df = spark.range(1).select(
        _lit_d1(vals).alias("a"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("a_ref"),
        _lit_d2(rows).alias("b"),
        F.array(
            *[F.array(*[F.lit(float(v)) for v in r]) for r in rows]
        ).alias("b_ref"),
    )
    r = df.first()
    # struct-pack to compare exact bits, not repr
    import struct

    def bits(x):
        return struct.pack("<d", x)

    assert [bits(v) for v in r["a"]] == [bits(v) for v in r["a_ref"]]
    assert [[bits(v) for v in row] for row in r["b"]] == [
        [bits(v) for v in row] for row in r["b_ref"]
    ]
    # empty array keeps the declared element type
    assert dict(spark.range(1).select(_lit_d1([]).alias("e")).dtypes)["e"] == (
        "array<double>"
    )


def test_best_cells_matches_direct_cosine_argmax(spark):
    from flink_parent_spark.datapipe.similarity import (
        _best_cells,
        _seq_norm,
        cosine,
    )

    cent = [
        [1.0, 0.25, -0.5, 2.0],
        [0.0, 1.0, 1.0, -1.0],
        [3.5, -0.125, 0.75, 0.5],
    ]
    # _seq_norm is the driver-side twin of norm(): same sequential fold
    for cv in cent:
        acc = 0.0
        for x in cv:
            acc += x * x
        assert _seq_norm(cv) == math.sqrt(acc)

    df = spark.range(0, 200).select(
        F.col("id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double") - 2.0,
            (F.col("id") % 3).cast("double") * 1.5,
            F.lit(1.0),
        ).alias("v"),
    )
    got = df.select(
        "id", _best_cells(cent, F.col("v"), 2).alias("cells")
    ).collect()
    # reference ranking via the plain per-centroid cosine (the pre-r15 form)
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in cent])
    scored = F.zip_with(
        F.transform(cent_arr, lambda cv: cosine(cv, F.col("v"))),
        F.sequence(F.lit(0), F.lit(len(cent) - 1)),
        lambda c, i: F.struct((-c).alias("negc"), i.alias("cell")),
    )
    ref = df.select(
        "id",
        F.transform(
            F.slice(F.sort_array(scored), 1, 2), lambda s: s["cell"]
        ).alias("cells"),
    ).collect()
    assert {r["id"]: list(r["cells"]) for r in got} == {
        r["id"]: list(r["cells"]) for r in ref
    }


def test_load_tables_memoizes_plans_and_invalidates_on_stat_change(
    spark, tmp_path
):
    import shutil

    from flink_parent_spark.tables import load_tables, table_path

    a = load_tables(spark, SF_DIR)
    b = load_tables(spark, SF_DIR)
    # warm call returns the SAME DataFrame handles (plan memo hit)...
    assert all(a[k] is b[k] for k in a)
    # ...and still (re)registers the temp views
    spark.range(1).createOrReplaceTempView("events")
    c = load_tables(spark, SF_DIR)
    assert spark.table("events").columns == c["events"].columns

    # a directory whose file signature changes misses the cache
    d = tmp_path / "sfX"
    d.mkdir()
    shutil.copy(table_path(SF_DIR, "region"), d / "region.parquet")
    first = load_tables(spark, str(d))
    assert first["region"] is load_tables(spark, str(d))["region"]
    import os

    os.utime(d / "region.parquet", ns=(1, 1))
    second = load_tables(spark, str(d))
    assert second["region"] is not first["region"]
    assert second["region"].count() == first["region"].count()


def test_mr_and_or_short_circuit_guarded_division():
    """r15 correctness fix (ADVICE r14, medium): AND/OR compile to lazy
    conditional expressions, so a guarded division must not raise when the
    guard already decides — and the Kleene truth tables must be unchanged."""
    from flink_parent_spark.streaming.match_recognize_sql import (
        _MR_GLOBALS,
        _MrCompiler,
        _and,
        _and_f,
        _or,
        _or_f,
    )

    # lazy completion helpers reproduce the eager Kleene tables exactly
    for a in (True, False, None):
        for b in (True, False, None):
            lazy_and = (
                False if (a is not None and not a) else _and_f(a, b)
            )
            lazy_or = True if (a is not None and a) else _or_f(a, b)
            assert lazy_and == _and(a, b)
            assert lazy_or == _or(a, b)

    # a guard of FALSE must skip the guarded division (the eager form
    # raised ZeroDivisionError here); TRUE guard must evaluate it
    def run(expr_src):
        comp = _MrCompiler(expr_src, "define", set(), dtypes={})
        src, _ = comp.compile()
        return eval(  # noqa: S307 - mirrors the engine's own eval harness
            compile(src, "<t>", "eval"), dict(_MR_GLOBALS), {}
        )

    assert run("1 <> 1 AND 10 / 0 > 1") is False
    assert run("1 = 1 OR 10 / 0 > 1") is True
    with pytest.raises(ZeroDivisionError):
        run("1 = 1 AND 10 / 0 > 1")
    # nested chains: inner walrus names must not clobber outer ones
    assert run("1 = 1 AND (2 = 2 OR 10 / 0 > 1)") is True
    assert run("(1 <> 1 AND 10 / 0 > 1) OR 3 = 3") is True


@pytest.mark.parametrize("n", [2, 3])
def test_token_ngrams_binding_matches_inline_form(spark, n):
    from flink_parent_spark.datapipe.text import token_ngrams, tokens

    df = spark.createDataFrame(
        [("a b c d e",), ("one two",), ("single",), ("",)], ["text"]
    )
    got = df.select(token_ngrams(F.col("text"), n).alias("g")).collect()
    # inline (pre-r15, O(T^2)) form as the semantic reference
    toks = tokens(F.col("text"))
    inline = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ref = df.select(inline.alias("g")).collect()
    assert [list(r["g"]) for r in got] == [list(r["g"]) for r in ref]


def test_ab_symmetric_brackets_void_stalled_queries(monkeypatch):
    """r15 instrument tightening: A-B-A-B symmetric best-of-2 brackets,
    per-query spread voiding, median + IQR. A single B-side host stall
    (the r14 tpcds_q67 case: 35.8 s vs ~5 s typical) must be VOIDED,
    not averaged into the median."""
    import bench

    a_runs = iter(
        [
            {"queries": {"q1": 1.0, "q2": 2.0, "q67": 5.0}, "value": 8.0},
            {"queries": {"q1": 0.9, "q2": 2.1, "q67": 5.2}, "value": 8.2},
        ]
    )
    b_runs = iter(
        [
            {"queries": {"q1": 1.1, "q2": 2.2, "q67": 35.8}, "value": 39.1,
             "calib": {}},
            {"queries": {"q1": 1.0, "q2": 2.0, "q67": 5.1}, "value": 8.1,
             "calib": {}},
        ]
    )
    monkeypatch.setattr(bench, "run_bench", lambda: dict(next(a_runs)))
    monkeypatch.setattr(
        bench, "_bench_other_tree", lambda wt: dict(next(b_runs))
    )
    monkeypatch.setattr(bench, "_stop_active_session", lambda: None)

    import subprocess

    class _Ok:
        returncode = 0

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Ok())
    ab = bench.run_ab("deadbeefcafe")["ab"]
    assert ab["order"] == ["A", "B", "A", "B"]
    # q67's B bracket spread is 35.8/5.1 = 7.0 > AB_VOID_SPREAD -> voided
    assert ab["voided"] == ["q67"]
    assert "q67" not in ab["per_query_ratio"]
    # surviving ratios use best-of-2 on BOTH sides
    assert ab["per_query_ratio"]["q1"] == round(0.9 / 1.0, 3)
    assert ab["per_query_ratio"]["q2"] == round(2.0 / 2.0, 3)
    assert ab["median_ratio"] is not None
    assert "FLAT" in ab["verdict"] or "FASTER" in ab["verdict"]
