"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query timing includes full execution to a count() action (result
materialization without driver-side collection). A warmup query runs first so
JVM/codegen startup isn't billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Module-level pandas import: the python_probe pandas UDF must NOT rely on a
# function-local import — `from __future__ import annotations` stringifies the
# UDF type hints, and pyspark resolves them against module globals, so a local
# `import pandas as pd` yields UNSUPPORTED_SIGNATURE (the r08 bench crash).
# Guarded so a pandas-less host still runs the cpu/shuffle probes and queries.
try:
    import pandas as pd  # noqa: F401
except ImportError:  # pragma: no cover - pandas is baked into this container
    pd = None

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_parent_spark.queries.catalog import all_queries  # noqa: E402
from flink_parent_spark.session import get_spark  # noqa: E402

# Headline set: representative of each operator family; kept stable across
# rounds so BENCH_r{N}.json files are comparable.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "over_rank_functions",
    "window_session_30m_per_user",
    "topn_orders_per_customer",
    "dedup_minhash_lsh_pairs",
    "ann_cosine_topk_bruteforce",
    "text_quality_scores",
    # round-2 additions (new operator families; earlier entries unchanged
    # so per-query numbers stay comparable across rounds)
    "tpcds_channel_union_rollup",
    "tpcds_multi_distinct_year",
    "ann_cosine_topk_ivf_kmeans",
    "window_session_dynamic_gap",
    # round-5 additions
    "ann_ivf_pq_topk",
    "tpcds_returns_anti_join",
]

# Round-7 additions: REAL TPC-DS texts at the SF1-equivalent generated
# dataset (~3M store_sales lines, tpcds_data.BENCH_SCALE) — one per plan
# family: star-agg (q3), 3-channel INTERSECT + rollup (q14), widest
# self-join (q64), rollup+rank (q67). Appended at the end so the existing
# 20 per-query numbers stay comparable across rounds. These ignore sf_dir
# (the TPC-DS dataset has its own scale axis).
TPCDS_SCALED = ["tpcds_q3", "tpcds_q14", "tpcds_q64", "tpcds_q67"]
HEADLINE += [f"{n}_sf1" for n in TPCDS_SCALED]

# Round-7 additions (second batch, appended): the newest LLM-pipeline
# operators — exact duplicated-substring spans (all-grams inverted index)
# and the PII scrub (pure codegen regexp chain).
HEADLINE += ["dedup_duplicated_spans", "text_pii_redaction"]

# Round-7 additions (third batch, appended): DSIR importance scoring
# (hashed n-gram target/source models, arXiv:2302.03169).
HEADLINE += ["text_dsir_scores"]

# Resource class per headline entry, for the mix-weighted normalization
# (r12; BASELINE.md "Cross-round comparison rule"). Assigned empirically
# from the r10->r11 cross-VM observation, where the three probes moved
# very differently (cpu +13%, shuffle +32%, python -39%) and every
# headline entry's raw ratio clustered on the probe of its dominant
# resource: entries >=1.23 track the shuffle probe, the rest track cpu
# (no headline entry tracked the python probe — the Arrow-path entries
# are cpu-dominated mixes at this SF). value_norm_mix divides each
# class subtotal by ITS OWN probe, so a machine with a slow shuffle path
# no longer shows a spurious engine regression (the r11 +5.9% artifact).
RESOURCE_CLASS = {
    q: "shuffle"
    for q in (
        "tpch_q1", "tpch_q3", "tpch_q5", "tpcds_q14_sf1", "tpcds_q64_sf1",
        "ann_cosine_topk_ivf_kmeans", "ann_ivf_pq_topk",
    )
}  # default: "cpu"


def _sweep_tmp_litter() -> int:
    """Remove this repo's ephemeral /tmp state (stream-run checkpoints,
    stream-source symlink dirs) before timing anything. Accumulated
    litter from prior test/bench runs measurably skews the python probe:
    with ~1700 stale checkpoint/fps_* entries in /tmp the probe's median
    drifted 0.44 -> 1.08 s across consecutive r10 runs and its trimmed
    spread blew past the 1.40 void bar; sweeping restored 0.44 s at
    spread 1.10. Only this repo's regenerable dirs are touched: every
    checkpoint the repo writes is namespaced `fps_*` (r11 — the old
    generic `ckpt_*` prefix could match unrelated processes' state on a
    shared machine, so it is no longer swept or written)."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    tmp = tempfile.gettempdir()
    n = 0
    for name in os.listdir(tmp):
        if name.startswith(("fps_ckpt_", "fps_qstate_", "fps_spapi_",
                            "fps_stream_src", "fps_chlog_",
                            "fps_warehouse", "fps_derby")):
            shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)
            n += 1
    return n


def run_bench() -> dict:
    """One full measurement pass; returns the output dict (main prints it)."""
    _sweep_tmp_litter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("bench")
    qs = all_queries()

    from flink_parent_spark.queries.tpcds_data import BENCH_SCALE, ensure_tpcds
    from flink_parent_spark.queries.tpcds_real import run_tpcds_at_scale

    for n in TPCDS_SCALED:
        qs[f"{n}_sf1"] = (
            lambda spark, sf_dir, _n=n: run_tpcds_at_scale(spark, _n, BENCH_SCALE)
        )

    # Warmup: run every headline query once at the smallest scale factor —
    # JITs/codegens each code path (scan, join, agg, window, hash, fold)
    # without touching the measured dataset, so steady-state throughput is
    # what gets measured rather than first-call compilation.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        if name.endswith("_sf1"):
            # warm the scaled TPC-DS texts on the qualification dataset
            # (same plans, tiny data) instead of running the full-volume
            # query as warmup
            try:
                run_tpcds_at_scale(spark, name[:-4], 1.0).count()
            except Exception:
                pass
        elif name in qs:
            try:
                qs[name](spark, warm_dir).count()
            except Exception:
                pass
    qs["tpch_q6"](spark, sf_dir).count()  # touch the measured tables' footers
    ensure_tpcds(BENCH_SCALE)  # generation time billed here, not to q3

    # Two timed runs per query, report the best: the first run at full scale
    # still pays JVM tiered-compilation (C2) of the generated code, which
    # tiny-scale warmup cannot trigger; steady-state throughput is the
    # comparable number.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        # Incremental progress on stderr (stdout stays ONE JSON line): if a
        # later section crashes, the per-query measurements are not lost.
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # VM-speed calibration: fixed, data-independent Spark jobs timed the
    # same way as the headline queries. Wall-times vary 20-60% between
    # benchmark hosts; the probes separate engine changes from machine
    # changes. r07 showed ONE CPU-codegen scalar (best-of-3) is not a
    # trustworthy instrument (it swung 27% while raw query times moved
    # <12%), so since r08 there are THREE probes — one per resource class
    # the headline queries are bound by — each the MEDIAN of 5 runs with
    # the full distribution emitted (BASELINE.md "Cross-round comparison
    # rule"). Not part of `value`.
    def probe(fn, n=5):
        runs = []
        for _ in range(n):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        s = sorted(runs)
        # trimmed = drop min and max, median of the rest: a warm-but-busy VM
        # routinely shows one outlier run; the r08 judge observed all three
        # probes exceeding a 15% raw max/min spread on a real host, so the
        # stability clause (BASELINE.md) is now evaluated on the trimmed runs.
        trimmed = s[1:-1] if len(s) >= 3 else s
        return {
            "median": s[len(s) // 2],
            "trimmed_median": trimmed[len(trimmed) // 2],
            "trimmed_spread": round(trimmed[-1] / trimmed[0], 3)
            if trimmed[0] > 0
            else None,
            "runs": runs,
        }

    def cpu_probe():
        # pure whole-stage-codegen arithmetic, no I/O, no exchange
        spark.range(0, 2_000_000_000, 1, 32).selectExpr("sum(id * 3 % 7)").collect()

    def shuffle_probe():
        # exchange-bound: 64M rows hashed into 4M groups across 32 tasks
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "id % 4000000 AS k"
        ).groupBy("k").count().selectExpr("sum(count)").collect()

    def python_probe():
        # Python-worker/Arrow-bound: pandas UDF over 4M rows. Built with the
        # (func, returnType) form — no type hints — so it is immune to the
        # annotations-stringification failure that killed BENCH_r08.
        from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

        _f = pandas_udf(lambda x: x * 1.5 + 1.0, "double")
        spark.range(0, 4_000_000, 1, 32).select(_f("id").alias("y")).selectExpr(
            "sum(y)"
        ).collect()

    # Each probe independently fail-safe: a broken probe emits null for its
    # key instead of discarding the (already-measured) query timings.
    probe_fns = {
        "cpu": cpu_probe,
        "shuffle": shuffle_probe,
        "python": python_probe,
    }
    calib = {}
    for key, fn in probe_fns.items():
        try:
            fn()  # one untimed warmup (codegen / UDF worker spin-up)
            calib[key] = probe(fn)
        except Exception as exc:  # noqa: BLE001
            print(f"[bench] probe {key} failed: {exc}", file=sys.stderr)
            calib[key] = None

    # BASELINE.md void clause: trimmed_spread > 1.40 voids a probe. A
    # BENCH file whose mix divides by a void probe is non-adjudicable
    # (the r12 driver file), so any MIX-RELEVANT void probe is retried
    # once; if still void the file stamps itself "mix_adjudicable":
    # false instead of silently recording a headline no one can grade.
    VOID_SPREAD = 1.40
    mix_classes = {RESOURCE_CLASS.get(n, "cpu") for n in timings}
    probes_retried = []

    def _is_void(c) -> bool:
        return c is None or (
            c["trimmed_spread"] is not None and c["trimmed_spread"] > VOID_SPREAD
        )

    for key in sorted(mix_classes):
        if _is_void(calib.get(key)):
            probes_retried.append(key)
            print(
                f"[bench] probe {key} void "
                f"(spread {calib[key]['trimmed_spread'] if calib.get(key) else 'n/a'});"
                " retrying once",
                file=sys.stderr,
            )
            try:
                retry = probe(probe_fns[key])
                old = calib.get(key)

                def _spread(c) -> float:
                    # None = unmeasurable -> worst; a true 0.0 spread is a
                    # perfect measurement and must NOT read as missing
                    s = c["trimmed_spread"]
                    return 9e9 if s is None else s

                # keep whichever run is adjudicable / tighter
                if old is None or _is_void(old) or _spread(retry) < _spread(old):
                    calib[key] = retry
            except Exception as exc:  # noqa: BLE001
                print(f"[bench] probe {key} retry failed: {exc}", file=sys.stderr)
    mix_adjudicable = not any(_is_void(calib.get(k)) for k in mix_classes)

    # continuity with r06/r07 BENCH files
    calib_sec = calib["cpu"]["median"] if calib.get("cpu") else None

    total = round(sum(timings.values()), 3)

    # Mix-weighted normalization: per-resource normalized subtotals —
    # each class's wall-time subtotal divided by its own probe's trimmed
    # median, summed. Self-adjudicating across hosts whose resource paths
    # scale differently (see RESOURCE_CLASS note above). Falls back to
    # the cpu probe for a class whose probe failed.
    subtotals: dict[str, float] = {}
    for name, t in timings.items():
        subtotals.setdefault(RESOURCE_CLASS.get(name, "cpu"), 0.0)
        subtotals[RESOURCE_CLASS.get(name, "cpu")] += t

    def _probe_med(cls: str) -> float | None:
        c = calib.get(cls) or calib.get("cpu")
        return c["trimmed_median"] if c else None

    value_norm_mix = None
    norm_subtotals = None
    if all(_probe_med(c) for c in subtotals):
        norm_subtotals = {
            c: round(s / _probe_med(c), 2) for c, s in subtotals.items()
        }
        value_norm_mix = round(sum(norm_subtotals.values()), 2)

    out = {
        "metric": "headline_query_wall_time_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_sec": calib_sec,
        "calib": calib,
        # Calibration-normalized values (dimensionless multiples of the
        # fixed-work CPU probe). Cross-round verdicts need BOTH a
        # value_norm shift AND corroborating per-query RAW shifts, with
        # the probe distributions stable — see BASELINE.md.
        "value_norm": round(total / calib_sec, 2) if calib_sec else None,
        # r12: mix-weighted normalization (dimensionless; sum of per-
        # resource-class subtotals each divided by its own probe's
        # trimmed median). This is the cross-round comparable headline.
        "value_norm_mix": value_norm_mix,
        # r13: self-declared adjudicability — False when any probe a mix
        # subtotal divides by is still void (trimmed_spread > 1.40) after
        # one retry. A False file's value_norm_mix must not be used as a
        # round headline (BASELINE.md void clause).
        "mix_adjudicable": mix_adjudicable,
        "probes_retried": probes_retried,
        "norm_subtotals": norm_subtotals,
        "resource_split_sec": {k: round(v, 3) for k, v in subtotals.items()},
        "queries_norm": {
            k: round(v / calib_sec, 2) for k, v in timings.items()
        }
        if calib_sec
        else None,
    }
    return out


def _stop_active_session() -> None:
    from pyspark.sql import SparkSession  # noqa: PLC0415

    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()


def _bench_other_tree(worktree: str) -> dict:
    """Run the OTHER tree's own bench.py as a subprocess (its bench.py puts
    its own directory first on sys.path, so its package resolves from the
    worktree) and parse the one-line JSON from stdout."""
    import subprocess  # noqa: PLC0415

    p = subprocess.run(
        [sys.executable, os.path.join(worktree, "bench.py")],
        cwd=worktree,
        capture_output=True,
        text=True,
        timeout=3600,
        check=False,
    )
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"baseline bench failed (rc={p.returncode}): {p.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


AB_VOID_SPREAD = 2.0  # per-query bracket max/min above this voids the ratio
# A/B cpu-probe ratio band outside which a directional verdict downgrades
# to FLAT: the probe runs fixed work, so a ratio this far from 1.0 means
# the box itself ran the two sides at different speeds (r15 ADVICE)
AB_CALIB_TOLERANCE = (0.8, 1.25)


def run_ab(commit: str) -> dict:
    """Same-sitting A/B against a pinned prior tree (BASELINE.md
    "Cross-round comparison rule"): the headline set runs interleaved
    A-B-A-B — this tree and the `commit` tree alternating in git
    worktrees on one box in one sitting — and the per-query ratio
    min(A1,A2)/min(B1,B2) is the engine signal. Motivation:
    value_norm_mix moved 1.75x between sittings on IDENTICAL code (r13
    judge, all probes valid); probes calibrate within a sitting, not
    across them, so the same-sitting two-tree A/B is the official
    cross-round engine verdict.

    r15 instrument tightening (the r14 A-B-A design read 0.855 and 1.06
    on identical headline code — both "verdicts" were noise): brackets
    are now SYMMETRIC (best-of-2 on BOTH sides — r14 gave A best-of-2
    vs a single B bracket, so one B-side host stall inflated that
    query's ratio with nothing to absorb it), per-query ratios whose
    bracket spread (max/min across the two readings of EITHER side)
    exceeds AB_VOID_SPREAD are VOIDED rather than averaged into the
    median (the r14 file's tpcds_q67 B-stall at 35.8 s vs ~5 s typical
    is the motivating case), and the output carries the median AND the
    IQR of the surviving ratios so a 1.06 median with IQR straddling
    1.0 reads as "flat within noise", not "SLOWER".

    Output = the final A bracket's normal bench dict plus an "ab" block
    (per-query ratios + spreads, voided list, median, IQR, movers,
    verdict line)."""
    import statistics  # noqa: PLC0415
    import subprocess  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = os.path.join(
        tempfile.gettempdir(), f"fps_ab_{os.getpid()}_{commit[:8]}"
    )
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, commit],
        check=True,
        capture_output=True,
    )
    try:
        a1 = run_bench()
        _stop_active_session()  # free the JVM before the B bracket's JVM
        b1 = _bench_other_tree(wt)
        a2 = run_bench()
        _stop_active_session()
        b2 = _bench_other_tree(wt)
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )

    def _best_and_spread(r1: dict, r2: dict) -> tuple[dict, dict]:
        best, spread = {}, {}
        for q in set(r1) | set(r2):
            vals = [v for v in (r1.get(q), r2.get(q)) if v]
            if not vals:
                continue
            best[q] = min(vals)
            spread[q] = (
                round(max(vals) / min(vals), 3) if min(vals) > 0 else None
            )
        return best, spread

    a_q, a_spread = _best_and_spread(a1["queries"], a2["queries"])
    b_q, b_spread = _best_and_spread(
        b1.get("queries", {}), b2.get("queries", {})
    )
    common = sorted(set(a_q) & set(b_q))
    ratios, voided = {}, []
    for q in common:
        if b_q[q] <= 0:
            continue
        r = round(a_q[q] / b_q[q], 3)
        sa, sb = a_spread.get(q), b_spread.get(q)
        if (sa is not None and sa > AB_VOID_SPREAD) or (
            sb is not None and sb > AB_VOID_SPREAD
        ):
            voided.append(q)
        else:
            ratios[q] = r
    med = round(statistics.median(ratios.values()), 3) if ratios else None
    iqr = None
    if len(ratios) >= 4:
        qs_sorted = statistics.quantiles(ratios.values(), n=4)
        iqr = [round(qs_sorted[0], 3), round(qs_sorted[2], 3)]
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    iqr_s = f", IQR {iqr}" if iqr else ""
    # Bracket-level asymmetry check (r15 ADVICE): a directional verdict is
    # only trustworthy when the two sides' FIXED-WORK probes agree — a box
    # that ran one side's calibration 2x slower moved every query on that
    # side too, and per-query spread voiding cannot see it (both readings
    # of a side stall together). The cpu probe is the steadiest (r14/r15
    # trimmed spreads ~1.02 vs 1.5+ for shuffle/python), so it is the gate.
    def _calib_med(r1: dict, r2: dict, probe: str):
        vals = [
            (r or {}).get("calib", {}).get(probe, {}).get("median")
            for r in (r1, r2)
        ]
        vals = [v for v in vals if v]
        return min(vals) if vals else None

    calib_ratio = None
    a_cpu = _calib_med(a1, a2, "cpu")
    b_cpu = _calib_med(b1, b2, "cpu")
    if a_cpu and b_cpu:
        calib_ratio = round(a_cpu / b_cpu, 3)
    calib_skewed = calib_ratio is not None and not (
        AB_CALIB_TOLERANCE[0] <= calib_ratio <= AB_CALIB_TOLERANCE[1]
    )
    if med is None:
        verdict = "no comparable queries"
    elif iqr is None:
        # <4 surviving ratios (heavy voiding): a bare median of up to 3
        # points is not a directional verdict (r15 ADVICE)
        verdict = (
            f"engine FLAT (insufficient data: {len(ratios)} surviving "
            f"ratios): median per-query ratio {med} vs {commit[:8]}"
        )
    elif calib_skewed:
        verdict = (
            f"engine FLAT (calib-skewed: cpu probe A/B ratio {calib_ratio} "
            f"outside {AB_CALIB_TOLERANCE}): median per-query ratio "
            f"{med}{iqr_s} vs {commit[:8]}"
        )
    elif med <= 0.95 and iqr[1] < 1.0:
        verdict = (
            f"engine FASTER: median per-query ratio {med}{iqr_s} vs {commit[:8]}"
        )
    elif med >= 1.05 and iqr[0] > 1.0:
        verdict = (
            f"engine SLOWER: median per-query ratio {med}{iqr_s} vs {commit[:8]}"
        )
    else:
        # median inside [0.95, 1.05], or outside it with the IQR still
        # straddling 1.0 (a shifted median inside a noise band that wide
        # is not an engine verdict)
        verdict = (
            f"engine FLAT: median per-query ratio {med}{iqr_s} vs {commit[:8]}"
        )
    out = a2
    out["ab"] = {
        "baseline_commit": commit,
        "order": ["A", "B", "A", "B"],
        "void_spread": AB_VOID_SPREAD,
        "a_queries_best": a_q,
        "b_queries_best": b_q,
        "a_spread": a_spread,
        "b_spread": b_spread,
        "voided": voided,
        # default=None: a degraded B run (both brackets missing 'value')
        # must not crash after all four brackets have been paid for
        "b_value": min(
            (v for v in (b1.get("value"), b2.get("value")) if v is not None),
            default=None,
        ),
        "calib_ratio_cpu": calib_ratio,
        "b_calib": b2.get("calib"),
        "per_query_ratio": ratios,
        "median_ratio": med,
        "iqr": iqr,
        "best_mover": movers[0] if movers else None,
        "worst_mover": movers[-1] if movers else None,
        "verdict": verdict,
    }
    print(f"[bench] A/B {verdict}", file=sys.stderr)
    return out


def main() -> None:
    argv = sys.argv[1:]
    if "--ab" in argv:
        commit = argv[argv.index("--ab") + 1]
        out = run_ab(commit)
    else:
        out = run_bench()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
