"""Property-based tests (hypothesis): operators vs independent pandas/python
reference implementations on randomized inputs — the generative complement
to the fixed-fixture oracle suite."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

T0 = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),  # key
        st.integers(0, 5000),  # ts offset seconds
        st.integers(-100, 100),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(**SETTINGS)
@given(events_strategy)
def test_asof_join_matches_merge_asof(spark, rows):
    left = pd.DataFrame(
        [
            {"k": k, "lts": T0 + dt.timedelta(seconds=s), "lid": i}
            for i, (k, s, _) in enumerate(rows)
        ]
    )
    right = pd.DataFrame(
        [
            {"k": k, "rts": T0 + dt.timedelta(seconds=s + 17), "rv": v, "rid": i}
            for i, (k, s, v) in enumerate(rows)
        ]
    )
    # unique (k, rts) on the right: merge_asof and our operator then agree
    # deterministically (versioned-table primary-key contract)
    right = right.sort_values(["k", "rts", "rid"]).drop_duplicates(["k", "rts"], keep="last")

    from flink_parent_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join(
            ldf, rdf, [("k", "k")], "lts", "rts", {"rv": "rv", "rid": "rid"}
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    expected = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable")[["k", "rts", "rv", "rid"]],
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    assert list(got["rid"].fillna(-1)) == list(expected["rid"].fillna(-1))
    assert list(got["rv"].fillna(-999)) == list(expected["rv"].fillna(-999))


@settings(**SETTINGS)
@given(events_strategy, st.integers(1, 4))
def test_top_n_matches_pandas(spark, rows, n):
    pdf = pd.DataFrame(
        [{"k": k, "v": v, "i": i} for i, (k, _, v) in enumerate(rows)]
    )
    from flink_parent_spark.operators.rank import top_n

    df = spark.createDataFrame(pdf)
    got = (
        top_n(df, ["k"], [F.col("v").desc(), F.col("i")], n)
        .toPandas()
        .sort_values(["k", "rn"])
    )
    exp = (
        pdf.sort_values(["v", "i"], ascending=[False, True], kind="stable")
        .groupby("k")
        .head(n)
        .sort_values(["k", "v", "i"], ascending=[True, False, True])
    )
    assert list(got["i"]) == list(exp["i"])


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).map(str.strip).filter(bool),
        min_size=1,
        max_size=15,
    )
)
def test_cep_next_matches_reference_scan(spark, seqs):
    """Strict-contiguity pattern a-next-b over random 'a'/'b' token rows
    equals a linear python scan with skip-past-last."""
    from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern

    rows = [
        {"k": 0, "id": i, "ts": T0 + dt.timedelta(seconds=i), "t": tok}
        for i, s in enumerate(seqs)
        for tok in [("a" if s.startswith("a") else "b")]
    ]
    pat = (
        Pattern.begin("x").where(lambda r: r["t"] == "a")
        .next("y").where(lambda r: r["t"] == "b")
    )
    got = pat.find_matches(rows, "ts", AfterMatchSkip.SKIP_PAST_LAST)
    # reference: linear scan
    exp, i = [], 0
    while i < len(rows) - 1:
        if rows[i]["t"] == "a" and rows[i + 1]["t"] == "b":
            exp.append([("x", i), ("y", i + 1)])
            i += 2
        else:
            i += 1
    assert got == exp


@given(st.lists(st.integers(-5, 5), min_size=2, max_size=80))
@settings(max_examples=100, deadline=None)
def test_cep_v_dip_matches_islands_model(vals):
    """Pure-matcher property: the PREV-navigation V-pattern (STRT DOWN+ UP,
    NO_SKIP, greedy descent) finds exactly the maximal descending runs
    followed by a rising step — checked against an independent run-scan."""
    from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern

    rows = [
        {"id": i, "ts": T0 + dt.timedelta(seconds=10 * i), "v": float(v)}
        for i, v in enumerate(vals)
    ]
    pat = (
        Pattern.begin("strt")
        .where(lambda r, c: c.prev("v") is None or r["v"] >= c.prev("v"))
        .next("down")
        .where(lambda r, c: c.prev("v") is not None and r["v"] < c.prev("v"))
        .one_or_more()
        .consecutive()
        .greedy()
        .next("up")
        .where(lambda r, c: c.prev("v") is not None and r["v"] > c.prev("v"))
    )
    got = [
        [idx for _, idx in m]
        for m in pat.find_matches(rows, "ts", AfterMatchSkip.NO_SKIP)
    ]

    # independent model: scan maximal descending runs
    expect = []
    i = 1
    n = len(vals)
    while i < n:
        if vals[i] < vals[i - 1] and (i == 1 or vals[i - 1] >= vals[i - 2]):
            j = i
            while j + 1 < n and vals[j + 1] < vals[j]:
                j += 1
            if j + 1 < n and vals[j + 1] > vals[j]:
                expect.append(list(range(i - 1, j + 2)))
            i = j + 1
        else:
            i += 1
    assert got == expect


@given(st.lists(st.integers(-5, 5), min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_cep_prev_next_agree_with_shifts(vals):
    """ctx.prev/ctx.next equal pandas shift(1)/shift(-1) at every match."""
    from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern

    rows = [
        {"id": i, "ts": T0 + dt.timedelta(seconds=10 * i), "v": float(v)}
        for i, v in enumerate(vals)
    ]
    pat = Pattern.begin("a").where(
        lambda r, c: c.prev("v") is not None
        and c.next("v") is not None
        and c.prev("v") <= r["v"] <= c.next("v")
    )
    got = {m[0][1] for m in pat.find_matches(rows, "ts", AfterMatchSkip.NO_SKIP)}
    s = pd.Series([float(v) for v in vals])
    prev, nxt = s.shift(1), s.shift(-1)
    expect = {
        i
        for i in range(len(vals))
        if pd.notna(prev[i]) and pd.notna(nxt[i]) and prev[i] <= s[i] <= nxt[i]
    }
    assert got == expect


# --- minhash affine family vs independent Python model ----------------------


def _py_token_hash64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_minhash_signature_matches_python_model(spark):
    """_sig_array (Catalyst array expressions) must equal an independently
    written Python model of the same family: md5-based shingle hashes,
    affine permutations mod 2^31-1, min per permutation. Also covers the
    short-document guard (docs with < n tokens drop out)."""
    import re

    from pyspark.sql import functions as F

    from flink_parent_spark.datapipe.dedup import (
        MINHASH_P,
        minhash_coeffs,
        minhash_signatures,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the dog"),
        (3, "short doc"),          # < 3 tokens -> no signature row
        (4, "  spaced   out   tokens   here  "),
        (5, "a a a a a"),           # duplicate shingles
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["perm"]): r["minhash"]
        for r in minhash_signatures(df, "text", "doc_id", n=3, k=8).collect()
    }

    a, b = minhash_coeffs(8)
    expect = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip())
        if len(toks) < 3 or toks == [""]:
            continue
        shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        hs = [_py_token_hash64(s) % MINHASH_P for s in shingles]
        for i in range(8):
            expect[(doc_id, i)] = min((a[i] * h + b[i]) % MINHASH_P for h in hs)
    assert got == expect


@given(
    st.lists(st.sampled_from(["a", "b", "x"]), min_size=1, max_size=12)
)
@settings(max_examples=200, deadline=None)
def test_cep_followed_by_any_matches_bruteforce(seq):
    """followedByAny over random token sequences equals the brute-force
    pair enumeration: every (first a, any later b) pair, scanned from
    every start under NO_SKIP."""
    from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern

    rows = [
        {"id": i, "ts": T0 + dt.timedelta(seconds=10 * i), "t": tok}
        for i, tok in enumerate(seq)
    ]
    pat = (
        Pattern.begin("a").where(lambda r: r["t"] == "a")
        .followed_by_any("b").where(lambda r: r["t"] == "b")
    )
    got = [
        (m[0][1], m[1][1])
        for m in pat.find_matches(rows, "ts", AfterMatchSkip.NO_SKIP)
    ]
    expect = [
        (i, j)
        for i in range(len(seq))
        if seq[i] == "a"
        for j in range(i + 1, len(seq))
        if seq[j] == "b"
    ]
    assert sorted(got) == sorted(expect)


@given(
    st.lists(
        st.tuples(st.sampled_from(["U", "D"]), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=150, deadline=None)
def test_changelog_normalize_matches_python_fold(ops):
    """The changelog-normalize emission rules equal a direct fold over the
    op sequence (single key): +I on first version, -U/+U on change, -D only
    when present, deletes of absent keys dropped."""
    cur = None
    expect = []
    for kind, v in ops:
        if kind == "U":
            if cur is None:
                expect.append(("+I", v))
            else:
                expect.append(("-U", cur))
                expect.append(("+U", v))
            cur = v
        else:
            if cur is not None:
                expect.append(("-D", cur))
                cur = None

    # drive the SHIPPED rules (the operator's pure state-machine step)
    from flink_parent_spark.streaming import changelog as cl

    emitted = []
    cur2 = None
    for kind, v in ops:
        k = cl.UPDATE_AFTER if kind == "U" else cl.DELETE
        cur2, steps = cl.normalize_step(cur2, k, v)
        emitted.extend((sk, vals) for sk, vals, _sub in steps)
    assert emitted == expect


def test_pq_encoding_matches_numpy_model(spark):
    """PQ encode (nested HOF Catalyst expressions) equals an independent
    numpy model: per-subspace argmin squared-L2 against seeded codebooks,
    ordinal tiebreak."""
    import numpy as np

    from flink_parent_spark.datapipe.similarity import pq_topk
    from flink_parent_spark.tables import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    e = t["embeddings"]
    got = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["adist"])
        for r in pq_topk(e.filter("vec_id < 3"), e, k=3, m=4, ks=4, allow_full_scan=True).collect()
    }

    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    seeds = [vecs[r["vec_id"]] for r in rows[:4]]
    m, sub = 4, 16

    def codes(v):
        out = []
        for j in range(m):
            d = [
                float(np.sum((v[j * sub : (j + 1) * sub] - s[j * sub : (j + 1) * sub]) ** 2))
                for s in seeds
            ]
            out.append(min(range(4), key=lambda c: (d[c], c)))
        return out

    enc = {i: codes(v) for i, v in vecs.items()}
    expect = {}
    for qid in (0, 1, 2):
        scored = []
        for cid, v in vecs.items():
            if cid == qid:
                continue
            ad = 0.0
            for j in range(m):
                cw = seeds[enc[cid][j]][j * sub : (j + 1) * sub]
                ad += float(np.sum((vecs[qid][j * sub : (j + 1) * sub] - cw) ** 2))
            scored.append((ad, cid))
        scored.sort()
        for rank, (ad, cid) in enumerate(scored[:3], start=1):
            expect[(qid, rank)] = (cid, ad)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in expect.items()}
    for k in got:
        assert abs(got[k][1] - expect[k][1]) < 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("VPX"), min_size=0, max_size=14))
def test_permute_alternation_matches_greedy_pairing_model(seq):
    """find_matches_any over the PERMUTE(V, P) expansion == the sequential
    greedy-pairing model (scan left to right; any adjacent heterogeneous
    V/P pair matches and consumes both rows under SKIP PAST LAST ROW)."""
    from flink_parent_spark.streaming.cep import (
        AfterMatchSkip,
        Pattern,
        find_matches_any,
    )

    rows_ = [
        {"id": i, "ts": T0 + dt.timedelta(seconds=10 * i), "t": t}
        for i, t in enumerate(seq)
    ]

    def stage(name, want):
        return lambda r, w=want: r["t"] == w

    vp = (
        Pattern.begin("v").where(stage("v", "V")).next("p").where(stage("p", "P"))
    )
    pv = (
        Pattern.begin("p").where(stage("p", "P")).next("v").where(stage("v", "V"))
    )
    got = find_matches_any([vp, pv], rows_, "ts", AfterMatchSkip.SKIP_PAST_LAST)
    got_pairs = [(m[0][1], m[1][1]) for m in got]

    model = []
    i = 0
    while i + 1 < len(seq):
        if {seq[i], seq[i + 1]} == {"V", "P"}:
            model.append((i, i + 1))
            i += 2
        else:
            i += 1
    assert got_pairs == model
    # stage labels attach to the right rows regardless of order
    for m in got:
        for name, idx in m:
            assert seq[idx] == name.upper()


def test_full_scan_ann_baselines_are_fenced(spark):
    """The brute-force corpus x queries paths must not run by accident at
    scale: cosine_topk without block_col and plain pq_topk raise unless
    the caller opts in with allow_full_scan=True (round-5 verdict #3)."""
    import pytest

    from flink_parent_spark.datapipe.similarity import cosine_topk, pq_topk

    e = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="full"):
        cosine_topk(e, e, k=2)
    with pytest.raises(ValueError, match="full"):
        pq_topk(e, e, k=2, m=2, ks=2)
    # explicit opt-in still runs
    assert cosine_topk(e, e, k=2, allow_full_scan=True).count() > 0


def test_jdbc_lookup_cache_lru_ttl_properties():
    """Cache-policy properties of JdbcLookupFunction without a database:
    a fake fetch counts round trips; LRU order, TTL expiry, and negative
    caching must hold for arbitrary probe sequences."""
    from flink_parent_spark.sources.connectors import JdbcLookupFunction

    fn = JdbcLookupFunction.__new__(JdbcLookupFunction)
    from collections import OrderedDict

    clock = [0.0]
    fn.cache_max_rows = 3
    fn.cache_ttl = 10
    fn._clock = lambda: clock[0]
    fn._cache = OrderedDict()
    fn.queries = []
    fetched = []

    def fake_fetch(keys):
        fetched.append(list(keys))
        fn.queries.append(str(keys))
        return {k: {"v": k * 10} for k in keys if k < 100}

    fn._fetch = fake_fetch

    out = fn.lookup([1, 2, 3])
    assert out == {1: {"v": 10}, 2: {"v": 20}, 3: {"v": 30}}
    assert fetched == [[1, 2, 3]]
    # full hit: no fetch
    fn.lookup([3, 2, 1])
    assert len(fetched) == 1
    # LRU: inserting 4 evicts the least-recently-USED (1 was touched last
    # probe via move_to_end order 3,2,1 -> LRU is 3)
    fn.lookup([4])
    assert len(fn._cache) == 3 and 3 not in fn._cache
    fn.lookup([3])
    assert fetched[-1] == [3]
    # TTL: advance past expiry; everything refetches
    clock[0] = 11.0
    fn.lookup([4])
    assert fetched[-1] == [4]
    # negative cache: miss (>=100) cached as None without refetch
    assert fn.lookup([100])[100] is None
    n = len(fetched)
    assert fn.lookup([100])[100] is None and len(fetched) == n


def test_punctuated_watermark_monotone_property():
    """punctuated_replay's clock math is monotone for any interleaving of
    punctuation and periodic signals (generator semantics without Spark:
    the same candidate-max fold on synthetic rows)."""
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        (t0 + dtm.timedelta(seconds=s), marker)
        for s, marker in [
            (0, None), (5, t0 + dtm.timedelta(minutes=5)), (10, None),
            (3, None),  # late vs punctuated wm
            (400, None), (200, t0 + dtm.timedelta(seconds=100)),  # stale marker
        ]
    ]
    wm = None
    trace = []
    delay = dtm.timedelta(seconds=30)
    for ts, marker in rows:
        if wm is not None and ts <= wm:
            trace.append(("late", ts))
            continue
        cands = [ts - delay]
        if marker is not None:
            cands.append(marker)
        if wm is not None:
            cands.append(wm)
        wm = max(cands)
        trace.append(("ok", wm))
    wms = [w for k, w in trace if k == "ok"]
    assert all(a <= b for a, b in zip(wms, wms[1:]))  # never regresses
    assert ("late", t0 + dtm.timedelta(seconds=3)) in trace
    # a stale marker behind the current watermark cannot pull it back
    assert wms[-1] >= t0 + dtm.timedelta(seconds=370)


def test_line_dedup_first_occurrence_semantics(spark):
    """CCNet line dedup: a repeated line survives only at its globally
    smallest (id, position); docs reassemble in position order; a doc whose
    every line was seen earlier keeps empty text."""
    from flink_parent_spark.datapipe.dedup import line_dedup

    docs = [
        (1, "alpha beta\nshared line\ngamma"),
        (2, "shared line\ndelta"),
        (3, "shared line"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            df, "text", "doc_id", split_pattern=r"\n"
        ).collect()
    }
    assert out[1]["text"] == "alpha beta shared line gamma"
    assert out[1]["n_dropped"] == 0
    assert out[2]["text"] == "delta" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "" and out[3]["n_dropped"] == 1
    assert out[3]["n_lines"] == 1


def test_bloom_incremental_matches_exact_membership(spark):
    """Bloom incremental dedup: exact duplicates are always flagged (no
    false negatives), and at a generous m the flag set equals exact
    membership; shrinking m only ever ADDS false positives."""
    from flink_parent_spark.datapipe.dedup import bloom_incremental_dedup

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i}") for i in range(50)],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [(100 + i, f"corpus document number {i}") for i in range(0, 10)]
        + [(200 + i, f"fresh probe text {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    flagged = {
        r["doc_id"]
        for r in bloom_incremental_dedup(
            corpus, probe, "text", "doc_id", m=1 << 20
        ).collect()
        if r["maybe_dup"]
    }
    assert flagged == {100 + i for i in range(10)}
    tiny = {
        r["doc_id"]
        for r in bloom_incremental_dedup(
            corpus, probe, "text", "doc_id", m=256, k=2
        ).collect()
        if r["maybe_dup"]
    }
    assert flagged <= tiny  # never loses a true duplicate
