"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure Catalyst column expressions (no Python UDFs): at 100 TB these run
inside whole-stage codegen over the parquet scan with zero Python transfer.
The deterministic md5-based token hash (`token_hash64`) is shared with the
dedup operators and is reproducible in any engine that has md5 — which is
what lets the DuckDB oracle check every one of these value-exactly.
At real scale you'd swap md5 for xxhash64 (same plumbing, faster); md5 is
used here because the oracle engine must reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Small multi-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately tiny and hard-coded: the operator contract is a
# deterministic score, not linguistic accuracy.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "sur"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: words + digit runs + punctuation marks,
    the standard pre-tokenizer regex family (GPT-2 style, simplified)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(pieces)


def text_quality(text: Column | str) -> dict[str, Column]:
    """Quality-signal bundle: length, token stats, punctuation/digit/space
    ratios, stopword ratio, mean token length. Returns named columns; callers
    pick what they need."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    spaces = n_chars - F.length(F.regexp_replace(c, r"\s", ""))
    # isin over the literal stoplist compiles to an InSet hash-set probe —
    # O(1) per token vs array_contains' O(|stoplist|) linear scan (~25%
    # faster on the isolated count at sf0.1; identical membership)
    sw = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "punct_ratio": punct.cast("double") / n_chars.cast("double"),
        "digit_ratio": digits.cast("double") / n_chars.cast("double"),
        "space_ratio": spaces.cast("double") / n_chars.cast("double"),
        "stopword_ratio": n_stop.cast("double") / n_toks.cast("double"),
        "mean_token_len": (n_chars - spaces).cast("double") / n_toks.cast("double"),
    }


def lang_id_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit score per language + argmax prediction (deterministic
    tie-break by language code)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    # isin -> In/InSet membership, not an O(|list|) array scan per token.
    # NB: the filter lambda must stay single-parameter (a defaulted second
    # parameter reads as the (element, index) form), hence the factory.
    def _hit(words: tuple) -> "Column":
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))

    scores = {lang: _hit(words) for lang, words in STOPWORDS.items()}
    # argmax with lexicographic tie-break: build struct array and array_max
    pairs = F.array(
        *[F.struct(v.alias("score"), F.lit(-ord(k[0]) * 256 - ord(k[1])).alias("ord"), F.lit(k).alias("lang")) for k, v in scores.items()]
    )
    best = F.array_max(pairs)
    return {**{f"score_{k}": v for k, v in scores.items()}, "pred_lang": best["lang"]}


def token_hash64(tok: Column) -> Column:
    """Deterministic 60-bit token hash reproducible cross-engine:
    first 15 hex digits of md5, base-16 decoded."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")


def doc_fingerprint(text: Column | str, base: int = 131, mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive rolling polynomial hash over token hashes:
    H = fold(tokens, 0, (acc, t) -> (acc * base + h(t) % mod) % mod).
    Sequential fold => reproducible in any engine with a list-reduce."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * base + token_hash64(t) % mod) % mod,
    )


def pack_documents(
    df,
    text_col: str,
    id_col: str,
    capacity: int,
    n_buckets: int = 32,
):
    """Sequence packing for training pipelines: greedy first-fit-in-order
    packing of documents into fixed-token-capacity bins.

    Distribution strategy: documents hash into `n_buckets` independent
    packing groups (md5 bucket of the id — deterministic, engine-portable),
    each group packs sequentially by id order inside one applyInPandas
    task. At 100 TB, n_buckets scales with the cluster (each group is an
    independent unit of parallelism) and the only shuffle is the group-by;
    the sequential fill that packing fundamentally requires is confined to
    a group, never the driver. SIZE n_buckets so one group's (id, count)
    rows fit a task comfortably — only those two columns reach the packer,
    so even 10^7 docs/group is tens of MB; corpus_docs / 10^6 is a sane
    default at scale (the 32 default is a local-test convenience).

    A document that would overflow the current bin closes it and starts
    the next (greedy first-fit-in-order, the standard streaming packing);
    documents larger than `capacity` get a bin of their own. Output:
    (doc_id, bucket, bin_id, n_tokens) — deterministic, so a recursive-CTE
    oracle can replay the walk exactly."""
    import pandas as pd  # noqa: PLC0415

    work = df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("bigint") % n_buckets
        ).alias("bucket"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill = [], 0
        cur = 0
        for i, n in enumerate(pdf["n_tokens"]):
            if i == 0 or fill + n <= capacity:
                fill += n
            else:
                cur += 1
                fill = n
            bins.append(cur)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "bucket", "n_tokens", "bin_id"]]

    return work.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket bigint, n_tokens int, bin_id long"
    )


def token_ngrams(text: Column | str, n: int) -> Column:
    """Token n-grams as space-joined strings; empty array when the document
    has fewer than `n` tokens (guards Spark's descending `sequence`).

    The token array is BOUND as a lambda variable (transform over a
    one-element array) before the per-position lambda slices it — the same
    O(T^2)-avoidance as ngram_shingles: inlining `tokens(text)` into the
    lambda makes Catalyst re-run the regex tokenization per gram position
    (~4x slower end-to-end on the DSIR feature pass at bench scale)."""
    def build(arr: Column) -> Column:
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n),
                lambda i: F.array_join(F.slice(arr, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(text)), build), 1)


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signals (Rae et al. 2021, table A1): the
    share of the most frequent 2-gram, the fraction of 3-gram occurrences
    belonging to duplicated 3-grams, and the distinct-token ratio. High
    top-n-gram share / duplicate fraction flags boilerplate and degenerate
    repetition; low distinct-token ratio flags looping generations.

    Scale shape: each signal is one explode + two aggregations keyed by
    (id, gram) then id — partial aggregation combines map-side, the only
    shuffles are on the id-keyed aggregates, and the three signal relations
    join on the same id key (one exchange reused under AQE)."""
    toks = tokens(text_col)
    bi = df.select(id_col, F.explode(token_ngrams(text_col, 2)).alias("g"))
    bic = bi.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    bstat = bic.groupBy(id_col).agg(
        (F.max("c") / F.sum("c")).alias("top_bigram_share")
    )
    tri = df.select(id_col, F.explode(token_ngrams(text_col, 3)).alias("g"))
    tric = tri.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    tstat = tric.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("dup_trigram_frac")
    )
    tok = df.select(id_col, F.explode(toks).alias("tok"))
    dstat = tok.groupBy(id_col).agg(
        (F.count_distinct("tok") / F.count("*")).alias("distinct_token_ratio")
    )
    return bstat.join(tstat, id_col).join(dstat, id_col)


def chunk_documents(
    df,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Context-window chunking: split each document into fixed-size token
    chunks with optional overlap (the standard pretraining/RAG windowing
    pass). Pure Catalyst — tokens split once, chunk starts generated by
    `sequence` with stride (chunk_tokens - overlap), each chunk re-joined
    with a single space; runs map-side inside codegen over the corpus scan
    (no shuffle, no Python).

    Output: (id, chunk_id, chunk_text, n_chunk_tokens); the final chunk may
    be short (kept — training pipelines pad or pack it downstream)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    # The token array is BOUND as a lambda variable (transform over a
    # one-element array) before the per-chunk lambda slices it: Catalyst
    # higher-order functions re-evaluate invariant subtrees per element,
    # so inlining `tokens(text_col)` in the lambda re-ran the regex
    # tokenization per chunk — O(T^2/stride) splits on a T-token document
    # (the token_ngrams/ngram_shingles bug class).
    def build(arr: Column) -> Column:
        starts = F.sequence(
            F.lit(0),
            F.greatest(F.size(arr) - 1, F.lit(0)),
            F.lit(stride),
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_id"),
                F.array_join(F.slice(arr, s + 1, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
                F.least(F.size(arr) - s, F.lit(chunk_tokens)).alias(
                    "n_chunk_tokens"
                ),
            ),
        )

    chunks = F.element_at(F.transform(F.array(tokens(text_col)), build), 1)
    # single select with explode inline: projecting the chunks array first
    # and exploding the attribute makes InferFiltersFromGenerate re-expand
    # the whole expression into a size>0/isnotnull Filter (3 evaluations
    # per row); inline, the Generate evaluates it once and the struct
    # field aliases survive (verified against the formatted plan)
    return df.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def rebalance_source_mix(
    df,
    targets: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Domain/source-mix rebalancing: deterministically downsample each
    source so the KEPT corpus approaches the target mix `targets`
    (source -> target fraction of the output). The binding source (the one
    whose full volume yields the largest total under its target share) is
    kept whole; every other source keeps the md5-bucket fraction that
    matches its target relative to the binding source — the standard
    "downsample-only" mix correction (no upsampling/duplication).

    Deterministic: keep decisions hash on the document id (same rows kept
    on every engine and every run; DuckDB reproduces the md5 bucket).
    Scale shape: one count-by-source aggregate (tiny), then a map-side
    filter over the corpus scan — no shuffle of the corpus itself."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    unknown = set(counts) - set(targets)
    if unknown:
        raise ValueError(f"sources without a target share: {sorted(unknown)}")
    # binding source: max total corpus size implied by keeping it whole.
    # Zero-share sources are legitimate (drop that source entirely) — they
    # can't bind and get keep_pct 0.
    positive = [s for s in counts if targets[s] > 0]
    if not positive:
        raise ValueError("all target shares are zero")
    binding_total = min(counts[s] / targets[s] for s in positive)
    import math

    keep_pct = {
        s: min(100, int(math.floor(100 * targets[s] * binding_total / counts[s])))
        if targets[s] > 0
        else 0
        for s in counts
    }
    pct_col = F.lit(None).cast("int")
    for s, p in sorted(keep_pct.items()):
        pct_col = F.when(F.col(source_col) == s, F.lit(p)).otherwise(pct_col)
    from flink_parent_spark.datapipe.similarity import hash_bucket100

    return df.where(hash_bucket100(F.col(id_col)) < pct_col)


# -- PII scrubbing -----------------------------------------------------------

# (name, regex, replacement) in application order. The regex subset is
# portable between Java (Spark codegen) and RE2 (the DuckDB oracle): no
# backreferences, no lookaround. Order matters: the most-specific shapes
# first so a credit-card group is never half-eaten by the phone pattern.
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace PII spans with typed placeholder tokens — the standard
    pre-training scrub (emails, phone numbers, SSNs, credit cards, IPs
    -> `<EMAIL>`/`<PHONE>`/... markers).

    A chain of `regexp_replace` column expressions: stays inside
    whole-stage codegen over the scan, no Python transfer, trivially
    map-parallel at 100 TB. The pattern list is `PII_PATTERNS` (ordered,
    oracle-reproducible)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(text: Column | str) -> "dict[str, Column]":
    """Per-category PII hit counts (before redaction) — the audit metric a
    scrubbing pipeline reports per document/shard."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS
    }


# --- DSIR importance resampling ----------------------------------------------


def dsir_features(text: Column | str, n_buckets: int = 10_000) -> Column:
    """Hashed n-gram bag features per DSIR (Xie et al., Data Selection for
    Language Models via Importance Resampling, arXiv:2302.03169 §3.1):
    word unigrams + bigrams hashed into `n_buckets` buckets. Returns the
    array of bucket ids (with multiplicity — the bag, not the set)."""
    toks = tokens(text)
    grams = F.concat(toks, token_ngrams(text, 2))
    return F.transform(grams, lambda g: F.pmod(token_hash64(g), F.lit(n_buckets)))


def dsir_importance(
    df,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
):
    """DSIR importance weights (arXiv:2302.03169 §3.1): fit two hashed
    n-gram bag-of-words models — p_target over the rows where `is_target`
    holds, p_source over the whole pool — and score every document by

        log w(x) = sum_f c_f(x) * [ log p_tgt(f) - log p_src(f) ]

    with Laplace smoothing `alpha` over `n_buckets` buckets.

    Plan shape (the 100 TB story): one explode + two per-bucket aggregates
    (map-side combined, bounded by `n_buckets` — broadcastable by
    construction), the log-ratio table broadcast back onto the per-doc
    bucket counts, one per-doc aggregate. No shuffle wider than the
    corpus's (doc, bucket) pairs; the model itself never exceeds
    `n_buckets` rows. Log ratios are quantized through DECIMAL(30,12) and
    their per-doc sums decimal-accumulated, so the score is
    order-independent and engine-stable up to the quantization grain.

    Returns (doc_id, logw, n_feats)."""
    from flink_parent_spark.datapipe.spread import spread  # noqa: PLC0415

    # spread: the feature pass (tokenize + n-gram + hash per row) is the
    # expensive map stage; a narrow input (single local file, or many
    # small files packing into few scan splits) would otherwise pin it to
    # a handful of tasks (r16 scale-out probe: dsir read 1.27x from 4x
    # cores before this). Pre-split cluster inputs pass through untouched.
    feats = spread(df).select(
        F.col(id_col),
        is_target.alias("__tgt"),
        F.explode(dsir_features(text_col, n_buckets)).alias("bucket"),
    )
    # NOT persisted: both consumers (model fit and scoring join) sit on the
    # identical Exchange(hash(id, tgt, bucket)), which Spark's exchange
    # reuse already computes once; an explicit persist measured SLOWER
    # (r15 A/B 2.15 -> 3.03 s at sf0.1) by paying cache serialization.
    per_doc = feats.groupBy(id_col, "__tgt", "bucket").agg(
        F.count("*").alias("c_doc")
    )
    per_bucket = per_doc.groupBy("bucket").agg(
        F.sum("c_doc").alias("c_src"),
        F.sum(F.when(F.col("__tgt"), F.col("c_doc")).otherwise(0)).alias("c_tgt"),
    )
    totals = per_bucket.agg(
        F.sum("c_src").alias("t_src"), F.sum("c_tgt").alias("t_tgt")
    )
    b = float(n_buckets)
    # the ratio is quantized through DECIMAL(30,12) at the bucket level:
    # engines' ln() can differ in the last ulp, and quantizing BEFORE the
    # c_doc multiplication confines that exposure to the n_buckets ratio
    # values instead of every (doc, bucket) product
    ratio = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("c_tgt") + alpha).cast("double")
                / (F.col("t_tgt") + alpha * b).cast("double")
            )
            - F.log(
                (F.col("c_src") + alpha).cast("double")
                / (F.col("t_src") + alpha * b).cast("double")
            )
        )
        .cast("decimal(30,12)")
        .cast("double")
        .alias("log_ratio"),
    )
    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(
                (F.col("c_doc").cast("double") * F.col("log_ratio")).cast(
                    "decimal(30,12)"
                )
            )
            .cast("double")
            .alias("logw"),
            F.sum("c_doc").alias("n_feats"),
        )
    )


def dsir_resample(
    scored,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw",
):
    """Gumbel top-k resampling (arXiv:2302.03169 §3.2: sample without
    replacement proportional to the importance weights). The Gumbel noise
    is derived from the md5 hash of the document id instead of an RNG —
    `u = (h mod 2^30 + 0.5) / 2^30`, `g = -ln(-ln(u))` — so selection is
    deterministic, restart-stable, and oracle-reproducible while keeping
    the Gumbel-max property over the hash's uniformity. Ties under the
    total order (key, id) are impossible since ids are distinct.

    Returns the k selected rows with their selection key."""
    h = token_hash64(F.col(id_col).cast("string"))
    u = ((F.pmod(h, F.lit(1 << 30))).cast("double") + 0.5) / float(1 << 30)
    # quantize the noise through DECIMAL(30,12): engines' ln() differ in
    # the last ulp, and the selection key must be bit-identical
    g = (-F.log(-F.log(u))).cast("decimal(30,12)").cast("double")
    key = (F.col(weight_col) + g).alias("gumbel_key")
    return (
        scored.select("*", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def vocabulary(df, text_col: str, id_col: str | None = None, min_count: int = 1):
    """Corpus word-frequency table — the counting pass of tokenizer/vocab
    training (BPE's initial word counts) and of frequency-based filters.
    Returns (word, n) for words occurring >= min_count times; when
    `id_col` is given, additionally (word, n, n_docs) with the document
    frequency (distinct documents containing the word — the IDF
    denominator), computed in the same single groupBy.

    Scale shape: explode + partial-aggregating groupBy on the word — the
    map-side combine collapses each partition's Zipf head before the
    shuffle, so shuffled volume tracks the vocabulary (millions), not the
    corpus token count (trillions); with `id_col`, the document frequency
    comes from a per-(doc, word) distinct pass first (same key, two
    aggregation exchanges, still no driver state). Callers wanting a
    global top-k should sort-limit the RESULT (TakeOrderedAndProject:
    per-partition heaps, no global sort of the vocab)."""
    c = F.col(text_col)
    if id_col is None:
        words = df.select(F.explode(tokens(c)).alias("__w")).select(
            F.lower(F.col("__w")).alias("word")
        )
        out = words.groupBy("word").agg(F.count("*").alias("n"))
    else:
        words = df.select(
            F.col(id_col).alias("__id"), F.explode(tokens(c)).alias("__w")
        ).select("__id", F.lower(F.col("__w")).alias("word"))
        out = words.groupBy("word").agg(
            F.count("*").alias("n"),
            F.countDistinct("__id").alias("n_docs"),
        )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out
