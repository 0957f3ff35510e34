"""LLM-data-pipeline queries: text analysis, document dedup (exact / n-gram
Jaccard / MinHash-LSH / SimHash), embedding similarity search.

Every operator here is value-checked against a DuckDB oracle that recomputes
the same math from first principles (md5-based hashing and sequential double
folds make the results engine-independent). That is deliberately stronger
than a rows-only check: the oracle is an independent implementation, not a
copy of the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parent_spark.datapipe.dedup import (
    duplicated_spans,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from flink_parent_spark.datapipe.similarity import cosine_topk
from flink_parent_spark.datapipe.text import (
    PII_PATTERNS,
    STOPWORDS,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id_scores,
    pii_counts,
    redact_pii,
    text_quality,
    token_count,
)
from flink_parent_spark.queries.registry import df_query
from flink_parent_spark.tables import load_tables

# Shared DuckDB fragments ----------------------------------------------------

# 60-bit md5-based hash — must mirror datapipe.text.token_hash64
_DUCK_H64 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _duck_h64(x: str) -> str:
    return _DUCK_H64.format(x=x)


# --- text analysis ----------------------------------------------------------


@df_query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])'))
             AS n_bpe_ish,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
    )


@df_query(
    "text_quality_scores",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS toks,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS punct,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
             length(text) - length(regexp_replace(text, '\s', '', 'g')) AS spaces
      FROM documents
    )
    SELECT doc_id, n_chars,
           len(toks) AS n_tokens,
           CAST(punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(digits AS DOUBLE) / n_chars AS digit_ratio,
           CAST(n_chars - spaces AS DOUBLE) / len(toks) AS mean_token_len,
           CAST(len(list_filter(toks, t -> list_contains({stoplist}, lower(t))))
                AS DOUBLE) / len(toks) AS stopword_ratio
    FROM base
    """.format(
        stoplist="[" + ",".join(f"'{w}'" for ws in STOPWORDS.values() for w in ws) + "]"
    ),
)
def text_quality_scores(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    q = text_quality("text")
    return t["documents"].select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
        q["mean_token_len"].alias("mean_token_len"),
        q["stopword_ratio"].alias("stopword_ratio"),
    )


@df_query(
    "text_lang_id",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {scores}
      FROM base
    )
    SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
           CASE GREATEST(
                  score_en * 1000 - 101, score_de * 1000 - 100,
                  score_es * 1000 - 115, score_fr * 1000 - 102)
                WHEN score_en * 1000 - 101 THEN 'en'
                WHEN score_de * 1000 - 100 THEN 'de'
                WHEN score_es * 1000 - 115 THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM scored
    """.format(
        scores=",\n             ".join(
            "len(list_filter(toks, t -> list_contains([{ws}], lower(t)))) AS score_{k}".format(
                ws=",".join(f"'{w}'" for w in words), k=k
            )
            for k, words in STOPWORDS.items()
        )
    ),
)
def text_lang_id(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    s = lang_id_scores("text")
    return t["documents"].select(
        "doc_id",
        "lang",
        s["score_en"].alias("score_en"),
        s["score_de"].alias("score_de"),
        s["score_es"].alias("score_es"),
        s["score_fr"].alias("score_fr"),
        s["pred_lang"].alias("pred_lang"),
    )


@df_query(
    "text_fingerprint",
    oracle=rf"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(trim(text), '\s+'),
                              t -> {_duck_h64('t')} % 2147483647)),
             (acc, h) -> (acc * 131 + h) % 2147483647) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["documents"].select("doc_id", doc_fingerprint("text").alias("fingerprint"))


# --- deduplication ----------------------------------------------------------


@df_query(
    "dedup_exact_digest",
    oracle="""
    WITH doubled AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100
    )
    SELECT md5(text) AS digest, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
    FROM doubled GROUP BY md5(text)
    """,
)
def dedup_exact_digest(spark, sf_dir):
    """Exact dedup over a self-unioned corpus (guarantees real duplicates)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    doubled = d.select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return exact_dedup(doubled, "text", "doc_id")


@df_query(
    "dedup_ngram_jaccard_pairs",
    oracle=rf"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {_duck_h64('sh')} AS h
      FROM (
        SELECT doc_id,
               list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents) t1
      ) t2, LATERAL (SELECT unnest(shs) AS sh) u
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, sa.sz AS size_a, sb.sz AS size_b,
           CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.2
    """,
)
def dedup_ngram_jaccard_pairs(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(
        t["documents"], "text", "doc_id", n=3, threshold=0.2, max_shingle_freq=None
    )


from flink_parent_spark.datapipe.dedup import MINHASH_P, minhash_coeffs  # noqa: E402

_A16, _B16 = minhash_coeffs(16)
# affine-permutation minhash input — mirrors `_sig_array` exactly
_H_PERM = (
    f"((list_value({', '.join(map(str, _A16))})[perm + 1]"
    f" * ((h % {MINHASH_P} + {MINHASH_P}) % {MINHASH_P})"
    f" + list_value({', '.join(map(str, _B16))})[perm + 1]) % {MINHASH_P})"
)
_H_SH = _duck_h64("sh")

# distinct (doc_id, shingle-hash) set, shared by the minhash oracles
_DUCK_HSH = rf"""
    hsh AS (
      SELECT DISTINCT doc_id, {_H_SH} AS h
      FROM (
        SELECT doc_id,
               list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents) t1
      ) t2, LATERAL (SELECT unnest(shs) AS sh) u
    )
"""


@df_query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_DUCK_HSH}
    SELECT doc_id AS id, perm,
           MIN({_H_PERM}) AS minhash
    FROM hsh, (SELECT unnest(generate_series(0, 15)) AS perm) p
    GROUP BY doc_id, perm
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return minhash_signatures(t["documents"], "text", "doc_id", n=3, k=16)


# full LSH pipeline as a reusable CTE chain ending in `lsh_pairs`
_DUCK_LSH_PAIRS = f"""{_DUCK_HSH}, sig AS (
      SELECT doc_id, perm, MIN({_H_PERM}) AS minhash
      FROM hsh, (SELECT unnest(generate_series(0, 15)) AS perm) p
      GROUP BY doc_id, perm
    ), banded AS (
      SELECT doc_id, perm // 4 AS band,
             md5((perm // 4) || '_' ||
                 string_agg(minhash, '_' ORDER BY perm)) AS band_key
      FROM sig GROUP BY doc_id, perm // 4
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM hsh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM hsh a JOIN hsh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), lsh_pairs AS (
      SELECT c.id_a, c.id_b,
             CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) AS jaccard
      FROM cand c
      JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) >= 0.1
    )"""


@df_query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_DUCK_LSH_PAIRS}
    SELECT id_a, id_b, jaccard FROM lsh_pairs
    """,
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return minhash_lsh_pairs(
        t["documents"], "text", "doc_id", n=3, k=16, bands=4, verify_threshold=0.1
    ).select("id_a", "id_b", "jaccard")


@df_query(
    "dedup_simhash",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, {_duck_h64('tok')} AS h
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents) t
    ), votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, (SELECT unnest(generate_series(0, 62)) AS bit) b
      GROUP BY doc_id, bit
    )
    SELECT doc_id AS id,
           -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark side is BIGINT
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return simhash(t["documents"], "text", "doc_id")


def _dedup_cc_oracle(n_iter: int = 8) -> str:
    """Unrolled min-label propagation over the LSH near-dup pair graph
    (same technique as graph_queries._cc_oracle; too-small n_iter surfaces
    as a mismatch, never a false pass)."""
    prev = "cc0"
    ctes = [
        """und AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b AS src, id_a AS dst FROM lsh_pairs
    ), verts AS (SELECT DISTINCT src AS id FROM und),
    cc0 AS MATERIALIZED (SELECT id, id AS component FROM verts)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""
    cc{i} AS MATERIALIZED (
      SELECT p.id,
             LEAST(p.component, COALESCE(m.nbr_min, p.component)) AS component
      FROM {prev} p LEFT JOIN (
        SELECT u.dst AS id, MIN(q.component) AS nbr_min
        FROM und u JOIN {prev} q ON u.src = q.id
        GROUP BY u.dst) m ON p.id = m.id)"""
        )
        prev = f"cc{i}"
    return (
        f"WITH {_DUCK_LSH_PAIRS}, {','.join(ctes)} "
        f"SELECT id AS doc_id, component AS canonical_id FROM {prev}"
    )


@df_query("dedup_cluster_canonical", oracle=_dedup_cc_oracle(8))
def dedup_cluster_canonical(spark, sf_dir):
    """End-to-end dedup pipeline composition: MinHash-LSH near-dup pairs ->
    connected components over the pair graph -> canonical (min) doc id per
    duplicate cluster. This is the shape a 100 TB training-data dedup
    actually runs: candidate edges scale with true near-dups (not O(n^2)),
    and the CC iteration count scales with cluster diameter (tiny for dup
    clusters), each superstep one join + min-aggregate."""
    from flink_parent_spark.graph.algorithms import connected_components

    t = load_tables(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t["documents"], "text", "doc_id", n=3, k=16, bands=4, verify_threshold=0.1
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, edges, max_iter=20)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("canonical_id")
    )


# --- embedding similarity search -------------------------------------------

_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, v) -> acc + v)"
)


def _duck_cos(a: str, b: str) -> str:
    d = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({d}) / (sqrt({na}) * sqrt({nb}))"


@df_query(
    "ann_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_duck_cos('q.embedding', 'c.embedding')} AS cosine
      FROM q, embeddings c
      WHERE q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk_bruteforce(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return cosine_topk(e.filter(F.col("vec_id") < 8), e, k=5, allow_full_scan=True)


@df_query(
    "ann_cosine_topk_blocked",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_duck_cos('q.embedding', 'c.embedding')} AS cosine
      FROM q JOIN embeddings c ON q.label = c.label
      WHERE q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk_blocked(spark, sf_dir):
    """IVF-style blocked search: scan only the query's block (label)."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return cosine_topk(e.filter(F.col("vec_id") < 20), e, k=5, block_col="label")


@df_query(
    "ann_cosine_topk_ivf",
    oracle=f"""
    WITH cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
    ), cand_cells AS (
      SELECT cand_id, embedding, cell FROM (
        SELECT e.vec_id AS cand_id, e.embedding, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_duck_cos('cent.cv', 'e.embedding')} DESC,
                                           cent.cell) AS rn
        FROM embeddings e, cent
      ) a WHERE rn = 1
    ), query_cells AS (
      SELECT query_id, embedding, cell FROM (
        SELECT q.vec_id AS query_id, q.embedding, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_duck_cos('cent.cv', 'q.embedding')} DESC,
                                           cent.cell) AS rn
        FROM embeddings q, cent WHERE q.vec_id < 10
      ) b WHERE rn <= 2
    ), scored AS (
      SELECT query_id, cand_id,
             {_duck_cos('q.embedding', 'c.embedding')} AS cosine
      FROM query_cells q JOIN cand_cells c USING (cell)
      WHERE query_id <> cand_id
    ), ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk_ivf(spark, sf_dir):
    """True IVF search: coarse-quantize into 8 cells (deterministically
    seeded centroids), each query probes its 2 nearest cells. The oracle
    recomputes quantization + probing + ranking independently in SQL."""
    from flink_parent_spark.datapipe.similarity import ivf_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return ivf_topk(e.filter(F.col("vec_id") < 10), e, k=5, n_centroids=8, nprobe=2)


def _duck_kmeans_assign(src: str, cent: str, idcol: str, rn_cond: str) -> str:
    """Assignment CTE body: nearest-centroid cell(s) by cosine, ordinal
    tiebreak — mirrors `_best_cells` exactly."""
    return f"""SELECT {idcol}, embedding, cell FROM (
      SELECT s.{idcol}, s.embedding, c.cell,
             ROW_NUMBER() OVER (PARTITION BY s.{idcol}
                                ORDER BY {_duck_cos('c.cv', 's.embedding')} DESC,
                                         c.cell) AS rn
      FROM {src} s, {cent} c) t WHERE {rn_cond}"""


def _duck_kmeans_mean(assigned: str) -> str:
    """New-centroid CTE body: per-(cell, dim) exact decimal mean — mirrors
    `train_kmeans_centroids`'s update step."""
    return f"""SELECT cell, list(m ORDER BY dim) AS cv FROM (
      SELECT cell, i.i AS dim,
             CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(38,18)))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      FROM {assigned}, UNNEST(generate_series(1, len(embedding))) AS i(i)
      GROUP BY cell, i.i) mm GROUP BY cell"""


@df_query(
    "ann_cosine_topk_ivf_kmeans",
    oracle=f"""
    WITH train AS (
      SELECT * FROM embeddings
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
    ),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM train ORDER BY vec_id LIMIT 4)
    ),
    a0 AS ({_duck_kmeans_assign('train', 'c0', 'vec_id', 'rn = 1')}),
    c1 AS ({_duck_kmeans_mean('a0')}),
    a1 AS ({_duck_kmeans_assign('train', 'c1', 'vec_id', 'rn = 1')}),
    c2 AS ({_duck_kmeans_mean('a1')}),
    cand_cells AS (
      {_duck_kmeans_assign('embeddings', 'c2', 'vec_id', 'rn = 1')}
    ),
    query_cells AS (
      {_duck_kmeans_assign('(SELECT * FROM embeddings WHERE vec_id < 10)',
                           'c2', 'vec_id', 'rn <= 2')}
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_duck_cos('q.embedding', 'c.embedding')} AS cosine
      FROM query_cells q JOIN cand_cells c USING (cell)
      WHERE q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk_ivf_kmeans(spark, sf_dir):
    """IVF with k-means-trained centroids: 2 Lloyd iterations refine 4
    seeded cells over a deterministic 50% md5-bucket training sample
    (assign = map-side argmax over a literal centroid array; update = one
    k*d-group aggregation with exact decimal means), then the standard IVF
    probe over the FULL corpus. Sampling bounds the per-iteration training
    scan at 100 TB; the oracle unrolls both iterations over the same sample
    in SQL and must reproduce centroids, cell assignment, and ranking
    bit-exactly."""
    from flink_parent_spark.datapipe.similarity import ivf_kmeans_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return ivf_kmeans_topk(
        e.filter(F.col("vec_id") < 10), e, k=5, n_centroids=4, nprobe=2, n_iters=2,
        train_sample_pct=50,
    )


@df_query(
    "dedup_semdedup_embeddings",
    oracle=f"""
    WITH train AS (
      SELECT * FROM embeddings
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
    ),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM train ORDER BY vec_id LIMIT 4)
    ),
    a0 AS ({_duck_kmeans_assign('train', 'c0', 'vec_id', 'rn = 1')}),
    c1 AS ({_duck_kmeans_mean('a0')}),
    a1 AS ({_duck_kmeans_assign('train', 'c1', 'vec_id', 'rn = 1')}),
    c2 AS ({_duck_kmeans_mean('a1')}),
    cells AS (
      {_duck_kmeans_assign('embeddings', 'c2', 'vec_id', 'rn = 1')}
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id AS id
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.3
    )
    SELECT c.vec_id AS id, c.cell,
           (d.id IS NOT NULL) AS dropped
    FROM cells c LEFT JOIN dropped d ON c.vec_id = d.id
    """,
)
def dedup_semdedup_embeddings(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the embeddings
    table: k-means clusters (same deterministic sampled training as the
    IVF quantizer), within-cluster cosine >= 0.3 epsilon-balls, lowest-id
    representative kept. The oracle unrolls the identical training and
    the drop rule in SQL — clusters, cosines, and keep/drop decisions all
    bit-exact."""
    from flink_parent_spark.datapipe.similarity import semdedup

    t = load_tables(spark, sf_dir)
    # n_centroids pinned (the oracle unrolls exactly this clustering);
    # unset, semdedup auto-sizes to ~sqrt(n) so the default never goes
    # quadratic at volume
    return semdedup(t["embeddings"], eps=0.3, n_centroids=4, train_sample_pct=50)


# --- multimodal plumbing ----------------------------------------------------


@df_query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           'image' AS modality,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS digest,
           ('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1 AS width,
           ('0x' || substr(md5(text), 9, 8))::BIGINT % 1080 + 1 AS height,
           'fake-md5' AS decoder
    FROM documents WHERE doc_id < 50
    """,
)
def multimodal_decode_meta(spark, sf_dir):
    """Binary payload -> mapInPandas decode stub -> typed metadata struct.

    The md5-derived fake dimensions are reproducible in SQL, so even the
    Pandas-UDF path gets a value-exact oracle (text is ASCII in the
    fixtures, so utf-8 payload md5 == DuckDB md5 of the text)."""
    from flink_parent_spark.datapipe.multimodal import attach_payload, decode_media

    t = load_tables(spark, sf_dir)
    d = attach_payload(t["documents"].filter(F.col("doc_id") < 50), "text")
    decoded = decode_media(d)
    return decoded.select(
        "doc_id",
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.digest").alias("digest"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.decoder").alias("decoder"),
    )


@df_query(
    "embedding_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_cos('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.35
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    """Near-duplicate vectors (cosine >= 0.35) within label blocks.

    0.35 sits inside the fixtures' score distribution at every SF
    (14/26/391 pairs at sf 0.001/0.01/0.1) so the gate checks real values —
    the previous 0.5 threshold returned zero rows and proved nothing."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"), "label")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"), "label")
    from flink_parent_spark.datapipe.similarity import cosine as _cos

    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cos(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", "cosine")
    )


@df_query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(i.i - 1 AS INT) AS frame_idx,
           CAST((i.i - 1) * GREATEST(octet_length(encode(text)) // 4, 1)
                AS BIGINT) AS byte_offset
    FROM documents,
         UNNEST(generate_series(1, LEAST(4, octet_length(encode(text)))))
           AS i(i)
    WHERE doc_id < 50
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: payload -> decode_media (Arrow-batched
    mapInPandas, deterministic fake decoder) -> per-doc frame offsets via
    frame_sample_stub, exploded to one row per planned frame. The codec is
    stubbed (none in this container); the batch shape, binary handling, and
    per-frame fan-out — the parts that matter at 100 TB — are real."""
    from collections.abc import Iterator

    import pandas as pd

    from flink_parent_spark.datapipe.multimodal import (
        attach_payload,
        decode_media,
        frame_sample_stub,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 50).select("doc_id", "text")
    decoded = decode_media(attach_payload(docs, "text"))
    plan = frame_sample_stub(n_frames=4)

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, meta in zip(pdf["doc_id"], pdf["media_meta"]):
                for idx, off in enumerate(plan(meta["byte_len"])):
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": idx, "byte_offset": off}
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_offset"]
            )

    return decoded.mapInPandas(
        frames, "doc_id bigint, frame_idx int, byte_offset bigint"
    )


# --- training-data pipeline extras ------------------------------------------


@df_query(
    "sample_hash_stratified",
    oracle="""
    WITH rates(lang, pct) AS (VALUES ('en', 50), ('de', 25), ('fr', 10))
    SELECT d.doc_id, d.lang,
           ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             AS bucket
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < r.pct
    """,
)
def sample_hash_stratified(spark, sf_dir):
    """Deterministic stratified sampling — the production alternative to
    rand(): the keep/drop decision is a pure function of the document id
    (md5 bucket), so the sample is reproducible across runs, engines, and
    repartitioning, and rates vary per stratum (language). At 100 TB this
    is a map-only filter on the scan with a broadcast rate table — no
    shuffle, no RNG state."""
    t = load_tables(spark, sf_dir)
    rates = spark.createDataFrame(
        [("en", 50), ("de", 25), ("fr", 10)], "lang string, pct int"
    )
    d = t["documents"].withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100,
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(F.col("bucket") < F.col("pct"))
        .select("doc_id", "lang", "bucket")
    )


@df_query(
    "dedup_best_per_source",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
               / GREATEST(length(text), 1) AS density
      FROM documents
    )
    SELECT source, doc_id AS best_doc_id, n_chars AS best_n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY density DESC, doc_id) AS rn
      FROM scored) t
    WHERE rn = 1
    """,
)
def dedup_best_per_source(spark, sf_dir):
    """Per-source canonical selection — keep the best-quality document per
    source (max_by over a quality proxy, ties to smallest id). The
    aggregate form is one partial-aggregated shuffle on source (no window
    over the full corpus), which is the shape that survives 10^9 sources."""
    t = load_tables(spark, sf_dir)
    scored = t["documents"].withColumn(
        "density",
        (F.size(F.split(F.trim("text"), r"\s+")).cast("double"))
        / F.greatest(F.length("text"), F.lit(1)),
    )
    return scored.groupBy("source").agg(
        F.max_by(
            F.struct("doc_id", "n_chars"),
            F.struct(F.col("density"), -F.col("doc_id")),
        ).alias("best")
    ).select(
        "source",
        F.col("best.doc_id").alias("best_doc_id"),
        F.col("best.n_chars").alias("best_n_chars"),
    )


@df_query(
    "text_ngram_contamination",
    oracle=r"""
    WITH bench AS (
      SELECT DISTINCT tok || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4
               AS sh
      FROM (
        SELECT doc_id, tok, i,
               LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2,
               LEAD(tok, 3) OVER w AS t3, LEAD(tok, 4) OVER w AS t4
        FROM (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
                 generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
          FROM documents WHERE doc_id < 50)
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)) g
      WHERE t4 IS NOT NULL
    ), corpus AS (
      SELECT doc_id, tok || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4 AS sh
      FROM (
        SELECT doc_id, tok, i,
               LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2,
               LEAD(tok, 3) OVER w AS t3, LEAD(tok, 4) OVER w AS t4
        FROM (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
                 generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
          FROM documents WHERE doc_id >= 50)
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)) g
      WHERE t4 IS NOT NULL
    )
    SELECT c.doc_id, COUNT(DISTINCT c.sh) AS contaminated_shingles
    FROM corpus c JOIN bench b ON c.sh = b.sh
    GROUP BY c.doc_id
    """,
)
def text_ngram_contamination(spark, sf_dir):
    """Benchmark-contamination detection: count each corpus document's
    distinct 5-gram shingles that also appear in a benchmark set (docs
    with id < 50 stand in for the eval set). Inverted-index equi-join on
    the shingle string — the corpus side never materializes pairs, and the
    benchmark shingle set is the small broadcast side at scale."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]

    def shingles(df):
        # token array bound once as a lambda variable: inlining the
        # split(trim(text)) expression in the per-position lambda makes
        # Catalyst re-run the regex tokenization per shingle (O(T^2) —
        # the token_ngrams bug class, r16 HOF sweep)
        def build(arr):
            return F.transform(
                F.sequence(F.lit(0), F.size(arr) - 5),
                lambda i: F.array_join(F.slice(arr, i + 1, 5), " "),
            )

        toks = F.split(F.trim("text"), r"\s+")
        return df.select(
            "doc_id",
            F.explode(
                F.element_at(F.transform(F.array(toks), build), 1)
            ).alias("sh"),
        )

    bench = (
        shingles(d.filter(F.col("doc_id") < 50)).select("sh").distinct()
    )
    corpus = shingles(d.filter(F.col("doc_id") >= 50))
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("contaminated_shingles"))
    )


_DUCK_SQD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
    " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), (acc, v) -> acc + v)"
)


def _duck_sqd(a: str, b: str) -> str:
    return _DUCK_SQD.format(a=a, b=b)


def _pq_oracle() -> str:
    """ADC search unrolled: seeded codebooks (subvectors of the 4 lowest-id
    vectors), per-candidate argmin encoding per subspace, fixed-order
    4-term ADC sum — mirrors pq_topk's determinism contract exactly."""
    subs = [(j, 16 * j + 1, 16 * (j + 1)) for j in range(4)]
    enc_cols = ", ".join(
        f"""(SELECT s.code FROM seeds s
         ORDER BY {_duck_sqd(f'c.embedding[{lo}:{hi}]', f's.embedding[{lo}:{hi}]')} ASC,
                  s.code ASC LIMIT 1) AS c{j}"""
        for j, lo, hi in subs
    )
    ad_terms = " + ".join(
        _duck_sqd(f"q.embedding[{lo}:{hi}]", f"s{j}.embedding[{lo}:{hi}]")
        for j, lo, hi in subs
    )
    joins = " ".join(f"JOIN seeds s{j} ON s{j}.code = e.c{j}" for j, _, _ in subs)
    return f"""
    WITH seeds AS (
      SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
    ), enc AS (
      SELECT c.vec_id AS cand_id, {enc_cols}
      FROM embeddings c
    ), ad AS (
      SELECT q.vec_id AS query_id, e.cand_id, {ad_terms} AS adist
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q,
           enc e {joins}
      WHERE q.vec_id <> e.cand_id
    ), ranked AS (
      SELECT query_id, cand_id, adist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist ASC, cand_id) AS rank
      FROM ad
    )
    SELECT query_id, cand_id, adist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """


def _ivf_pq_oracle() -> str:
    """IVFADC unrolled: 8 seeded coarse cells route candidates (argmax
    cosine) and queries (2 nearest cells); within a probed cell candidates
    rank by the 4-subspace ADC sum against seeded codebooks — mirrors
    `ivf_pq_topk`'s routing + encoding + fixed-order ADC exactly."""
    subs = [(j, 16 * j + 1, 16 * (j + 1)) for j in range(4)]
    enc_cols = ", ".join(
        f"""(SELECT s.code FROM seeds s
         ORDER BY {_duck_sqd(f'c.embedding[{lo}:{hi}]', f's.embedding[{lo}:{hi}]')} ASC,
                  s.code ASC LIMIT 1) AS c{j}"""
        for j, lo, hi in subs
    )
    ad_terms = " + ".join(
        _duck_sqd(f"q.embedding[{lo}:{hi}]", f"s{j}.embedding[{lo}:{hi}]")
        for j, lo, hi in subs
    )
    joins = " ".join(f"JOIN seeds s{j} ON s{j}.code = e.c{j}" for j, _, _ in subs)
    return f"""
    WITH cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
    ), seeds AS (
      SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
    ), cand_cells AS (
      SELECT cand_id, embedding, cell FROM (
        SELECT e.vec_id AS cand_id, e.embedding, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_duck_cos('cent.cv', 'e.embedding')} DESC,
                                           cent.cell) AS rn
        FROM embeddings e, cent
      ) a WHERE rn = 1
    ), enc AS (
      SELECT c.cand_id, c.cell, {enc_cols}
      FROM (SELECT cand_id, embedding, cell FROM cand_cells) c
    ), query_cells AS (
      SELECT query_id, embedding, cell FROM (
        SELECT q.vec_id AS query_id, q.embedding, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_duck_cos('cent.cv', 'q.embedding')} DESC,
                                           cent.cell) AS rn
        FROM embeddings q, cent WHERE q.vec_id < 8
      ) b WHERE rn <= 2
    ), ad AS (
      SELECT q.query_id, e.cand_id, {ad_terms} AS adist
      FROM query_cells q JOIN enc e USING (cell) {joins}
      WHERE q.query_id <> e.cand_id
    ), ranked AS (
      SELECT query_id, cand_id, adist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist ASC, cand_id) AS rank
      FROM ad
    )
    SELECT query_id, cand_id, adist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """


@df_query("ann_ivf_pq_topk", oracle=_ivf_pq_oracle())
def ann_ivf_pq_topk(spark, sf_dir):
    """IVF + PQ composed (FAISS IVFADC layout): coarse cells bound the scan
    per query to nprobe/n_centroids of the corpus, PQ codes bound the cost
    per scanned pair to m codeword folds — the flagship 100 TB ANN path,
    with no crossJoin anywhere in the plan (asserted in test_plans.py).
    The oracle independently reproduces cell routing, PQ encoding, and
    ADC ranking bit-exactly."""
    from flink_parent_spark.datapipe.similarity import ivf_pq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return ivf_pq_topk(
        e.filter(F.col("vec_id") < 8), e, k=5, n_centroids=8, nprobe=2, m=4, ks=4
    )


@df_query("ann_pq_topk", oracle=_pq_oracle())
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (compressed-domain search): 64-dim vectors
    encode to 4 sub-space codes against seeded codebooks; queries rank by
    the asymmetric squared-L2 distance over codewords. The corpus-side
    representation is 4 small ints per vector — the storage/scan win that
    makes PQ the 100 TB layer under IVF."""
    from flink_parent_spark.datapipe.similarity import pq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return pq_topk(e.filter(F.col("vec_id") < 8), e, k=5, m=4, ks=4, allow_full_scan=True)


@df_query(
    "pipeline_corpus_curation",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             CAST(length(text)
                  - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_tokens >= 5 AND punct_ratio <= 0.3 AND lang IN ('en', 'de', 'fr')
    ), deduped AS (
      SELECT md5(text) AS digest, MIN(doc_id) AS rep_id,
             MIN(lang) AS lang, COUNT(*) AS n_copies
      FROM filtered GROUP BY md5(text)
    ), sampled AS (
      SELECT * FROM deduped
      WHERE ('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 8))::BIGINT % 100
            < 80
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_copies) AS BIGINT) AS n_raw
    FROM sampled GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark, sf_dir):
    """End-to-end corpus curation — the composition story the individual
    datapipe operators exist for, as ONE declarative plan: quality filter
    (token count + punctuation ratio) -> language allowlist -> exact dedup
    keeping the smallest id -> deterministic 80% hash sample -> per-language
    corpus stats. Every stage is a Catalyst map/filter or one
    partial-aggregated shuffle; nothing leaves the JVM and the whole
    pipeline is a single job at any scale."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    punct = (
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
        ).cast("double")
        / F.length("text")
    )
    filtered = (
        d.withColumn("n_tokens", toks)
        .withColumn("punct_ratio", punct)
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("punct_ratio") <= 0.3)
            & F.col("lang").isin("en", "de", "fr")
        )
    )
    deduped = filtered.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("rep_id"),
        F.min("lang").alias("lang"),
        F.count("*").alias("n_copies"),
    )
    sampled = deduped.filter(
        F.conv(F.substring(F.md5(F.col("rep_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
        < 80
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_copies").alias("n_raw"),
    )


@df_query(
    "datapipe_pack_documents",
    oracle=r"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
               AS bucket,
             len(string_split_regex(trim(text), '\s+')) AS n_tok
      FROM documents
    ), o AS (
      SELECT doc_id, bucket, n_tok,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM d
    ), walk(bucket, rn, doc_id, n_tok, bin_id, fill) AS (
      SELECT bucket, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.n_tok,
             CASE WHEN w.fill + o.n_tok <= 256
                  THEN w.bin_id ELSE w.bin_id + 1 END,
             CASE WHEN w.fill + o.n_tok <= 256
                  THEN w.fill + o.n_tok ELSE o.n_tok END
      FROM walk w JOIN o ON o.bucket = w.bucket AND o.rn = w.rn + 1
    )
    SELECT doc_id, bucket, CAST(n_tok AS INT) AS n_tokens, bin_id FROM walk
    """,
)
def datapipe_pack_documents(spark, sf_dir):
    """Sequence packing: greedy first-fit-in-order packing of documents
    into 256-token bins inside 8 deterministic hash buckets (each bucket
    is an independent parallel packing group — the 100 TB layout). The
    oracle replays the sequential fill with a recursive CTE and must match
    every bin assignment exactly."""
    from flink_parent_spark.datapipe.text import pack_documents

    t = load_tables(spark, sf_dir)
    return pack_documents(t["documents"], "text", "doc_id", capacity=256,
                          n_buckets=8)


@df_query(
    "dedup_simhash_pairs",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, {_duck_h64('tok')} AS h
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents) t
    ), votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, (SELECT unnest(generate_series(0, 62)) AS bit) b
      GROUP BY doc_id, bit
    ), sh AS (
      SELECT doc_id AS id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: banded candidate generation (equi-join on
    (band, 16-bit value), never all-pairs) + full-Hamming verify. The
    4-band / hamming<=3 configuration is pigeonhole-complete, so the
    oracle's brute-force Hamming scan over all pairs must agree EXACTLY —
    the banding is a pure cost optimization, not an approximation."""
    from flink_parent_spark.datapipe.dedup import simhash_pairs

    t = load_tables(spark, sf_dir)
    return simhash_pairs(t["documents"], "text", "doc_id", max_hamming=3, bands=4)


@df_query(
    "multimodal_resize_plan",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1 AS INT)
               AS width,
             CAST(('0x' || substr(md5(text), 9, 8))::BIGINT % 1080 + 1 AS INT)
               AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           -- trunc(): DuckDB's double->INT cast rounds, Spark's truncates
           CAST(trunc(CASE WHEN GREATEST(width, height) > 512
                THEN CAST(width AS DOUBLE) * 512 / GREATEST(width, height)
                ELSE width END) AS INT) AS new_width,
           CAST(trunc(CASE WHEN GREATEST(width, height) > 512
                THEN CAST(height AS DOUBLE) * 512 / GREATEST(width, height)
                ELSE height END) AS INT) AS new_height
    FROM meta
    """,
)
def multimodal_resize_plan(spark, sf_dir):
    """Aspect-preserving resize planning over decoded metadata only (the
    payload bytes stay unread — column pruning makes this a metadata scan
    at 100 TB). The fake decoder's md5-derived dimensions let the oracle
    recompute the whole plan."""
    from flink_parent_spark.datapipe.multimodal import (
        attach_payload,
        decode_media,
        resize_plan,
    )

    t = load_tables(spark, sf_dir)
    d = attach_payload(t["documents"].select("doc_id", "text"), "text")
    d = decode_media(d)
    d = resize_plan(d, max_side=512)
    return d.select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("resize.new_width").alias("new_width"),
        F.col("resize.new_height").alias("new_height"),
    )


@df_query(
    "multimodal_audio_chunks",
    oracle="""
    SELECT d.doc_id,
           CAST(i.i AS INT) AS chunk_idx,
           CAST(i.i * 48 AS BIGINT) AS start_byte,
           CAST(LEAST(64, length(d.text) - i.i * 48) AS INT) AS n_bytes,
           md5(substr(d.text, i.i * 48 + 1, 64)) AS digest
    FROM documents d,
         UNNEST(generate_series(0,
                CAST(CEIL(CAST(length(d.text) AS DOUBLE) / 48) AS BIGINT) - 1))
           AS i(i)
    WHERE i.i * 48 < length(d.text)
    """,
)
def multimodal_audio_chunks(spark, sf_dir):
    """Overlapping fixed-size chunking of binary payloads (STFT-style
    framing: 64-byte windows, 48-byte hop) via Arrow-batched mapInPandas
    fan-out — the plumbing a real audio feature extractor plugs into. The
    fixture payloads are utf-8 text bytes (ASCII), so the oracle re-frames
    with substr + md5 exactly."""
    from flink_parent_spark.datapipe.multimodal import attach_payload, audio_chunks

    t = load_tables(spark, sf_dir)
    d = attach_payload(t["documents"].select("doc_id", "text"), "text")
    return audio_chunks(d, chunk_bytes=64, hop_bytes=48)


_DUCK_GRAMS2 = r"""
      SELECT doc_id, tok || ' ' || t1 AS g
      FROM (
        SELECT doc_id, tok, i, LEAD(tok, 1) OVER w AS t1
        FROM (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
                 generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
          FROM documents)
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)) g2
      WHERE t1 IS NOT NULL
"""

_DUCK_GRAMS3 = r"""
      SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS g
      FROM (
        SELECT doc_id, tok, i,
               LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        FROM (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
                 generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
          FROM documents)
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)) g3
      WHERE t2 IS NOT NULL
"""

_REPETITION_ORACLE = rf"""
    WITH bi AS ({_DUCK_GRAMS2}
    ), bic AS (
      SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g
    ), bstat AS (
      SELECT doc_id,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_share
      FROM bic GROUP BY doc_id
    ), tri AS ({_DUCK_GRAMS3}
    ), tric AS (
      SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g
    ), tstat AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS dup_trigram_frac
      FROM tric GROUP BY doc_id
    ), dstat AS (
      SELECT doc_id,
             CAST(COUNT(DISTINCT tok) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS distinct_token_ratio
      FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents) toks
      GROUP BY doc_id
    )
    SELECT b.doc_id, b.top_bigram_share, t.dup_trigram_frac,
           d.distinct_token_ratio
    FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
    JOIN dstat d ON b.doc_id = d.doc_id
"""


@df_query("text_repetition_stats", oracle=_REPETITION_ORACLE)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals per document (Rae et al. 2021):
    top-2-gram share, duplicated-3-gram occurrence fraction, distinct-token
    ratio. Pure explode+aggregate plans keyed by doc_id — scales as three
    map-side-combined aggregations over the corpus scan."""
    from flink_parent_spark.datapipe.text import repetition_stats

    t = load_tables(spark, sf_dir)
    return repetition_stats(t["documents"])


@df_query(
    "text_gopher_quality_filter",
    oracle=_REPETITION_ORACLE.replace(
        """    SELECT b.doc_id, b.top_bigram_share, t.dup_trigram_frac,
           d.distinct_token_ratio
    FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
    JOIN dstat d ON b.doc_id = d.doc_id
""",
        """    SELECT b.doc_id, b.top_bigram_share, t.dup_trigram_frac,
           d.distinct_token_ratio
    FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
    JOIN dstat d ON b.doc_id = d.doc_id
    JOIN documents doc ON b.doc_id = doc.doc_id
    WHERE doc.n_chars BETWEEN 120 AND 520
      AND b.top_bigram_share <= 0.06
      AND t.dup_trigram_frac <= 0.35
      AND d.distinct_token_ratio >= 0.45
""",
    ),
)
def text_gopher_quality_filter(spark, sf_dir):
    """Gopher rule-based quality gate: length band + repetition thresholds.
    The thresholds are the operator contract (tuned to split the synthetic
    corpus non-trivially); the shape — cheap per-doc signals then a
    conjunctive filter — is the standard pretraining-curation pass."""
    from flink_parent_spark.datapipe.text import repetition_stats

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    stats = repetition_stats(d)
    return (
        stats.join(d.select("doc_id", "n_chars"), "doc_id")
        .where(
            (F.col("n_chars").between(120, 520))
            & (F.col("top_bigram_share") <= 0.06)
            & (F.col("dup_trigram_frac") <= 0.35)
            & (F.col("distinct_token_ratio") >= 0.45)
        )
        .select(
            "doc_id", "top_bigram_share", "dup_trigram_frac",
            "distinct_token_ratio",
        )
    )


@df_query(
    "text_chunk_windows",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), st AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 48)) AS s
      FROM base
    )
    SELECT doc_id, CAST(s / 48 AS INT) AS chunk_id,
           array_to_string(list_slice(toks, s + 1, s + 64), ' ') AS chunk_text,
           CAST(least(len(toks) - s, 64) AS INT) AS n_chunk_tokens
    FROM st
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Context-window chunking: 64-token chunks with 16-token overlap
    (stride 48) — the standard pretraining/RAG windowing pass. Map-side
    sequence+slice+explode inside codegen; no shuffle, no Python."""
    from flink_parent_spark.datapipe.text import chunk_documents

    t = load_tables(spark, sf_dir)
    return chunk_documents(t["documents"], chunk_tokens=64, overlap=16)


@df_query(
    "sample_rebalance_source_mix",
    oracle="""
    WITH targets(source, t) AS (
      VALUES ('src0', 3.0), ('src1', 3.0), ('src2', 3.0), ('src3', 3.0),
             ('src4', 3.0), ('src5', 1.0), ('src6', 1.0), ('src7', 1.0),
             ('src8', 1.0), ('src9', 1.0), ('src10', 1.0), ('src11', 1.0),
             ('src12', 1.0), ('src13', 1.0), ('src14', 1.0), ('src15', 1.0),
             ('src16', 1.0), ('src17', 1.0), ('src18', 1.0), ('src19', 1.0)
    ), counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), bind AS (
      SELECT MIN(c.n / t.t) AS total
      FROM counts c JOIN targets t ON c.source = t.source
    ), pct AS (
      SELECT c.source,
             least(100, CAST(floor(100 * t.t * b.total / c.n) AS INT)) AS p
      FROM counts c, targets t, bind b
      WHERE c.source = t.source
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN pct ON d.source = pct.source
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < pct.p
    """,
)
def sample_rebalance_source_mix(spark, sf_dir):
    """Source/domain-mix rebalancing by deterministic downsampling: target
    weights 3:1 for src0-4 vs the rest; the binding source keeps 100%,
    every other source keeps the md5-bucket fraction matching its relative
    target. One tiny count aggregate + a map-side filter on the corpus
    scan."""
    from flink_parent_spark.datapipe.text import rebalance_source_mix

    t = load_tables(spark, sf_dir)
    targets = {f"src{i}": (3.0 if i < 5 else 1.0) for i in range(20)}
    return rebalance_source_mix(
        t["documents"].select("doc_id", "source"), targets
    )


@df_query(
    "dedup_winnow_pairs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
      FROM documents
    ), grams AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(tok || ' ' || t1 || ' ' || t2 || ' ' || t3),
                             1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id, tok, i,
               LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2,
               LEAD(tok, 3) OVER w AS t3
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)) g
      WHERE t3 IS NOT NULL
    ), win AS (
      SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM win WHERE i <= n - 4
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def dedup_winnow_pairs(spark, sf_dir):
    """Winnowing (MOSS) near-dup pairs: token 4-gram hashes, window-5
    minima as the fingerprint set, pairs sharing >= 2 fingerprints via the
    inverted-index join. The oracle replays hashing, window minima, and
    set semantics exactly."""
    from flink_parent_spark.datapipe.dedup import winnow_pairs

    t = load_tables(spark, sf_dir)
    return winnow_pairs(t["documents"], k=4, w=5, min_shared=2)


@df_query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ), total AS (
      SELECT SUM(c) AS t FROM freq
    ), logp AS (
      SELECT f.tok, ln(CAST(f.c AS DOUBLE) / CAST(total.t AS DOUBLE)) AS lp
      FROM freq f, total
    )
    SELECT t.doc_id,
           CAST(SUM(CAST(l.lp AS DECIMAL(30,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_logprob,
           COUNT(*) AS n_tokens
    FROM tok t JOIN logp l ON t.tok = l.tok
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring (the KenLM-style perplexity filter
    reduced to its order-1 core): fit token frequencies over the corpus,
    score each document by its mean token log-probability. Unusually low
    scores flag gibberish; unusually high flag degenerate repetition —
    the standard band-pass quality signal.

    Plan: one token-frequency aggregate (map-side combined), the log-prob
    table broadcast back onto the token stream, one per-doc aggregate.
    Decimal-summed log-probs keep the mean bit-exact cross-engine."""
    from flink_parent_spark.datapipe.text import tokens

    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    logp = freq.crossJoin(F.broadcast(total)).select(
        "tok",
        F.log(F.col("c").cast("double") / F.col("t").cast("double")).alias("lp"),
    )
    return (
        tok.join(F.broadcast(logp), "tok")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("lp").cast("decimal(30,12)")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_logprob"),
            F.count("*").alias("n_tokens"),
        )
    )


# --- PII scrubbing ----------------------------------------------------------

# Deterministic PII augmentation: the synthetic documents carry no PII, so
# the query plants one of each category derived from doc_id — the SAME SQL
# expression evaluates on both engines (Spark SQL and DuckDB agree on ||,
# CAST AS STRING, lpad, %), making redaction/count parity a real check.
_PII_AUG = (
    "text || ' contact user' || CAST(doc_id AS STRING) || '@mail' || "
    "CAST(doc_id % 7 AS STRING) || '.org from 10.0.' || "
    "CAST(doc_id % 256 AS STRING) || '.' || CAST((doc_id * 7) % 256 AS STRING) || "
    "' call 415-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || "
    "' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || "
    "' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
)


def _pii_oracle() -> str:
    # built from the same PII_PATTERNS list the Spark operator applies, in
    # the same order — the oracle re-runs the chain with RE2 + 'g'
    expr = "t"
    for _, pat, rep in PII_PATTERNS:
        expr = "regexp_replace(" + expr + ", '" + pat + "', '" + rep + "', 'g')"
    counts = ",\n           ".join(
        "len(regexp_extract_all(t, '" + pat + "')) AS n_" + name
        for name, pat, _ in PII_PATTERNS
    )
    return (
        "WITH aug AS (SELECT doc_id, " + _PII_AUG + " AS t FROM documents)\n"
        "    SELECT doc_id,\n           " + expr + " AS redacted,\n           "
        + counts + "\n    FROM aug"
    )


@df_query("text_pii_redaction", oracle=_pii_oracle())
def text_pii_redaction(spark, sf_dir):
    """PII scrub: typed-placeholder redaction (<EMAIL>/<CC>/<SSN>/<PHONE>/
    <IP>) plus per-category audit counts, all regexp column expressions —
    whole-stage codegen over the scan, no Python, map-parallel at 100 TB."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].withColumn("t", F.expr(_PII_AUG))
    counts = pii_counts("t")
    return d.select(
        "doc_id",
        redact_pii("t").alias("redacted"),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
    )


# --- exact duplicated-substring spans ---------------------------------------


@df_query(
    "dedup_duplicated_spans",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 4 + 2)) AS i
      FROM toks
    ),
    grams AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             {h} AS gh
      FROM idx
    ),
    dup AS (
      SELECT gh FROM grams GROUP BY gh
      HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 100000
    ),
    dup_grams AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
    ),
    covered AS (
      SELECT DISTINCT doc_id, pos + o AS tok
      FROM (SELECT doc_id, pos, unnest([0, 1, 2, 3]) AS o
            FROM dup_grams) off
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           coalesce(d.n_dup_grams, 0) AS n_dup_grams,
           coalesce(c.n_dup_tokens, 0) AS n_dup_tokens
    FROM grams g
    LEFT JOIN (SELECT doc_id, count(*) AS n_dup_grams
               FROM dup_grams GROUP BY doc_id) d USING (doc_id)
    LEFT JOIN (SELECT doc_id, count(*) AS n_dup_tokens
               FROM covered GROUP BY doc_id) c USING (doc_id)
    GROUP BY g.doc_id, d.n_dup_grams, c.n_dup_tokens
    """.replace(
        "{h}",
        _DUCK_H64.format(x="array_to_string(t[i:i + 4 - 1], ' ')"),
    ),
)
def dedup_duplicated_spans(spark, sf_dir):
    """Exact substring-level dedup (Lee et al., arXiv:2107.06499) as a
    distributed inverted index over all rolling 4-token grams: per
    document, how many of its grams — and how many of its token
    positions — occur verbatim in at least one other document."""
    t = load_tables(spark, sf_dir)
    return duplicated_spans(t["documents"], "text", "doc_id", n=4)


# --- end-to-end pipeline composition ----------------------------------------


def _e2e_oracle() -> str:
    scores = ",\n             ".join(
        "len(list_filter(toks, t -> list_contains([{ws}], lower(t)))) "
        "AS score_{k}".format(
            ws=",".join(f"'{w}'" for w in words), k=k
        )
        for k, words in STOPWORDS.items()
    )
    redact = "t_aug"
    for _, pat, rep in PII_PATTERNS:
        redact = (
            "regexp_replace(" + redact + ", '" + pat + "', '" + rep + "', 'g')"
        )
    shard = _DUCK_H64.format(x="digest") + " % 8"
    return (
        r"""
    WITH base AS (
      SELECT doc_id, lang, text,
             string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             """ + scores + r"""
      FROM base
    ), pred AS (
      SELECT doc_id, lang, text, n_tokens,
             CASE GREATEST(
                    score_en * 1000 - 101, score_de * 1000 - 100,
                    score_es * 1000 - 115, score_fr * 1000 - 102)
                  WHEN score_en * 1000 - 101 THEN 'en'
                  WHEN score_de * 1000 - 100 THEN 'de'
                  WHEN score_es * 1000 - 115 THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM scored
    ), kept AS (
      SELECT doc_id, lang, text FROM pred
      WHERE n_tokens >= 25 AND pred_lang = lang
    ), aug AS (
      SELECT doc_id, """ + _PII_AUG + r""" AS t_aug FROM kept
    ), red AS (
      SELECT doc_id, """ + redact + r""" AS clean FROM aug
    ), dig AS (
      SELECT doc_id, clean, md5(clean) AS digest FROM red
    ), dedup AS (
      SELECT doc_id, clean, digest FROM (
        SELECT *, row_number() OVER (PARTITION BY digest ORDER BY doc_id) rn
        FROM dig) WHERE rn = 1
    )
    SELECT """ + shard + r""" AS shard,
           count(*) AS n_docs,
           SUM(len(string_split_regex(trim(clean), '\s+'))) AS n_tokens_total,
           min(doc_id) AS min_doc
    FROM dedup GROUP BY 1
    """
    )


@df_query("datapipe_end_to_end", oracle=_e2e_oracle())
def datapipe_end_to_end(spark, sf_dir):
    """The whole training-data pipeline as ONE query — quality gate
    (token-count floor), language-ID consistency filter (n-gram stopword
    heuristic must agree with the labeled lang), PII scrub (synthetic-PII
    augmentation then the typed-placeholder redaction chain), exact dedup
    keep-first over the md5 digest of the CLEAN text, and hash-sharding
    with per-shard stats.

    Scale shape: every stage before dedup is a map-side codegen
    expression over the scan (no shuffle, no Python); dedup shuffles once
    on the digest; the shard rollup is a partial-agg'd small aggregate.
    At 100 TB this is scan -> one exchange -> tiny output, which is the
    correct plan for a cleaning pass."""
    from pyspark.sql import Window  # noqa: PLC0415

    from flink_parent_spark.datapipe.text import token_hash64  # noqa: PLC0415

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    q = text_quality("text")
    s = lang_id_scores("text")
    staged = d.select(
        "doc_id", "lang", "text",
        q["n_tokens"].alias("n_tokens"),
        s["pred_lang"].alias("pred_lang"),
    )
    kept = staged.where(
        (F.col("n_tokens") >= 25) & (F.col("pred_lang") == F.col("lang"))
    )
    red = kept.withColumn("t_aug", F.expr(_PII_AUG)).withColumn(
        "clean", redact_pii("t_aug")
    )
    dig = red.withColumn("digest", F.md5("clean"))
    w = Window.partitionBy("digest").orderBy("doc_id")
    dedup = dig.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        dedup.withColumn("shard", token_hash64(F.col("digest")) % 8)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("clean")).alias("n_tokens_total"),
            F.min("doc_id").alias("min_doc"),
        )
    )


# --- DSIR importance resampling ----------------------------------------------

# Shared oracle prelude: hashed unigram+bigram bag features and the two
# smoothed bucket models (target = lang-'en' docs, source = the full pool),
# mirroring datapipe.text.dsir_importance exactly (alpha=1, B=10000).
_DSIR_PRELUDE = rf"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split_regex(trim(text), '\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
      FROM documents
    ), grams AS (
      SELECT doc_id, tgt, tok AS g FROM toks
      UNION ALL
      SELECT doc_id, tgt, tok || ' ' || t1 AS g
      FROM (SELECT doc_id, tgt, tok,
                   LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1
            FROM toks) x
      WHERE t1 IS NOT NULL
    ), feats AS (
      SELECT doc_id, tgt, {_duck_h64('g')} % 10000 AS bucket FROM grams
    ), per_doc AS (
      SELECT doc_id, tgt, bucket, COUNT(*) AS c_doc
      FROM feats GROUP BY 1, 2, 3
    ), per_bucket AS (
      SELECT bucket, SUM(c_doc) AS c_src,
             SUM(CASE WHEN tgt THEN c_doc ELSE 0 END) AS c_tgt
      FROM per_doc GROUP BY bucket
    ), totals AS (
      SELECT SUM(c_src) AS t_src, SUM(c_tgt) AS t_tgt FROM per_bucket
    ), ratio AS (
      SELECT bucket,
             CAST(CAST(ln((c_tgt + 1.0) / (t_tgt + 10000.0))
                 - ln((c_src + 1.0) / (t_src + 10000.0))
               AS DECIMAL(30,12)) AS DOUBLE) AS log_ratio
      FROM per_bucket, totals
    ), scored AS (
      SELECT p.doc_id,
             CAST(SUM(CAST(CAST(p.c_doc AS DOUBLE) * r.log_ratio
                           AS DECIMAL(30,12))) AS DOUBLE) AS logw,
             SUM(p.c_doc) AS n_feats
      FROM per_doc p JOIN ratio r USING (bucket)
      GROUP BY p.doc_id
    )
"""


@df_query(
    "text_dsir_scores",
    oracle=_DSIR_PRELUDE + "SELECT doc_id, logw, n_feats FROM scored",
)
def text_dsir_scores(spark, sf_dir):
    """DSIR importance weights (Xie et al., arXiv:2302.03169 §3.1): hashed
    unigram+bigram bag models for the target distribution (here: the
    corpus's English documents) and the raw pool; every document scored by
    sum_f c_f(x) (log p_tgt(f) - log p_src(f)), Laplace alpha=1 over
    10000 buckets. The oracle refits both models from first principles."""
    from flink_parent_spark.datapipe.text import dsir_importance

    t = load_tables(spark, sf_dir)
    return dsir_importance(t["documents"], F.col("lang") == "en")


@df_query(
    "text_dsir_resample",
    oracle=_DSIR_PRELUDE
    + """
    , keyed AS (
      SELECT doc_id, logw, n_feats,
             logw + CAST(CAST(-ln(-ln((("""
    + _duck_h64("CAST(doc_id AS VARCHAR)")
    + """ % 1073741824) + 0.5) / 1073741824.0))
               AS DECIMAL(30,12)) AS DOUBLE) AS gumbel_key
      FROM scored
    )
    SELECT * FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 100
    """,
)
def text_dsir_resample(spark, sf_dir):
    """DSIR Gumbel top-k resampling (arXiv:2302.03169 §3.2) with
    hash-derived Gumbel noise: deterministic, restart-stable selection of
    the 100 documents with the highest perturbed importance weight —
    sampling-without-replacement proportional to w(x) in expectation over
    the hash's uniformity, yet bit-reproducible for the oracle."""
    from flink_parent_spark.datapipe.text import dsir_importance, dsir_resample

    t = load_tables(spark, sf_dir)
    scored = dsir_importance(t["documents"], F.col("lang") == "en")
    return dsir_resample(scored, k=100)


# --- round-7 block-4 additions: CCNet line dedup, Bloom incremental dedup,
# vocabulary counts ----------------------------------------------------------


@df_query(
    "dedup_line_level",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      FROM documents
    ), lines0 AS (
      SELECT doc_id, tk,
             CAST(unnest(range(0, CAST(ceil(len(tk) / 12.0) AS BIGINT))) AS BIGINT) AS pos
      FROM toks
    ), lines AS (
      SELECT doc_id, pos,
             array_to_string(tk[(pos*12+1):(pos*12+12)], ' ') AS line
      FROM lines0
    ), ranked AS (
      SELECT doc_id, pos, line,
             row_number() OVER (
               PARTITION BY ('0x' || substr(md5(trim(line)), 1, 15))::BIGINT,
                            trim(line)
               ORDER BY doc_id, pos) AS rn
      FROM lines
    ), agg AS (
      SELECT doc_id,
             coalesce(
               array_to_string(list(line ORDER BY pos) FILTER (WHERE rn = 1), ' '),
               '') AS text,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM ranked
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.text, '') AS text,
           coalesce(a.n_lines, 0) AS n_lines,
           coalesce(a.n_dropped, 0) AS n_dropped
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_line_level(spark, sf_dir):
    """CCNet line-level dedup (arXiv:1911.00359): every repeated line across
    the corpus is dropped except its globally-first (doc_id, position)
    occurrence; documents are re-joined from their surviving lines. Lines
    here are 12-token windows (the corpus is single-line); real corpora
    pass split_pattern='\\n'. The oracle recomputes the full first-
    occurrence ranking and reassembly independently."""
    from flink_parent_spark.datapipe.dedup import line_dedup

    t = load_tables(spark, sf_dir)
    return line_dedup(t["documents"], "text", "doc_id", line_tokens=12)


@df_query(
    "dedup_bloom_incremental",
    oracle=r"""
    WITH corpus AS (
      SELECT md5(text) AS d FROM documents
      WHERE CAST(substr(source, 4) AS INT) < 10
    ), probe AS (
      SELECT doc_id, md5(text) AS d FROM documents
      WHERE CAST(substr(source, 4) AS INT) >= 10
    ), cpos AS (
      SELECT DISTINCT
             ('0x' || substr(d, r.j*8+1, 8))::BIGINT % 1048576 AS pos
      FROM corpus, range(4) AS r(j)
    ), bloom AS (
      SELECT pos // 63 AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
      FROM cpos GROUP BY 1
    ), ppos AS (
      SELECT doc_id,
             ('0x' || substr(d, r.j*8+1, 8))::BIGINT % 1048576 AS pos
      FROM probe, range(4) AS r(j)
    )
    SELECT p.doc_id,
           min(CASE WHEN (coalesce(b.word, 0) >> CAST(p.pos % 63 AS INT)) & 1 = 1
                    THEN 1 ELSE 0 END) = 1 AS maybe_dup
    FROM ppos p LEFT JOIN bloom b ON b.bucket = p.pos // 63
    GROUP BY p.doc_id
    """,
)
def dedup_bloom_incremental(spark, sf_dir):
    """Incremental dedup of an incoming batch (sources src10+) against the
    standing corpus (src0-src9) through a distributed Bloom filter
    (md5-derived k=4 positions over 2^20 bits — deterministic, so the
    oracle rebuilds the identical filter, false positives included; at
    these cardinalities the FP probability is ~1e-8 per probe)."""
    from flink_parent_spark.datapipe.dedup import bloom_incremental_dedup

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    src_num = F.substring("source", 4, 10).cast("int")
    corpus = d.filter(src_num < 10)
    probe = d.filter(src_num >= 10)
    return bloom_incremental_dedup(corpus, probe, "text", "doc_id", m=1 << 20, k=4)


@df_query(
    "text_vocab_topk",
    oracle=r"""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT lower(unnest(string_split_regex(trim(text), '\s+'))) AS word
      FROM documents
    )
    GROUP BY word
    HAVING count(*) >= 5
    ORDER BY n DESC, word
    LIMIT 200
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Vocabulary construction: corpus word counts with a frequency floor,
    top-200 under the (count desc, word asc) total order. The sort-limit
    plans as TakeOrderedAndProject (per-partition heaps), not a global
    sort of the vocabulary."""
    from flink_parent_spark.datapipe.text import vocabulary

    t = load_tables(spark, sf_dir)
    v = vocabulary(t["documents"], "text", min_count=5)
    return v.orderBy(F.desc("n"), "word").limit(200)


@df_query(
    "text_vocab_docfreq",
    oracle=r"""
    SELECT word, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
      SELECT doc_id,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS word
      FROM documents
    )
    GROUP BY word
    HAVING count(*) >= 5
    ORDER BY n DESC, n_docs DESC, word
    LIMIT 200
    """,
)
def text_vocab_docfreq(spark, sf_dir):
    """Vocabulary with document frequency (the IDF denominator):
    vocabulary(id_col=...) returns (word, n, n_docs) from one groupBy —
    the per-word distinct-doc count a TF-IDF or stopword filter needs."""
    from flink_parent_spark.datapipe.text import vocabulary

    t = load_tables(spark, sf_dir)
    v = vocabulary(t["documents"], "text", id_col="doc_id", min_count=5)
    return v.orderBy(F.desc("n"), F.desc("n_docs"), "word").limit(200)


@df_query(
    "ml_naive_bayes_langid",
    oracle=r"""
    WITH train AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0
    ), test AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), tw AS (
      SELECT lang AS label,
             unnest(string_split_regex(trim(text), '\s+')) AS word
      FROM train
    ), cw AS (
      SELECT label, word, count(*) AS c FROM tw GROUP BY 1, 2
    ), tot AS (
      SELECT label, sum(c) AS tot FROM cw GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(DISTINCT word) AS DOUBLE) AS v FROM tw
    ), nall AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM train
    ), labels AS (
      SELECT p.label,
             CAST(CAST(ln(CAST(p.nd AS DOUBLE) / nall.n)
                  AS DECIMAL(30,12)) AS DOUBLE) AS prior_logp,
             CAST(CAST(ln(1.0 / (t.tot + vocab.v))
                  AS DECIMAL(30,12)) AS DOUBLE) AS default_logp
      FROM (SELECT lang AS label, count(*) AS nd FROM train GROUP BY 1) p,
           nall, vocab, tot t
      WHERE t.label = p.label
    ), logp AS (
      SELECT cw.label, cw.word,
             CAST(CAST(ln((cw.c + 1.0) / (t.tot + vocab.v))
                  AS DECIMAL(30,12)) AS DOUBLE) AS logp
      FROM cw, tot t, vocab WHERE t.label = cw.label
    ), dw AS (
      SELECT doc_id, word, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS word
            FROM test)
      GROUP BY 1, 2
    ), scored AS (
      SELECT dw.doc_id, l.label,
             l.prior_logp + CAST(SUM(CAST(
               CAST(dw.c AS DOUBLE) * coalesce(lp.logp, l.default_logp)
               AS DECIMAL(30,12))) AS DOUBLE) AS score
      FROM dw CROSS JOIN labels l
      LEFT JOIN logp lp ON lp.label = l.label AND lp.word = dw.word
      GROUP BY dw.doc_id, l.label, l.prior_logp
    ), ranked AS (
      SELECT doc_id, label AS pred_label, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label) AS rn
      FROM scored
    )
    SELECT doc_id, pred_label, score FROM ranked WHERE rn = 1
    """,
)
def ml_naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language identification: fit on the 80%
    train split (doc_id % 5 <> 0), predict the held-out 20%. The oracle
    refits the full model — counts, add-one smoothing, DECIMAL(30,12)
    log-prob quantization, decimal score accumulation, (score desc, label)
    argmax — from first principles."""
    from flink_parent_spark.ml.naive_bayes import (
        naive_bayes_fit,
        naive_bayes_predict,
    )

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    word_logp, labels = naive_bayes_fit(train, "text", "lang")
    return naive_bayes_predict(word_logp, labels, test, "text", "doc_id").select(
        "doc_id", F.col("pred_label").alias("pred_label"), "score"
    )
