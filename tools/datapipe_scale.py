"""At-volume sweep of the LLM-data-pipeline operators.

The catalog checks these operators' VALUES at sf0.01 and their plans in
the snapshot battery; this tool demonstrates them at real volume — the
datapipe analog of tools/tpcds_sf1_full.py. It builds a deterministic
scaled corpus from the sf0.1 tables (default 200 replicas: 1,000,000
documents ≈ 300 MB of text, 400,000 64-d embeddings) with planted
structure — per (doc, replica): 1/50 exact duplicates, 1/50 near-dups
(trailing tokens dropped), the rest genuinely unique (md5-derived token
streams) — and times each
operator family end-to-end on local[$SPARK_GRAFT_CPUS].

    python tools/datapipe_scale.py              # full sweep, one JSON line
    FPS_DATAPIPE_REP=50 python tools/...        # smaller corpus

The corpus is cached under /tmp/fps_datapipe_scale/ keyed by replica
count; delete the directory to regenerate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("FPS_DATAPIPE_REP", "200"))
EREP = int(os.environ.get("FPS_DATAPIPE_EREP", str(REP)))
BASE = "/tmp/fps_datapipe_scale"


def build_corpus(spark):
    """Deterministic scaled corpus, written once and cached. Replica 0 is
    the original corpus; for replica r > 0 a doc keeps its exact text when
    (doc_id + r) % 50 == 0 (planted exact dups, expected cluster ~REP/50),
    loses its last tokens when == 1 (planted near-dups), and otherwise
    becomes a synthetic md5-derived token stream — genuinely UNIQUE under
    shingle similarity,
    not a salted copy, so dup cliques stay at realistic sizes instead of
    every replica of a base doc being a near-dup of every other."""
    docs_path = f"{BASE}/docs_rep{REP}"
    emb_path = f"{BASE}/emb_rep{EREP}"

    def complete(p):
        # bare exists() would accept a run killed mid-write; the _SUCCESS
        # marker is Spark's commit record
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    if not complete(docs_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        r = spark.range(REP).withColumnRenamed("id", "__r")
        # synthetic token stream: md5-derived 6-hex "words" keyed by the
        # NEW (globally unique) doc id and the position — no two synth
        # docs share a token stream, and cross-doc gram collisions are
        # negligible (16^6 vocabulary), so these docs are genuinely unique
        # under both exact and shingle similarity
        new_id = F.col("__r") * 10_000_000 + F.col("doc_id")
        synth = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.substring(
                    F.md5(
                        F.concat(
                            new_id.cast("string"), F.lit("_"), i.cast("string")
                        )
                    ),
                    1,
                    6,
                ),
            ),
            " ",
        )
        scaled = (
            docs.crossJoin(r)
            .select(
                (F.col("__r") * 10_000_000 + F.col("doc_id")).alias("doc_id"),
                F.when(F.col("__r") == 0, F.col("text"))
                .when(
                    F.pmod(F.col("doc_id") + F.col("__r"), F.lit(50)) == 0,
                    F.col("text"),
                )
                .when(
                    F.pmod(F.col("doc_id") + F.col("__r"), F.lit(50)) == 1,
                    F.regexp_replace(
                        "text", r"(\s+\S+){1,3}$", ""
                    ),
                )
                .otherwise(synth)
                .alias("text"),
                "lang",
                "source",
            )
            .repartition(64)
        )
        scaled.write.mode("overwrite").parquet(docs_path)
    if not complete(emb_path):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        r = spark.range(EREP).withColumnRenamed("id", "__r")
        scaled = (
            emb.crossJoin(r)
            .select(
                (F.col("__r") * 10_000_000 + F.col("vec_id")).alias("vec_id"),
                F.when(F.col("__r") == 0, F.col("embedding"))
                .otherwise(
                    F.transform(
                        "embedding",
                        # the final cast keeps the element type float:
                        # the intermediate arithmetic widens to double and
                        # would otherwise promote the whole column (and
                        # coerce the replica-0 originals with it)
                        lambda x, i: (
                            x
                            + (
                                F.pmod(
                                    F.col("__r") * 31 + F.col("vec_id") * 7 + i,
                                    F.lit(7),
                                ).cast("double")
                                - 3.0
                            )
                            * 1e-3
                        ).cast("float"),
                    )
                )
                .alias("embedding"),
            )
            .repartition(32)
        )
        scaled.write.mode("overwrite").parquet(emb_path)
    return spark.read.parquet(docs_path), spark.read.parquet(emb_path)


def main() -> None:
    from flink_parent_spark.datapipe.dedup import (  # noqa: PLC0415
        bloom_incremental_dedup,
        duplicated_spans,
        exact_dedup,
        line_dedup,
        minhash_lsh_pairs,
        simhash,
    )
    from flink_parent_spark.datapipe.similarity import (  # noqa: PLC0415
        ivf_kmeans_topk,
        semdedup,
    )
    from flink_parent_spark.datapipe.text import (  # noqa: PLC0415
        dsir_importance,
        dsir_resample,
        lang_id_scores,
        redact_pii,
        text_quality,
        token_count,
        vocabulary,
    )

    from flink_parent_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("datapipe_scale")
    t0 = time.time()
    docs, emb = build_corpus(spark)
    n_docs, n_vecs = docs.count(), emb.count()
    gen_sec = round(time.time() - t0, 1)

    queries = emb.filter(F.col("vec_id") < 50)

    def text_pipeline(d):
        q = text_quality("text")
        s = lang_id_scores("text")
        staged = d.select(
            "doc_id",
            "source",
            redact_pii("text").alias("clean"),
            q["n_tokens"].alias("n_tokens"),
            s["pred_lang"].alias("pred_lang"),
        ).where(F.col("n_tokens") >= 10)
        return staged.groupBy("source", "pred_lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("clean")).alias("n_tokens_total"),
        )

    entries = {
        "exact_dedup": lambda: exact_dedup(docs, "text", "doc_id"),
        "simhash": lambda: simhash(docs, "text", "doc_id"),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(
            docs, "text", "doc_id", verify_threshold=0.8
        ),
        "duplicated_spans": lambda: duplicated_spans(docs, "text", "doc_id"),
        "text_pipeline": lambda: text_pipeline(docs),
        "dsir_scores": lambda: dsir_importance(docs, F.col("lang") == "en"),
        "dsir_resample_top10k": lambda: dsir_resample(
            dsir_importance(docs, F.col("lang") == "en"), k=10_000
        ),
        # line dedup at volume: the planted exact dups make whole docs'
        # lines collapse; the synth docs keep theirs
        "line_dedup": lambda: line_dedup(docs, "text", "doc_id"),
        # incremental bloom: first replica block is the standing corpus,
        # the rest probe against it (m sized for ~1e-9 FP at this n)
        "bloom_incremental": lambda: bloom_incremental_dedup(
            docs.filter(F.col("doc_id") < 10_000_000),
            docs.filter(F.col("doc_id") >= 10_000_000),
            "text",
            "doc_id",
            m=1 << 27,
        ),
        "vocab_min5": lambda: vocabulary(docs, "text", min_count=5),
        # SemDeDup at volume: n_centroids unset -> auto ~sqrt(n) (so cells
        # stay ~sqrt(n)-sized and the within-cell pair scan is ~n^1.5, not
        # n^2/k); pair_budget guards against a runaway cell
        "semdedup": lambda: semdedup(
            emb,
            eps=0.3,
            n_iters=1,
            train_sample_pct=2,
            pair_budget=200_000_000,
        ),
        "ann_ivf_kmeans_topk": lambda: ivf_kmeans_topk(
            queries,
            emb,
            k=5,
            n_centroids=32,
            nprobe=4,
            train_sample_pct=5,
        ),
    }
    timings: dict = {}
    rows: dict = {}
    for name, fn in entries.items():
        t0 = time.time()
        rows[name] = fn().count()
        timings[name] = round(time.time() - t0, 1)
        print(f"[scale] {name}: {timings[name]}s, {rows[name]} rows", flush=True)

    print(
        json.dumps(
            {
                "metric": "datapipe_at_volume_wall_time",
                "docs": n_docs,
                "embeddings": n_vecs,
                "gen_sec": gen_sec,
                "value": round(sum(timings.values()), 1),
                "unit": "sec",
                "entries": timings,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
