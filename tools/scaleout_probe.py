"""Scale-out evidence probe (r16 VERDICT item 2).

The sf0.1 bench cannot demonstrate parallel scale-out — every headline
entry is dominated by fixed per-job cost, so the 8-vs-32-core ratio reads
~1 for everything (r15 scaling block; reproduced in this round's
baselines). This tool measures the heavy operator paths at a synthetic
volume where compute dominates, so the ratio reflects the operators, not
the driver.

Paths (real operators from the tree, not reimplementations):
- dsir:    `dsir_importance` (hashed n-gram features + bucket models +
           scoring) over a generated corpus — the text_dsir_scores shape.
- minhash: `minhash_lsh_pairs` candidate generation (signatures + banding
           + band join) — the dedup_minhash_lsh_pairs shape.
- ann:     brute-force cosine scoring `cosine_topk` over a large candidate
           table — the ann scoring shape.
- rollup:  a q67-shaped GROUP BY ROLLUP (8 grouping columns -> Expand x9
           feeding a partial aggregate + rank window top-100).

Usage:
  python tools/scaleout_probe.py --run <cores> [path ...]   # one leg
  python tools/scaleout_probe.py                            # orchestrate

The orchestrator generates the corpora once (untimed), then runs the legs
as separate subprocesses interleaved 8-32 x3 (fresh JVM each, box drift
lands on both sides), takes best-of-3 per (path, cores), and prints one
JSON line with per-path ratios low_cores_sec/high_cores_sec. A
parallelising path should read well above 1 (ideal 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DATA_DIR = "/tmp/scaleout_probe_data_v3"
PATHS = ("dsir", "minhash", "ann", "rollup")
LOW, HIGH = 8, 32


def _spark(cores: int):
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from flink_parent_spark.session import get_spark

    return get_spark(f"scaleout-{cores}", cpus=cores)


def generate(spark) -> None:
    """Deterministic corpora, written once; legs only read."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DATA_DIR, "_COMPLETE")):
        return
    # text corpus: 80k docs x 200 tokens; per-position token drawn from a
    # 40-word vocabulary via xxhash64(id, pos) so documents are unique
    # (id*const % 40 would make the whole text periodic in id — 1500
    # copies of 40 texts — which degenerates the dedup path)
    docs = spark.range(80000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 == 0).alias("is_en"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{i}_"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(40)).cast("string"),
                )
                for i in range(200)
            ],
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(f"{DATA_DIR}/docs")
    # embedding corpus: 12M vectors x dim 16
    vecs = spark.range(12_000_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (((F.col("id") * (i + 3) + i) % 1009 + 1).cast("float") / 7.0)
                for i in range(16)
            ]
        ).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(f"{DATA_DIR}/vecs")
    # q67-shaped fact: 40M rows, 8 grouping columns + a measure
    fact = spark.range(40_000_000).select(
        (F.col("id") % 1000).alias("item"),
        (F.col("id") % 7).alias("d_year"),
        (F.col("id") % 4).alias("d_qoy"),
        (F.col("id") % 12).alias("d_moy"),
        (F.col("id") % 50).alias("store"),
        (F.col("id") % 5).alias("brand"),
        (F.col("id") % 11).alias("class"),
        (F.col("id") % 13).alias("category"),
        ((F.col("id") * 37) % 10000).cast("decimal(7,2)").alias("sales"),
    )
    fact.write.mode("overwrite").parquet(f"{DATA_DIR}/fact")
    open(os.path.join(DATA_DIR, "_COMPLETE"), "w").write("ok")


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_path(spark, path: str) -> float:
    from pyspark.sql import functions as F

    from flink_parent_spark.datapipe.dedup import minhash_lsh_pairs
    from flink_parent_spark.datapipe.similarity import cosine_topk
    from flink_parent_spark.datapipe.text import dsir_importance

    spark.sparkContext.setJobDescription(f"scaleout:{path}")
    if path == "dsir":
        docs = spark.read.parquet(f"{DATA_DIR}/docs")
        return _noop(dsir_importance(docs, F.col("is_en")))
    if path == "minhash":
        docs = spark.read.parquet(f"{DATA_DIR}/docs")
        return _noop(
            minhash_lsh_pairs(docs, "text", "doc_id", n=3, k=16, bands=4,
                              verify_threshold=None, max_band_freq=1000)
        )
    if path == "ann":
        vecs = spark.read.parquet(f"{DATA_DIR}/vecs")
        q = vecs.filter(F.col("vec_id") < 8)
        return _noop(cosine_topk(q, vecs, k=5, allow_full_scan=True))
    if path == "rollup":
        fact = spark.read.parquet(f"{DATA_DIR}/fact")
        fact.createOrReplaceTempView("so_fact")
        return _noop(
            spark.sql(
                """
                SELECT * FROM (
                  SELECT item, d_year, d_qoy, d_moy, store, brand, class,
                         category, SUM(sales) AS sumsales,
                         RANK() OVER (PARTITION BY item
                                      ORDER BY SUM(sales) DESC) AS rk
                  FROM so_fact
                  GROUP BY ROLLUP (item, d_year, d_qoy, d_moy, store,
                                   brand, class, category)
                ) WHERE rk <= 100
                """
            )
        )
    raise ValueError(path)


def main() -> None:
    args = sys.argv[1:]
    if "--run" in args:
        i = args.index("--run")
        cores = int(args[i + 1])
        paths = args[i + 2:] or list(PATHS)
        spark = _spark(cores)
        out = {}
        for p in paths:
            out[p] = round(run_path(spark, p), 2)
            print(f"[scaleout] cores={cores} {p}: {out[p]}s", file=sys.stderr, flush=True)
        print(json.dumps({"cores": cores, "sec": out}))
        return

    # orchestrator: generate once, then interleave fresh-JVM legs
    spark = _spark(HIGH)
    generate(spark)
    spark.stop()
    results: dict[int, list[dict]] = {LOW: [], HIGH: []}
    for cores in (LOW, HIGH, LOW, HIGH, LOW, HIGH):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True, text=True, check=True,
        )
        results[cores].append(json.loads(r.stdout.strip().splitlines()[-1]))
        print(r.stderr.splitlines()[-1] if r.stderr else "", file=sys.stderr)
    best = {
        cores: {p: min(run["sec"][p] for run in runs) for p in PATHS}
        for cores, runs in results.items()
    }
    ratios = {p: round(best[LOW][p] / best[HIGH][p], 2) for p in PATHS}
    print(
        json.dumps(
            {
                "metric": "scaleout_8_vs_32",
                "low_cores": LOW,
                "high_cores": HIGH,
                "best_sec": best,
                "all_runs": results,
                "ratio_low_over_high": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
