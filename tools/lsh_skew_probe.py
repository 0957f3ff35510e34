"""MinHash-LSH band-skew probe (r16 VERDICT item 1).

Two measurements, one JSON line each:

1. `--dist [sf_dir]`: the band-key frequency distribution of the real
   corpus — how hot the hottest band digest is at this SF (the declared
   queries run uncapped, so this is the evidence that the default None cap
   cannot fire on them).

2. `--ab`: interleaved A/B of candidate generation on a synthetic
   skewed corpus (`N_HOT` near-identical docs — every band digest shared
   by all of them — over a background of unique docs), uncapped vs
   `max_band_freq` capped, noop sink, alternating U-C-U-C so box drift
   cancels. The uncapped leg pays ~N_HOT^2/2 join rows per hot band in
   single tasks (the quadratic straggler); the capped leg drops the hot
   bands before the join. Output-semantics difference is the point of the
   guard and is reported (pair counts), not hidden.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_parent_spark.session import get_spark


def band_distribution(spark, sf_dir: str) -> dict:
    from flink_parent_spark.datapipe.dedup import (
        _shingle_hash_arrays,
        _sig_array,
    )
    from flink_parent_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    k, bands = 16, 4
    rows_per_band = k // bands
    ha = _shingle_hash_arrays(t["documents"], "text", "doc_id", 3)
    sig_doc = ha.filter(F.size("__ha") > 0).select(
        "__id", _sig_array(F.col("__ha"), k).alias("__sig")
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    F.lit(j),
                    F.array_join(
                        F.slice(F.col("__sig"), j * rows_per_band + 1, rows_per_band),
                        "_",
                    ),
                )
            )
            for j in range(bands)
        ]
    )
    freq = (
        sig_doc.select(F.explode(band_keys).alias("band_key"))
        .groupBy("band_key")
        .count()
    )
    stats = freq.agg(
        F.count("*").alias("n_bands"),
        F.max("count").alias("max_freq"),
        F.expr("percentile(count, 0.5)").alias("p50"),
        F.expr("percentile(count, 0.99)").alias("p99"),
        F.sum((F.col("count") > 1).cast("long")).alias("n_shared"),
    ).collect()[0]
    top = [
        (r["band_key"][:8], r["count"])
        for r in freq.orderBy(F.desc("count")).limit(10).collect()
    ]
    return {
        "metric": "lsh_band_key_distribution",
        "sf_dir": sf_dir,
        "n_bands": stats["n_bands"],
        "max_freq": stats["max_freq"],
        "p50": stats["p50"],
        "p99": stats["p99"],
        "n_shared_bands": stats["n_shared"],
        "top10": top,
    }


def skew_ab(spark, n_hot: int = 10000, n_bg: int = 20000, reps: int = 3) -> dict:
    from flink_parent_spark.datapipe.dedup import minhash_lsh_pairs

    hot_text = " ".join(f"hot{i}" for i in range(40))
    hot = spark.range(n_hot).select(
        F.col("id").cast("int").alias("doc_id"), F.lit(hot_text).alias("text")
    )
    bg = spark.range(n_bg).select(
        (F.col("id") + 1_000_000).cast("int").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{i}_"), F.col("id").cast("string")) for i in range(40)],
        ).alias("text"),
    )
    corpus = hot.unionByName(bg)
    corpus.write.mode("overwrite").parquet("/tmp/lsh_skew_corpus")
    df = spark.read.parquet("/tmp/lsh_skew_corpus")

    def leg(cap):
        def run():
            out = minhash_lsh_pairs(
                df, "text", "doc_id", n=3, k=16, bands=4,
                verify_threshold=None, max_band_freq=cap,
            )
            t0 = time.time()
            out.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        return run

    legs = {"uncapped": leg(None), "capped_1000": leg(1000)}
    times = {k: [] for k in legs}
    # one untimed warmup of each leg: JIT + shuffle-file/GC settling from
    # the first uncapped run otherwise lands on the first timed capped rep
    for name, fn in legs.items():
        spark.sparkContext.setJobDescription(f"lsh-skew warmup {name}")
        fn()
    for rep in range(reps):
        for name, fn in legs.items():
            spark.sparkContext.setJobDescription(f"lsh-skew {name} rep{rep}")
            dt = fn()
            times[name].append(round(dt, 2))
            print(f"[lsh-skew] rep{rep} {name}: {dt:.1f}s", file=sys.stderr, flush=True)
    n_unc = minhash_lsh_pairs(
        df, "text", "doc_id", n=3, k=16, bands=4, verify_threshold=None
    ).count()
    n_cap = minhash_lsh_pairs(
        df, "text", "doc_id", n=3, k=16, bands=4,
        verify_threshold=None, max_band_freq=1000,
    ).count()
    med = {k: statistics.median(v) for k, v in times.items()}
    return {
        "metric": "lsh_band_skew_ab",
        "n_hot": n_hot,
        "n_bg": n_bg,
        "runs_sec": times,
        "median_sec": med,
        "speedup_capped": round(med["uncapped"] / med["capped_1000"], 2),
        "pairs_uncapped": n_unc,
        "pairs_capped": n_cap,
    }


def main() -> None:
    args = sys.argv[1:]
    spark = get_spark("lsh-skew-probe")
    if "--dist" in args:
        rest = [a for a in args if not a.startswith("--")]
        sf_dir = rest[0] if rest else "/root/testdata/sf0.1"
        print(json.dumps(band_distribution(spark, sf_dir)))
    if "--ab" in args:
        print(json.dumps(skew_ab(spark)))


if __name__ == "__main__":
    main()
