"""Per-group Arrow invocation overhead probe for the watermarked-MR hot
loop (r16 VERDICT item 6).

The r15 mr_cep_ab profile attributed the watermarked-MR leg's cost to the
applyInPandasWithState per-group invocation machinery (state
(de)serialization + pandas construction per (group, micro-batch)), not
the matcher. The knobs Spark exposes for that boundary:

- `spark.sql.execution.arrow.maxRecordsPerBatch` — how input groups are
  chunked into Arrow batches crossing the JVM->Python boundary;
- `spark.sql.shuffle.partitions` — how many state-store partitions (and
  so per-micro-batch task invocations) the groupBy produces.

This tool runs the SAME watermarked-MR leg as tools/mr_cep_ab.py at
volume under each config variant, interleaved round-robin (one variant
ordering per rep so box drift cancels), asserts the output identical
across every run, and reports medians. If every variant reads flat, the
per-group floor is Spark's invocation machinery, not a sizing problem.

    python tools/stream_group_overhead.py                  # 10M events
    FPS_STREAMING_REP=10 python tools/stream_group_overhead.py  # 1M smoke
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.streaming_scale as S  # noqa: E402
from tools.mr_cep_ab import leg_hash  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    "default_10k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    "arrow_2k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
    "arrow_64k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    "parts_8": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.shuffle.partitions": "8",
    },
}


def main() -> None:
    from flink_parent_spark.session import get_spark  # noqa: PLC0415
    from flink_parent_spark.streaming.core import run_stream_to_df  # noqa: PLC0415
    from flink_parent_spark.streaming.match_recognize_sql import (  # noqa: PLC0415
        match_recognize_sql,
    )

    spark = get_spark("stream-group-overhead")
    reps = int(os.environ.get("FPS_MR_CEP_REPS", "3"))
    path = S.build_events(spark)
    n_events = spark.read.parquet(path).count()
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")

    # the SAME clause/leg as tools/mr_cep_ab.py's mr_watermarked — this
    # sweep varies only session confs around it
    clause = """
      PARTITION BY user_id
      ORDER BY ts
      MEASURES FIRST(A.event_id) AS a_first,
               LAST(A.event_id, 1) AS a_second_last,
               COUNT(A.*) AS a_n,
               SUM(A.value) AS a_sum,
               AVG(A.value) AS a_avg,
               B.event_id AS b_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A+ B)
      DEFINE A AS A.event_type = 'view',
             B AS B.event_type = 'purchase'
    """

    def mr_leg():
        ev = S.open_stream(spark, path)
        return run_stream_to_df(
            match_recognize_sql(
                ev.select("user_id", "event_id", "event_type", "value", "ts"),
                clause,
                "event_id",
                streaming=True,
            ),
            "update",
            timeout_s=1800,
        )

    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    ref_hash = None
    order = list(VARIANTS)
    for rep in range(reps):
        # rotate the variant order per rep so slow-drift lands evenly
        for name in order[rep % len(order):] + order[: rep % len(order)]:
            for k, v in VARIANTS[name].items():
                spark.conf.set(k, v)
            t0 = time.time()
            out = mr_leg()
            dt = time.time() - t0
            h = leg_hash(out)
            if ref_hash is None:
                ref_hash = h
            elif h != ref_hash:
                raise RuntimeError(
                    f"{name} output differs: {h} != {ref_hash}"
                )
            times[name].append(round(dt, 2))
            print(
                f"[group-overhead] rep{rep} {name}: {dt:.1f}s (rows={h[0]})",
                file=sys.stderr,
                flush=True,
            )
            # restore defaults between runs
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
            )
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    med = {k: round(statistics.median(v), 2) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "mr_group_invocation_overhead_sweep",
                "events": n_events,
                "reps": reps,
                "runs_sec": times,
                "median_sec": med,
                "vs_default": {
                    k: round(v / med["default_10k"], 3) for k, v in med.items()
                },
                "out_rows": ref_hash[0] if ref_hash else None,
            }
        )
    )


if __name__ == "__main__":
    main()
