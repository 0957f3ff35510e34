"""Same-sitting interleaved ratio: watermarked MATCH_RECOGNIZE leg vs
plain-CEP leg at volume (the r13 #3 / r14 #2 target: watermarked MR
within ~1.2x of plain CEP at 10M events).

Design: the two legs run interleaved M-C-M-C-M on one box in one process
(the bench --ab bracket discipline — box drift between brackets cancels
in the ratio of medians); every repetition asserts the leg's output is
IDENTICAL to its first run (row-count + full-column hash), so the number
is a measurement, not a behavior change. Corpus/legs are the standing
`tools/streaming_scale.py` definitions (mr_agg_measures /
cep_signup_purchase) on the same replicated-events parquet.

    python tools/mr_cep_ab.py                 # REP from FPS_STREAMING_REP (default 100 = 10M)
    FPS_STREAMING_REP=10 python tools/mr_cep_ab.py   # 1M-event smoke
    FPS_MR_CEP_REPS=3 python tools/mr_cep_ab.py      # bracket count per leg
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import tools.streaming_scale as S  # noqa: E402


def leg_hash(df) -> tuple[int, str]:
    """Deterministic content hash of a finished leg output: row count plus
    an order-independent digest of the per-row xxhash64 values. Combining
    (count, sum, bit_xor) makes offsetting row differences implausible —
    a pure sum could in principle be preserved by two rows changing in
    opposite directions (r15 ADVICE)."""
    n = df.count()
    row_h = F.xxhash64(*[F.col(c) for c in df.columns])
    agg = df.select(
        F.sum(row_h.cast("decimal(38,0)")).alias("s"),
        F.bit_xor(row_h).alias("x"),
    ).collect()[0]
    return n, f"{agg['s']}^{agg['x']}"


def main() -> None:
    from flink_parent_spark.session import get_spark  # noqa: PLC0415
    from flink_parent_spark.streaming.core import run_stream_to_df  # noqa: PLC0415
    from flink_parent_spark.streaming.cep import (  # noqa: PLC0415
        Pattern,
        cep_pattern_stream,
    )
    from flink_parent_spark.streaming.match_recognize_sql import (  # noqa: PLC0415
        match_recognize_sql,
    )

    spark = get_spark("mr_cep_ab")
    reps = int(os.environ.get("FPS_MR_CEP_REPS", "3"))
    path = S.build_events(spark)
    n_events = spark.read.parquet(path).count()

    def mr_leg():
        ev = S.open_stream(spark, path)
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

    def cep_leg():
        ev = S.open_stream(spark, path)
        pat = (
            Pattern.begin("signup")
            .where(lambda r: r["event_type"] == "signup")
            .followed_by("purchase")
            .where(lambda r: r["event_type"] == "purchase")
        )
        return run_stream_to_df(
            cep_pattern_stream(
                ev.select("user_id", "event_id", "event_type", "ts"),
                pat,
                ["user_id"],
                "ts",
                "event_id",
            ),
            "update",
            timeout_s=1800,
        )

    def cep_wm_leg():
        # decomposition leg: the SAME signup->purchase pattern through the
        # watermark-held operator — isolates the watermark machinery cost
        # (per-key timer re-fires, unsealed-tail state round-trip) from the
        # MR leg's pattern/measures cost
        ev = S.open_stream(spark, path)
        pat = (
            Pattern.begin("signup")
            .where(lambda r: r["event_type"] == "signup")
            .followed_by("purchase")
            .where(lambda r: r["event_type"] == "purchase")
        )
        from flink_parent_spark.streaming.cep import (  # noqa: PLC0415
            cep_pattern_stream_watermarked,
        )

        return run_stream_to_df(
            cep_pattern_stream_watermarked(
                ev.select("user_id", "event_id", "event_type", "ts"),
                pat,
                ["user_id"],
                "ts",
                "event_id",
            ),
            "update",
            timeout_s=1800,
        )

    legs = {
        "mr_watermarked": mr_leg,
        "cep_plain": cep_leg,
        "cep_watermarked": cep_wm_leg,
    }
    times: dict[str, list[float]] = {k: [] for k in legs}
    hashes: dict[str, tuple] = {}
    # interleave M-C-M-C-... so box drift lands on both legs equally
    for rep in range(reps):
        for name, fn in legs.items():
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            h = leg_hash(out)
            if name in hashes:
                # RuntimeError, not assert: the identity invariant is the
                # tool's contract ("the number is a measurement, not a
                # behavior change") and must survive python -O
                if h != hashes[name]:
                    raise RuntimeError(
                        f"{name} output changed between reps: "
                        f"{h} != {hashes[name]}"
                    )
            else:
                hashes[name] = h
            times[name].append(round(dt, 2))
            print(
                f"[mr-cep-ab] rep{rep} {name}: {dt:.1f}s "
                f"(rows={h[0]}, hash={h[1]})",
                file=sys.stderr,
                flush=True,
            )
    med = {k: statistics.median(v) for k, v in times.items()}
    ratio = round(med["mr_watermarked"] / med["cep_plain"], 3)
    print(
        json.dumps(
            {
                "metric": "mr_watermarked_over_cep_plain",
                "events": n_events,
                "reps": reps,
                "runs_sec": times,
                "median_sec": {k: round(v, 2) for k, v in med.items()},
                "ratio": ratio,
                "ratio_wm_machinery": round(
                    med["cep_watermarked"] / med["cep_plain"], 3
                ),
                "out_rows": {k: hashes[k][0] for k in hashes},
            }
        )
    )


if __name__ == "__main__":
    main()
