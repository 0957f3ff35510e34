"""Capture AQE FINAL plans for the scaled TPC-DS heavies (r16 VERDICT
item 4): the r15 "AQE demotes q14's 36 static SortMergeJoins to broadcast"
claim rested on the static plan + reasoning. This runs each query to
completion through the noop sink and dumps the POST-execution formatted
plan (`AdaptiveSparkPlan isFinalPlan=true` — the re-optimised plan with
AQEShuffleRead nodes and runtime join demotions) to plans/r16/.

Usage: python tools/aqe_plan_capture.py [q14 q64 ...]   (default q14 q64)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from flink_parent_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:] or ["q14", "q64"]
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("aqe-plan-capture")
    from flink_parent_spark.queries.tpcds_real import run_tpcds_at_scale

    for name in names:
        df = run_tpcds_at_scale(spark, f"tpcds_{name}", 1.0)
        spark.sparkContext.setJobDescription(f"aqe-capture tpcds_{name}_sf1")
        df.write.format("noop").mode("overwrite").save()
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        path = os.path.join(out_dir, f"tpcds_{name}_sf1_aqe_final.txt")
        open(path, "w").write(plan)
        smj = plan.count("SortMergeJoin")
        bhj = plan.count("BroadcastHashJoin")
        print(
            f"[aqe] tpcds_{name}_sf1: isFinalPlan="
            f"{'isFinalPlan=true' in plan} SMJ={smj} BHJ={bhj} "
            f"AQEShuffleRead={plan.count('AQEShuffleRead')} -> {path}"
        )


if __name__ == "__main__":
    main()
