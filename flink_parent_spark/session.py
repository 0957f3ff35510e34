"""SparkSession construction with scale-aware defaults.

The reference engine's equivalent is TableEnvironment creation
(flink-table-api-java/.../internal/TableEnvironmentImpl.java); here a session is
just a configured SparkSession — Catalyst/Tungsten replace the blink planner and
runtime wholesale.

Settings rationale (targets a 1000-executor cluster even though tests run
local[32]):
- AQE on: runtime re-planning (skew-join splitting, partition coalescing,
  broadcast demotion) is the single biggest scale lever Spark has.
- shuffle.partitions sized to cores locally; on a real cluster this would be
  2-3x total cores — AQE coalescing makes over-provisioning cheap.
- UTC session timezone: deterministic timestamp semantics, and matches the
  DuckDB oracle used by the correctness harness.
- Arrow on: every pandas-UDF-backed operator (CEP, temporal join, multimodal)
  moves batches over Arrow instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Python workers inherit this: silences a pandas-internals FutureWarning
# raised inside pyspark's Arrow serializer on every stateful batch (noise,
# not ours to fix).
os.environ.setdefault("PYTHONWARNINGS", "ignore::FutureWarning")

# Runtime-settable confs that every entry point applies even when handed a
# foreign SparkSession (the correctness driver builds its own session).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep splits big enough that task scheduling overhead
    # doesn't dominate at 100 TB (128m default is right; pin explicitly).
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def apply_runtime_confs(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable confs; safe on sessions we didn't build."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path sets it instead
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "flink_parent_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session used by tests and bench."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import tempfile  # noqa: PLC0415

    tmp = tempfile.gettempdir()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # keep regenerable JVM litter out of the repo root: embedded
        # Derby writes derby.log to the process CWD and managed tables
        # default their warehouse to ./spark-warehouse — point both at
        # the (bench-swept) fps_* namespace under the system tmp dir.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.stream.error.file={tmp}/fps_derby.log",
        )
        .config("spark.sql.warehouse.dir", f"{tmp}/fps_warehouse")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        # belt-and-braces with the extraJavaOptions above: Derby reads
        # derby.stream.error.file at its first boot (first JDBC/metastore
        # connection), which is always after session creation — setting
        # the live JVM's system property here covers the reused-JVM case
        # where extraJavaOptions never applied.
        spark._jvm.System.setProperty(  # noqa: SLF001
            "derby.stream.error.file", f"{tmp}/fps_derby.log"
        )
    except Exception:
        pass  # connect-mode session without a _jvm bridge
    return apply_runtime_confs(spark, cpus)
