"""Structured Streaming core: file-replay sources, watermarking, and a
synchronous run-to-completion harness.

Reference mapping:
- SourceFunction / FLIP-27 Source -> spark.readStream (file source here;
  kafka/rate/socket are the same surface with format swapped).
- WatermarkStrategy.forBoundedOutOfOrderness (WatermarkStrategy.java:169)
  -> df.withWatermark(ts, delay). Per-partition idleness maps to the
  multipleWatermarkPolicy conf (with_idleness_policy); punctuated / custom
  generators have no Spark hook — `punctuated_replay` below is the
  deterministic-replay emulation (SURVEY §1.5).
- The test harness replays a bounded parquet table through a real streaming
  query (Trigger.AvailableNow) into a memory sink — the reference does the
  same with its ITCase mini-cluster collect sinks.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from flink_parent_spark.session import apply_runtime_confs
from flink_parent_spark.tables import normalize_timestamps, table_path


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    watermark: tuple[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a fixture table as a file-source stream (schema from the batch
    footer, nanos columns converted exactly like the batch path)."""
    apply_runtime_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    schema = spark.read.parquet(path).schema
    # The file stream source requires a directory; expose the single fixture
    # file through a per-(dir, table) symlink directory.
    link_dir = os.path.join(
        tempfile.gettempdir(),
        "fps_stream_src",
        hashlib.md5(path.encode()).hexdigest()[:12],
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = normalize_timestamps(reader.load(link_dir), name)
    if watermark is not None:
        df = df.withWatermark(*watermark)
    return df


def with_idleness_policy(spark: SparkSession, enabled: bool = True) -> SparkSession:
    """Flink `WatermarkStrategy.withIdleness` equivalent for multi-source
    queries (WatermarkStrategy.java:133): when one branch of a union goes
    idle, its stale watermark must not hold back the query.

    Spark has no per-source idleness marker, but the same outcome is the
    `multipleWatermarkPolicy` session conf: with several `withWatermark`
    operators in one query, `min` (default, Flink's no-idleness behavior)
    tracks the slowest branch, `max` advances with the fastest — an idle
    branch stops contributing, exactly the idleness contract. Trade-off is
    identical to Flink's: rows from the idle branch that arrive later than
    the advanced watermark are treated as late."""
    spark.conf.set(
        "spark.sql.streaming.multipleWatermarkPolicy", "max" if enabled else "min"
    )
    return spark


def run_stream_to_df(
    sdf: DataFrame, output_mode: str = "append", timeout_s: int = 300
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink and return the materialized result as a batch DataFrame."""
    name = f"__stream_out_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"fps_ckpt_{name}")
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return sdf.sparkSession.table(name)


def streaming_partitioned_sink(
    sdf: DataFrame,
    path: str,
    partition_col: str,
    ts_col: str,
    commit_delay: str = "0 seconds",
    policy: str = "success-file",
    checkpoint: str | None = None,
):
    """Streaming filesystem sink with PARTITION COMMIT (the Flink 1.11
    filesystem-connector headline: FileSystemTableSink.java +
    PartitionCommitPolicy.java:46 — policy 'success-file'
    (SuccessFileCommitPolicy.java) drops a `_SUCCESS` marker into a
    partition once the watermark passes partition-time + commit delay,
    signalling downstream batch readers that the partition is complete).

    Spark mapping: `foreachBatch` writes each micro-batch partitioned by
    `partition_col` (append — Spark's file sink is already exactly-once
    via the WAL; the 2PC role of the reference's committer), then commits
    every partition whose partition END time is <= the batch's max
    observed event time minus the commit delay (the max sealed event time
    stands in for the watermark clock, as in the engine's other
    AvailableNow-replay operators). Partition values must be
    the event-time bucket (the reference's default partition.time-extractor
    reads the partition value as the time), e.g. a date or hour string.

    Returns the StreamingQuery; the caller awaits termination."""
    import datetime as _dt
    import uuid as _uuid

    from pyspark.sql import functions as _F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    delay = _parse_delay(commit_delay)
    ckpt = checkpoint or os.path.join(
        tempfile.gettempdir(), f"fps_ckpt_psink_{_uuid.uuid4().hex[:8]}"
    )

    def commit_partitions(batch_df, batch_id: int) -> None:
        rows = batch_df.persist()
        try:
            if rows.isEmpty():
                return
            rows.write.mode("append").partitionBy(partition_col).parquet(path)
            max_ts = rows.agg(_F.max(ts_col)).collect()[0][0]
            if max_ts is None:
                return
            cutoff = max_ts - delay
            for part in rows.select(partition_col).distinct().collect():
                val = part[partition_col]
                # default PartitionTimeExtractor: the partition VALUE is its
                # time (yyyy-MM-dd[ HH] formats)
                sval = str(val)
                try:
                    pt = _dt.datetime.fromisoformat(sval)
                except ValueError:
                    continue
                # Granularity follows the parsed value, mirroring the
                # reference's PartitionTimeExtractor defaults: a bare date
                # spans a day, a value carrying an hour component spans an
                # hour (otherwise hourly partitions would commit ~23h late).
                has_hour = len(sval) > 10
                pt_end = pt + (
                    _dt.timedelta(hours=1) if has_hour else _dt.timedelta(days=1)
                )
                if pt_end <= cutoff and policy == "success-file":
                    # Spark escapes special chars in partition dir names
                    # (':' -> '%3A'); resolve the on-disk directory by
                    # unquoting candidates rather than guessing the quoting.
                    from urllib.parse import unquote  # noqa: PLC0415

                    pdir = f"{partition_col}={val}"
                    for d in os.listdir(path):
                        if unquote(d) == pdir:
                            pdir = d
                            break
                    marker = os.path.join(path, pdir, "_SUCCESS")
                    with open(marker, "w"):
                        pass
        finally:
            rows.unpersist()

    return (
        sdf.writeStream.foreachBatch(commit_partitions)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _parse_delay(spec: str):
    import datetime as _dt

    n, unit = spec.split()
    n = float(n)
    unit = unit.rstrip("s")
    return _dt.timedelta(
        **{
            {"second": "seconds", "minute": "minutes", "hour": "hours", "day": "days"}[
                unit
            ]: n
        }
    )


def punctuated_replay(
    sdf: DataFrame,
    ts_col: str,
    on_event,
    process,
    delay_seconds: float = 0.0,
    timeout_s: int = 300,
):
    """Punctuated / custom watermark emulation on the replay source
    (WatermarkStrategy.java:55 custom generators, WatermarkGenerator
    onEvent/onPeriodicEmit). Spark exposes no user watermark hook, so this
    is the deterministic-replay emulation (SURVEY §1.5): a per-batch
    computation that threads the watermark clock across micro-batches.

    For every row, in batch arrival order:
    - rows at/behind the current watermark are LATE (Flink's drop path) and
      are routed to `process` separately;
    - `on_event(row, current_wm_ts) -> ts | None` is the punctuated
      generator — returning a timestamp advances the watermark immediately
      (e.g. an event carrying an end-of-interval marker); None defers to
      the periodic bounded-out-of-orderness bound `ts - delay_seconds`.
    The watermark is monotone (max of both signals, never regressing).

    `process(on_time_rows, late_rows, wm_ts, batch_id)` receives each
    batch's outcome. Driver-side by design: this is the semantics
    HARNESS — the shipped distributed path is `punctuated_replay_keyed`
    below (same generator hosted per key inside applyInPandasWithState,
    no driver collect), and the equivalence of the two is asserted in
    tests/test_streaming_semantics.py. Returns the per-batch watermark
    trace [(batch_id, wm_ts), ...]."""
    import datetime as _dt  # noqa: PLC0415

    state: dict = {"wm": None}
    trace: list = []

    def handle(bdf, bid: int) -> None:
        wm = state["wm"]
        on_time, late = [], []
        for r in bdf.collect():
            row = r.asDict()
            ts = row[ts_col]
            if wm is not None and ts <= wm:
                late.append(row)
                continue
            on_time.append(row)
            candidates = [ts - _dt.timedelta(seconds=delay_seconds)]
            punct = on_event(row, wm)
            if punct is not None:
                candidates.append(punct)
            if wm is not None:
                candidates.append(wm)
            wm = max(candidates)
        state["wm"] = wm
        trace.append((bid, wm))
        process(on_time, late, wm, bid)

    ckpt = os.path.join(
        tempfile.gettempdir(), f"fps_ckpt_punct_{uuid.uuid4().hex[:8]}"
    )
    q = (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return trace


def punctuated_replay_keyed(
    sdf: DataFrame,
    key_cols,
    ts_col: str,
    on_event,
    delay_seconds: float = 0.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """DISTRIBUTED punctuated / custom watermarks: the generator runs per
    key inside applyInPandasWithState — the shipped counterpart of
    `punctuated_replay`'s driver-side semantics harness (the reference's
    WatermarkGenerator instances run per subtask,
    WatermarkStrategy.java:55; per-key is the keyed-stream analog). No
    driver collect: each key group threads its own watermark clock
    (integer micros in state) across micro-batches.

    Per row, in batch arrival order (tiebreak_col sorts within a batch
    for deterministic replays): rows at/behind the key's watermark are
    flagged `__late` (Flink's drop path — downstream filters or routes
    them); otherwise `on_event(row_dict, wm) -> ts | None` may advance
    the watermark immediately (punctuation), else the periodic bound
    `ts - delay_seconds` applies; the watermark never regresses. Output:
    the input rows plus `__late boolean` and `__wm timestamp` (the
    watermark after the row). `on_event` must be picklable — it ships to
    executors."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    key_cols = list(key_cols)
    dt = dict(sdf.dtypes)
    cols = list(sdf.columns)
    out_schema = (
        ", ".join(f"`{c}` {dt[c]}" for c in cols)
        + ", `__late` boolean, `__wm` timestamp"
    )
    state_schema = "wm_micros bigint"

    def fn(key, pdfs, state: GroupState):
        import datetime as _dt  # noqa: PLC0415

        epoch = _dt.datetime(1970, 1, 1)
        wm = None
        if state.exists and state.get[0] is not None:
            wm = epoch + _dt.timedelta(microseconds=state.get[0])
        recs = []
        for pdf in pdfs:
            rows = pdf[cols].to_dict("records")
            if tiebreak_col is not None:
                rows.sort(key=lambda r: r[tiebreak_col])
            for row in rows:
                ts = row[ts_col]
                ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                late = wm is not None and ts <= wm
                if not late:
                    candidates = [ts - _dt.timedelta(seconds=delay_seconds)]
                    punct = on_event(row, wm)
                    if punct is not None:
                        candidates.append(punct)
                    if wm is not None:
                        candidates.append(wm)
                    wm = max(candidates)
                recs.append({**row, "__late": late, "__wm": wm})
        if wm is not None:
            state.update((int((wm - epoch) / _dt.timedelta(microseconds=1)),))
        yield pd.DataFrame(recs, columns=[*cols, "__late", "__wm"])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def use_rocksdb_state_backend(spark: SparkSession, enabled: bool = True) -> SparkSession:
    """Flink RocksDB state backend parity
    (flink-state-backends/flink-statebackend-rocksdb — large keyed state
    spills to local disk instead of heap): Spark ships the same trade-off
    as the RocksDB state store provider (Spark 3.2+). All of the engine's
    applyInPandasWithState operators (Top-N, dedup, CEP, OVER, temporal
    join) run unchanged on either backend — state layout is the store's
    concern, exactly as in the reference.

    `enabled=False` restores the default HDFS-backed (heap) provider —
    the heap-spillable backend analog."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
        if enabled
        else "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    return spark
