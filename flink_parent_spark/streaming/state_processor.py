"""State Processor API — WRITE side: create a savepoint that a new
streaming query starts from.

Reference (flink-libraries/flink-state-processing-api):
`Savepoint.create(stateBackend, maxParallelism)` (Savepoint.java:81)
`.withOperator(uid, OperatorTransformation.bootstrapWith(dataSet)
.keyBy(...).transform(KeyedStateBootstrapFunction))`
(WritableSavepoint.java, BootstrapTransformation.java) `.write(path)` —
a BATCH dataset runs through a state-writing function that produces
ONLY state, never output; the streaming job then launches
`--fromSavepoint path` and behaves as if it had already processed that
state's history.

Spark-first mapping: Spark's state store format is internal and only a
running query writes it, so direct file synthesis is off the table —
instead the bootstrap PHASE runs the REAL operator over the seed rows
with its output DISCARDED, capturing the resulting checkpoint as the
savepoint (exactly a KeyedStateBootstrapFunction's observable effect:
state materializes, nothing emits), and the live query RESUMES from
that checkpoint over the live input via Spark's own
restart-from-checkpoint recovery (= `--fromSavepoint`). The observable
contract is identical: seed rows become keyed state exactly once and
never appear in the output; the state is inspectable offline through
the read side (`queryable_state.read_keyed_state`) before any live row
flows.

Because the savepoint is built BY the operator, any state reachable
from an input history can be bootstrapped — dedup seen-sets, agg
accumulators, Top-N buffers, join buffers. State not derivable from
inputs does not exist in this engine's operators (they are all
input-driven), so the coverage matches the reference's practical use
(warm-starting a new job with historical state)."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


class NewSavepoint:
    """`Savepoint.create(...)` parity: stage per-operator bootstrap
    datasets, then `write()` the savepoint directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark, self.path = spark, path
        self._operators: dict[str, str] = {}

    def with_operator(self, uid: str, bootstrap_df: DataFrame) -> "NewSavepoint":
        """`withOperator(uid, bootstrapWith(dataset)...)`: the batch
        dataset whose replay builds this operator's keyed state."""
        d = os.path.join(self.path, uid)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(os.path.join(d, "src"))
        staging = os.path.join(d, "_stage")
        bootstrap_df.coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(
            os.path.join(staging, part),
            os.path.join(d, "src", "bootstrap-000.parquet"),
        )
        shutil.rmtree(staging)
        self._operators[uid] = ", ".join(
            f"`{c}` {t}" for c, t in bootstrap_df.dtypes
        )
        return self

    def write(self) -> str:
        """`WritableSavepoint.write(path)`: seal the savepoint metadata."""
        with open(os.path.join(self.path, "_metadata.json"), "w") as f:
            json.dump({"operators": self._operators}, f)
        return self.path


def create_savepoint(spark: SparkSession, path: str) -> NewSavepoint:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return NewSavepoint(spark, path)


class ExistingSavepoint:
    """Load a written savepoint; bootstrap operators and run live queries
    from it (`Savepoint.load` + the job's `--fromSavepoint`)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark, self.path = spark, path
        with open(os.path.join(path, "_metadata.json")) as f:
            self._meta = json.load(f)

    def _src(self, uid: str) -> str:
        return os.path.join(self.path, uid, "src")

    def checkpoint(self, uid: str) -> str:
        return os.path.join(self.path, uid, "_checkpoint")

    def bootstrap(
        self, uid: str, build, timeout_s: int = 300,
        output_mode: str = "update",
    ) -> str:
        """Run `build(stream)` over the operator's bootstrap rows with the
        output DISCARDED (KeyedStateBootstrapFunction: state only, no
        emissions), capturing the checkpoint. Idempotent: re-invoking
        resumes an already-committed checkpoint and is a no-op. Returns
        the checkpoint path — readable offline via read_keyed_state."""
        schema = self._meta["operators"][uid]
        sdf = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self._src(uid))
        )
        q = (
            build(sdf)
            .writeStream.outputMode(output_mode)
            # discard the OUTPUT but still process every partition (state
            # stores only commit for processed partitions): count() drives
            # the full batch, the result is dropped
            .foreachBatch(lambda b, _i: (b.count(), None)[1])
            .option("checkpointLocation", self.checkpoint(uid))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        return self.checkpoint(uid)

    def run_operator(
        self,
        uid: str,
        build,
        live_dir: str,
        output_mode: str = "update",
        timeout_s: int = 300,
    ) -> pd.DataFrame:
        """Start the live query FROM the savepoint: live input files are
        appended after the (already-consumed) bootstrap prefix and the
        query resumes from the bootstrap checkpoint — emitting output for
        live rows only, with state as if the bootstrap history had been
        processed exactly once. Returns all emitted rows."""
        self.bootstrap(uid, build, timeout_s, output_mode)
        src = self._src(uid)
        base_t = os.path.getmtime(
            os.path.join(src, "bootstrap-000.parquet")
        )
        files = sorted(
            f for f in os.listdir(live_dir) if f.endswith(".parquet")
        )
        # destination names key on the SOURCE filename only (no positional
        # index): a later-added file that sorts earlier must not shift the
        # names of already-consumed copies, or their rows replay twice
        next_t = max(
            [base_t + 10]
            + [
                os.path.getmtime(os.path.join(src, f))
                for f in os.listdir(src)
                if f.startswith("live-")
            ]
        )
        for f in files:
            dst = os.path.join(src, f"live-{f}")
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(live_dir, f), dst)
                # explicit increasing mtimes: NEW live files replay in
                # sorted order, strictly after everything already copied
                next_t += 1
                os.utime(dst, (next_t, next_t))
        schema = self._meta["operators"][uid]
        sdf = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        captured: list[pd.DataFrame] = []
        q = (
            build(sdf)
            .writeStream.outputMode(output_mode)
            .foreachBatch(lambda b, _i: captured.append(b.toPandas()))
            .option("checkpointLocation", self.checkpoint(uid))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        return (
            pd.concat(captured, ignore_index=True)
            if captured
            else pd.DataFrame()
        )


def load_savepoint(spark: SparkSession, path: str) -> ExistingSavepoint:
    return ExistingSavepoint(spark, path)
