"""Queryable state: read a streaming query's keyed state from the outside.

Reference semantics:
- `KeyedStream.asQueryableState(name[, stateDescriptor])`
  (flink-streaming-java/.../datastream/KeyedStream.java:1020-1085) exposes a
  keyed stream's state under a registered name.
- `QueryableStateClient.getKvState(jobId, queryableStateName, key, ...)`
  (flink-queryable-state/flink-queryable-state-client-java/.../client/
  QueryableStateClient.java:231) fetches the current value for one key from
  the running job's state backend.

Spark-first design: Structured Streaming already externalizes every stateful
operator's keyed state in the checkpoint (the state store), and Spark 4's
State Data Source reads it as a DataFrame:

    spark.read.format("statestore").load(checkpoint)        # key/value rows
    spark.read.format("state-metadata").load(checkpoint)    # operators/ids

so "queryable state" needs no bespoke KvState server/proxy network stack
(the part of flink-queryable-state that Spark's architecture replaces
wholesale): registering a query under a name + reading its checkpoint IS
the client protocol. Point lookups push the key filter down onto the state
scan; snapshot isolation comes free from checkpoint versioning (each batch
commit is a consistent snapshot — the reference's client reads are only
eventually consistent with the live state, same contract here).

Scale note: the state source reads one state-store partition per task, so a
full-state scan parallelizes across the operator's shuffle partitions; a
single-key lookup prunes to the partitions holding that key's range after
the filter (no driver-side collect of the state).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class QueryableStateRegistry:
    """Session-level name -> checkpoint registry (the reference's
    KvStateLocationRegistry role, minus the RPC: locations are checkpoint
    paths, not TaskManager endpoints)."""

    spark: SparkSession
    _locations: dict[str, str] = field(default_factory=dict)

    def register(self, name: str, checkpoint_location: str) -> None:
        """`asQueryableState(name)` parity: expose the state written under
        `checkpoint_location` for lookup as `name`."""
        if name in self._locations and self._locations[name] != checkpoint_location:
            raise ValueError(f"queryable state name already registered: {name}")
        self._locations[name] = checkpoint_location

    def client(self) -> "QueryableStateClient":
        return QueryableStateClient(self.spark, self._locations)


@dataclass
class QueryableStateClient:
    """`QueryableStateClient.getKvState` parity over checkpointed state."""

    spark: SparkSession
    locations: dict[str, str]

    def state_metadata(self, name: str) -> DataFrame:
        """The stateful operators recorded in the named query's checkpoint
        (operatorId/operatorName/stateStoreName/partitions/batch range)."""
        return self.spark.read.format("state-metadata").load(self.locations[name])

    def state(
        self,
        name: str,
        operator_id: int | None = None,
        store_name: str | None = None,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Full keyed-state snapshot as (key struct, value struct) rows,
        flattened to top-level columns. `batch_id` selects a historical
        snapshot (checkpoint versioning); default is the latest commit."""
        reader = self.spark.read.format("statestore")
        if operator_id is not None:
            reader = reader.option("operatorId", operator_id)
        if store_name is not None:
            reader = reader.option("storeName", store_name)
        if batch_id is not None:
            reader = reader.option("batchId", batch_id)
        df = reader.load(self.locations[name])
        key_cols = [
            F.col(f"key.{f_.name}").alias(f_.name)
            for f_ in df.schema["key"].dataType.fields
        ]
        val_cols = [
            F.col(f"value.{f_.name}").alias(f_.name)
            for f_ in df.schema["value"].dataType.fields
        ]
        return df.select(*key_cols, *val_cols)

    def get_kv_state(self, name: str, key: dict, **kwargs) -> list:
        """Point lookup (`getKvState(jobId, name, key, ...)`): returns the
        matching state rows (usually 0 or 1). The equality predicates push
        down into the state scan — no full-state collect."""
        df = self.state(name, **kwargs)
        for col, v in key.items():
            df = df.where(F.col(col) == F.lit(v))
        return df.collect()


def read_keyed_state(
    spark: SparkSession,
    checkpoint_location: str,
    operator_id: int | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """State Processor API read-side parity
    (flink-libraries/flink-state-processing-api — Savepoint.load(...)
    .readKeyedState): load the keyed state of an offline checkpoint as a
    batch DataFrame for analysis/migration. One-call form of
    QueryableStateClient.state() without the registry. The write side —
    bootstrapping new savepoints — lives in
    `streaming/state_processor.py` (bootstrap-replay design: the real
    operator builds the state with output discarded, since only a
    running query can write Spark's state store format)."""
    reg = QueryableStateRegistry(spark)
    reg.register("__offline", checkpoint_location)
    return reg.client().state(
        "__offline", operator_id=operator_id, batch_id=batch_id
    )
