"""Async lookup join (AsyncDataStream / AsyncTableFunction parity).

Reference: flink-streaming-java/.../datastream/AsyncDataStream.java and
AsyncLookupJoinRunner.java — enrich a stream against an external service
with batched in-flight requests.

Spark-first mapping: mapInPandas gives the operator an Arrow batch at a
time; the client issues ONE bulk request per batch (or an asyncio gather) —
the same amortization Flink's orderedWait achieves with its in-flight
queue. Ordering is per-partition (Flink's orderedWait analog); capacity is
the Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch).

The external client is pluggable; `dict_client` adapts a plain mapping for
tests (a real deployment passes an HTTP/redis bulk-get)."""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

BulkClient = Callable[[list], dict]


def dict_client(mapping: dict) -> BulkClient:
    """Adapt an in-memory mapping to the bulk-lookup client interface."""

    def bulk_get(keys: list) -> dict:
        return {k: mapping.get(k) for k in keys}

    return bulk_get


def async_lookup_join(
    df: DataFrame,
    key_col: str,
    client: BulkClient,
    output_cols: Sequence[tuple[str, str]],
) -> DataFrame:
    """Enrich each row with client lookups, batched per Arrow batch.
    output_cols: [(name, spark_type), ...] — the fields of the lookup value
    dict to append (None value -> NULLs, left-outer semantics)."""
    names = [n for n, _ in output_cols]
    base = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)
    out_schema = base + ", " + ", ".join(f"`{n}` {t}" for n, t in output_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf[key_col].tolist()
            found = client(list(dict.fromkeys(keys)))  # dedup per batch
            for n in names:
                pdf = pdf.assign(
                    **{n: [((found.get(k) or {}).get(n)) for k in keys]}
                )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
