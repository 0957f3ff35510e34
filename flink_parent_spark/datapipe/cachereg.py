"""Scoped persist registry for operator-internal cached intermediates.

The dedup operators persist a shared subtree (shingle sets, fingerprints)
because several consumers of the returned DataFrame would otherwise re-run
the tokenize/shingle/hash pass. The returned DataFrame is lazy, so the
operator itself cannot unpersist-after-consumption — it never sees the
action. Left alone, a long-lived session running many queries accumulates
every call's cached intermediate in the block manager (guide §5: unpersist
when done).

`persist_scoped` bounds that growth to ONE live intermediate per operator:
each call releases the intermediate the *previous* call of the same
operator persisted (safe at any point — unpersisting a cached plan never
changes results, Spark recomputes from lineage), then persists and
registers the new one. `release_intermediates()` drops everything, for
callers that want a clean block manager between pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def persist_scoped(df: DataFrame, key: str) -> DataFrame:
    """Persist `df` under an operator-scoped key, releasing the previous
    generation persisted under the same key (non-blocking)."""
    prev = _LIVE.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            # the previous generation's session may already be stopped —
            # nothing to release then
            pass
    out = df.persist()
    _LIVE[key] = out
    return out


def release_intermediates() -> None:
    """Unpersist every registered intermediate (end-of-pipeline cleanup)."""
    for key in list(_LIVE):
        prev = _LIVE.pop(key)
        try:
            prev.unpersist()
        except Exception:
            pass
