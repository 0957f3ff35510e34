"""Golden-plan snapshot battery (the Spark analog of the reference's 163
pinned optimized-plan XMLs in flink-table-planner-blink's
src/test/resources/.../plan/): every plan-sensitive catalog query's
normalized `explain(formatted)` physical plan must match the checked-in
snapshot. Catches silent plan regressions — a broadcast flipping to
sort-merge, a lost PushedFilters, a new shuffle — that value tests can't
see. Regenerate after an INTENDED plan change with:

    python tools/plan_snapshots.py [name...]
"""

from __future__ import annotations

import difflib
import os

import pytest

from tools.plan_snapshots import SF_DIR, SNAP_DIR, SNAPSHOT_QUERIES, plan_for


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_plan_matches_snapshot(name, spark):
    path = os.path.join(SNAP_DIR, f"{name}.txt")
    assert os.path.exists(path), (
        f"no snapshot for {name}; run: python tools/plan_snapshots.py {name}"
    )
    with open(path) as f:
        want = f.read()
    got = plan_for(spark, name, SF_DIR)
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(),
                fromfile=f"snapshot/{name}", tofile=f"current/{name}",
                lineterm="", n=2,
            )
        )
        pytest.fail(
            f"physical plan changed for {name} — if intended, regenerate "
            f"with `python tools/plan_snapshots.py {name}`:\n{diff[:8000]}"
        )


def test_snapshot_dir_has_no_orphans():
    """Every checked-in snapshot corresponds to a query still in the
    battery (a renamed query must not leave a stale golden file)."""
    files = {f[:-4] for f in os.listdir(SNAP_DIR) if f.endswith(".txt")}
    assert files == set(SNAPSHOT_QUERIES)
