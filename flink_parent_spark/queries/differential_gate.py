"""Rotating differential-fuzz sample promoted into the driver's gate.

The driver's correctness gate verifies the FIRST 50 registered queries
(rows + schema + value-hash vs DuckDB at sf0.01). The full 165-text
differential battery runs in pytest at sf0.001; this module additionally
promotes an 11-text sample — at least one text from every family — into
the gate prefix so the driver's independent harness exercises the fuzz
families each round (r7 verdict #8 / r8 "Next round" #5).

Rotation: `ROTATION` is bumped once per round; the sample is drawn
deterministically from that value, so each round the driver checks a
different slice of the battery while the texts themselves stay
byte-stable (seeds pinned in diff_grammar.FAMILIES). The 10 gate entries
displace 10 prior PRIORITY entries from the 50-slot prefix; the
displaced queries remain oracle-checked in pytest (test_oracle_parity
covers every registered query).

Registered via `sql_query(name, text)`: the SAME text runs on Spark and
DuckDB — no hand-translated oracle, so the surface under test is the SQL
semantics itself.
"""

from __future__ import annotations

import random

from flink_parent_spark.queries.diff_grammar import FAMILIES, family_texts
from flink_parent_spark.queries.registry import sql_query

# Bump once per round (round number keeps the rotation auditable).
ROTATION = 14

N_GATE = 11


def gate_sample(rotation: int = ROTATION) -> list[tuple[str, int]]:
    """Deterministic (family, index) sample: one text per family first
    (currently 11 families), then any remaining N_GATE slots drawn from
    the pooled remainder — a no-op while len(FAMILIES) == N_GATE (the
    guard below handles the > case; the remainder draw reactivates only
    if N_GATE is ever raised above the family count)."""
    if len(FAMILIES) > N_GATE:
        raise RuntimeError(
            f"{len(FAMILIES)} families exceed the {N_GATE}-slot gate sample; "
            "raise N_GATE (and rebalance catalog._ROTATED_OUT) first"
        )
    rng = random.Random(0xD1FF ^ rotation)
    picks: list[tuple[str, int]] = []
    for fam, (_seed, n, _gen) in FAMILIES.items():
        picks.append((fam, rng.randrange(n)))
    pool = [
        (fam, i)
        for fam, (_s, n, _g) in FAMILIES.items()
        for i in range(n)
        if (fam, i) not in picks
    ]
    picks += rng.sample(pool, N_GATE - len(picks))
    return picks


GATE_NAMES: list[str] = []
for _fam, _i in gate_sample():
    _name = f"diff_{_fam}_{_i}"
    sql_query(_name, family_texts(_fam)[_i])
    GATE_NAMES.append(_name)
