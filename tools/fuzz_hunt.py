"""Exploratory fuzz hunt: FRESH random draws through the battery generators.

The registered batteries (`queries/diff_grammar.py`, `queries/stream_fuzz.py`)
pin their seeds so texts/configs are byte-stable across rounds — good for a
reproducible gate, but it means the same configs are re-verified forever. This
tool draws NEW configs from an arbitrary seed and oracle-checks each one at
sf0.001, so the engine is continually stressed beyond the pinned set. A
failure prints the (shape, seed, index) triple — rerunning with that seed
reproduces the exact config for debugging, and the config should then be
promoted into the pinned battery as a regression text.

    python tools/fuzz_hunt.py                     # seed 1, 3 draws per shape
    FPS_HUNT_SEED=7 FPS_HUNT_PER=5 python ...     # bigger hunt
    python tools/fuzz_hunt.py --sf /root/testdata/sf0.1   # scale-stress:
        # same draws at a volume where spill, AQE plan switches, and
        # accumulator-overflow surfaces live (r12 scale-stress leg)

Exit code 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUNT_SEED = int(os.environ.get("FPS_HUNT_SEED", "1"))
PER_SHAPE = int(os.environ.get("FPS_HUNT_PER", "3"))
SF_DIR = os.environ.get("FPS_HUNT_SF_DIR", "/root/testdata/sf0.001")
if "--sf" in sys.argv:
    SF_DIR = sys.argv[sys.argv.index("--sf") + 1]


def main() -> int:
    import flink_parent_spark.queries.stream_fuzz as sf
    from flink_parent_spark.queries.diff_grammar import FAMILIES
    from flink_parent_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from check_parity import compare, duck_connect  # noqa: PLC0415

    spark = get_spark("fuzz_hunt")
    con = duck_connect(SF_DIR)

    hunted: "dict[str, tuple]" = {}  # name -> (runner, oracle_sql)

    # --- streaming shapes: intercept the generators' register() calls ----
    captured: list = []
    orig_register = sf.register
    sf.register = lambda name, fn, oracle=None: captured.append((name, fn, oracle))
    try:
        for shape, (base_seed, _n, reg) in sf.SHAPES.items():
            # fresh seed stream, disjoint from the pinned battery's.
            # at least the shape's own pinned count: shapes with
            # STRUCTURAL index variants (over frames, mr kinds) need every
            # index to cover every variant
            rng = random.Random((base_seed << 16) ^ 0x48C4 ^ HUNT_SEED)
            for i in range(max(PER_SHAPE, _n)):
                captured.clear()
                reg(i, rng)
                for name, fn, oracle in captured:
                    hunted[f"hunt_{HUNT_SEED}_{shape}_{i}"] = (fn, oracle)
    finally:
        sf.register = orig_register

    # --- batch families: texts run verbatim on both engines -------------
    for fam, (base_seed, _n, gen) in FAMILIES.items():
        rng = random.Random((base_seed << 16) ^ 0x48C4 ^ HUNT_SEED)
        for i in range(PER_SHAPE):
            sql = gen(rng)
            hunted[f"hunt_{HUNT_SEED}_diff_{fam}_{i}"] = (
                (lambda s, d, q=sql: s.sql(q)),
                sql,
            )

    # register the fixture tables as Spark temp views for the diff texts
    from flink_parent_spark.tables import load_tables  # noqa: PLC0415

    for tname, df in load_tables(spark, SF_DIR).items():
        df.createOrReplaceTempView(tname)

    n_pass = n_fail = 0
    failures: list[str] = []
    for name, (fn, oracle) in hunted.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            rel = con.sql(oracle)
            issues = compare(name, sdf, rel)
        except Exception as e:  # noqa: BLE001
            issues = [f"exception: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if issues:
            n_fail += 1
            failures.append(name)
            print(f"  [FAIL] {name} ({dt:.1f}s): {issues[:3]}", file=sys.stderr)
        else:
            n_pass += 1
            print(f"  [ok]   {name} ({dt:.1f}s)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "fuzz_hunt",
                "seed": HUNT_SEED,
                "per_shape": PER_SHAPE,
                "sf_dir": SF_DIR,
                "pass": n_pass,
                "fail": n_fail,
                "failures": failures,
            }
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
