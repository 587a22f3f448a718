"""A/B probe: dedup_lsh_clusters wall at N pinned cores, HEAD checkpoint
attribution vs r6-style bare localCheckpoint (no tracking, no per-round
frees). Diagnosed the round-7 sweep's chain wall spread (104 s vs 74 s
at 16c) as host weather, not code. Caveat: the r6 arm reverts only the
tracked_checkpoint/free_block_ids sites — session_cached's own entry
checkpoint still pays the round-7 delta-window attribution (two
getPersistentRDDs scans per entry, ~ms against 90 s walls), so the arm
is r6-STYLE, not bit-exact r6. Usage:
python tools/exp_dedup_ab.py [cores] [sf_dir]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sfsweep2"

os.sched_setaffinity(0, range(CORES))

from facturas_spark.session import get_spark  # noqa: E402
from facturas_spark.analytics import cache as _cache  # noqa: E402
from facturas_spark.analytics import dedup as _d  # noqa: E402

spark = get_spark(f"exp-dedup-ab-{CORES}", cores=CORES, shuffle_partitions=32)

_orig = (_cache.tracked_checkpoint, _cache.tracked_checkpoint_ids,
         _cache.free_block_ids)


def _patch_r6():
    _cache.tracked_checkpoint = lambda df: df.localCheckpoint(eager=True)
    _cache.tracked_checkpoint_ids = (
        lambda df: (df.localCheckpoint(eager=True), [])
    )
    _cache.free_block_ids = lambda *a, **k: 0


def _unpatch():
    (_cache.tracked_checkpoint, _cache.tracked_checkpoint_ids,
     _cache.free_block_ids) = _orig


def run_once() -> float:
    _cache.teardown_all_rdd_blocks(spark)
    t0 = time.perf_counter()
    _d.dedup_lsh_clusters(spark, SF_DIR, family="xxhash64").count()
    return time.perf_counter() - t0


# JIT/IO warm (not timed against either variant)
run_once()

best = {"head": None, "r6": None}
for _ in range(2):
    for variant in ("head", "r6"):
        _patch_r6() if variant == "r6" else _unpatch()
        dt = run_once()
        print(f"{variant}: {dt:.1f} s", flush=True)
        if best[variant] is None or dt < best[variant]:
            best[variant] = dt
_unpatch()
print({k: round(v, 1) for k, v in best.items()})
