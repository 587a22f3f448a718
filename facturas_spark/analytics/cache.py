"""Session-scoped DataFrame cache for bases shared across queries.

Several registry queries rebuild the same intermediate lineage
(`_platos_base` feeds two esc_* queries; the ngram component labels feed
dedup_clusters AND dedup_canonical_corpus). Computing those twice per
session is pure waste, so the first caller materializes the base with
``localCheckpoint(eager=True)`` — materialized AND plan-truncated (a
``persist`` would keep the whole nested plan alive for re-analysis) —
and later callers reuse it. Keyed by (applicationId, sf_dir, kind) so a
new session or a different scale factor never sees stale data.

At cluster scale the same role is played by a persisted staging table
(the checkpoint is executor-local here because local mode has exactly
one "executor"); the call sites note where that swap happens.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}

# Serializes every before/after block-id delta window (here and
# stream.py's per-batch _ck): two concurrent delta windows would
# attribute each other's checkpoint RDDs, and releasing a checkpointed
# frame another thread still holds is unrecoverable (no lineage).
# Plain .persist() frames that slip into someone's window are merely
# recomputable, so the lock only needs to cover localCheckpoint sites.
_ATTRIBUTION_LOCK = threading.Lock()
# RDD ids materialized by each entry's eager localCheckpoint, captured at
# creation so release_session_cache can free EXACTLY the blocks this
# module owns (round-7 advice: the old blanket getPersistentRDDs sweep
# would also kill concurrently held checkpointed frames — which have no
# lineage to recompute from, so any surviving reference became unusable)
_CACHE_RDD_IDS: dict[tuple, list[int]] = {}


def _persistent_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def checkpoint_with_ids(
    spark: SparkSession, df: DataFrame
) -> tuple[DataFrame, list[int]]:
    """Eagerly localCheckpoint ``df`` and return (frame, block RDD ids
    the checkpoint materialized), with the delta window held under
    _ATTRIBUTION_LOCK so concurrent checkpoint sites (session_cached
    builds, stream.py's per-batch frames) can never claim each other's
    unrecomputable blocks."""
    with _ATTRIBUTION_LOCK:
        before = _persistent_ids(spark)
        out = df.localCheckpoint(eager=True)
        ids = sorted(_persistent_ids(spark) - before)
    return out, ids


def session_cached(
    spark: SparkSession, sf_dir: str, kind: str, make
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _CACHE:
        # the delta is the checkpoint's block RDD (plus, rarely, inner
        # persists that first registered during the eager job — those are
        # per-build scratch this module may also safely free). make() runs
        # OUTSIDE the lock (it only declares the plan; the eager job is
        # the checkpoint).
        df = make()
        _CACHE[key], _CACHE_RDD_IDS[key] = checkpoint_with_ids(spark, df)
    return _CACHE[key]


def release_session_cache(spark: SparkSession) -> int:
    """Free the blocks recorded for THIS module's cache entries: an
    eagerly localCheckpointed frame's materialized RDD stays resident in
    the block manager until py4j finalizers + the ContextCleaner
    nondeterministically collect it (measured by the round-6 review as
    prior-rep cluster-label and flag frames sitting in memory during the
    shuffle sweep's timed cold reps). Unpersists ONLY the RDD ids
    captured when each entry was created — never frames owned by other
    callers — and clears the registry. Returns the number of RDDs
    released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    app = spark.sparkContext.applicationId
    n = 0
    for key, ids in list(_CACHE_RDD_IDS.items()):
        if key[0] != app:  # stale entries from a stopped session
            _CACHE.pop(key, None)
            _CACHE_RDD_IDS.pop(key, None)
            continue
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(True)
                n += 1
        _CACHE.pop(key, None)
        _CACHE_RDD_IDS.pop(key, None)
    return n


def teardown_all_rdd_blocks(spark: SparkSession) -> int:
    """Blanket sweep: unpersist EVERY persistent RDD in the context —
    localCheckpoint blocks included — and clear the registry. ONLY for
    bench/test teardown between cold reps where the whole session's
    block population must go: a checkpointed frame has no lineage to
    recompute from, so any reference still held by ANY caller becomes
    permanently unusable after this."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jmap.values():
        jrdd.unpersist(True)
        n += 1
    _CACHE.clear()
    _CACHE_RDD_IDS.clear()
    return n
