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
from contextlib import contextmanager

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

# Scratch attribution for checkpoints made INSIDE a session_cached build
# (component-loop rounds, candidate frames): the entry's own checkpoint
# holds the result, so every make()-internal block is dead weight the
# moment the entry materializes. session_cached opens a thread-local
# scope around make(); tracked_checkpoint appends to the active scope —
# or, outside any build (top-level query paths), to the module loose
# ledger that release_session_cache drains. Without this, make-internal
# checkpoints linger until session teardown (the round-7-advice leak
# class: scoped release can only free what it can attribute).
_SCRATCH = threading.local()
_LOOSE_IDS: list[int] = []


def _persistent_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def free_block_ids(spark: SparkSession, ids) -> int:
    """Unpersist exactly these block-RDD ids; ids already gone (freed
    early by an iterative caller, or from a stopped session) just miss
    the persistent-RDD map, so double-freeing is a no-op."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(True)
            n += 1
    return n


def tracked_checkpoint_ids(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Eager localCheckpoint for SCRATCH frames, with the block ids both
    registered for scoped release (active build scope, else the loose
    ledger) and returned so iterative callers (the component loops) can
    free superseded rounds as soon as the next round materializes."""
    spark = df.sparkSession
    out, ids = checkpoint_with_ids(spark, df)
    scope = getattr(_SCRATCH, "ids", None)
    if scope is not None:
        scope.extend(ids)
    else:
        with _ATTRIBUTION_LOCK:
            _LOOSE_IDS.extend(ids)
    return out, ids


def tracked_checkpoint(df: DataFrame) -> DataFrame:
    """tracked_checkpoint_ids without the ids — the drop-in replacement
    for bare ``df.localCheckpoint(eager=True)`` on scratch frames."""
    return tracked_checkpoint_ids(df)[0]


@contextmanager
def scratch_scope(spark: SparkSession):
    """Attribute every tracked_checkpoint made on this thread inside the
    ``with`` body to one scope, and free those blocks on exit (success or
    failure). Used by session_cached around make() and by the streaming
    sink around each micro-batch — any frame checkpointed inside serves
    only that build/epoch. Nests: an inner scope frees only its own."""
    outer = getattr(_SCRATCH, "ids", None)
    scope: list[int] = []
    _SCRATCH.ids = scope
    try:
        yield scope
    finally:
        _SCRATCH.ids = outer
        try:
            free_block_ids(spark, scope)
        except Exception:
            pass  # a dying session must not mask the body's error


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


# Memoized scan PLANS per (session, table file, file mtime). A
# spark.read.parquet() call costs 60-90 ms of py4j round trips + footer
# schema inference — paid for the SAME static gate table hundreds of
# times across a suite/gate run (~350 reader calls ≈ 25 s of the sf0.1
# suite before this memo). Only the immutable unresolved DataFrame
# object is reused; no DATA is cached — every action still scans the
# parquet files. The mtime in the key drops the entry the moment the
# file (or a partition dir) is rewritten or appended to, so callers that
# regenerate a table mid-session read fresh bytes, and the applicationId
# keeps plans from a stopped session from leaking into a new one.
_SCAN_MEMO: dict[tuple, tuple[float, DataFrame]] = {}


def table_scan(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        mt = os.path.getmtime(path)
    except OSError:
        mt = -1.0
    key = (spark.sparkContext.applicationId, path)
    hit = _SCAN_MEMO.get(key)
    if hit is not None and hit[0] == mt:
        return hit[1]
    df = spark.read.parquet(path)
    _SCAN_MEMO[key] = (mt, df)
    return df


def session_cached(
    spark: SparkSession, sf_dir: str, kind: str, make
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _CACHE:
        # make() runs OUTSIDE the lock (nested session_cached builds —
        # bpe_token_seq -> bpe_vocab — must be able to take it), inside a
        # fresh scratch scope: its internal tracked checkpoints
        # (component-loop rounds, candidate frames) are dead weight once
        # the entry's own checkpoint holds the result, so the scope frees
        # them on exit, success or failure, rather than leaving them to
        # linger until release.
        with scratch_scope(spark):
            df = make()
            frame, ids = checkpoint_with_ids(spark, df)
        _CACHE[key] = frame
        _CACHE_RDD_IDS[key] = ids
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
    # scratch checkpoints from top-level (non-cached) query paths —
    # candidate frames, component rounds — registered on the loose ledger
    with _ATTRIBUTION_LOCK:
        loose = list(_LOOSE_IDS)
        _LOOSE_IDS.clear()
    n += free_block_ids(spark, loose)
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
    with _ATTRIBUTION_LOCK:
        _LOOSE_IDS.clear()
    return n
