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

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def session_cached(
    spark: SparkSession, sf_dir: str, kind: str, make
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _CACHE:
        _CACHE[key] = make().localCheckpoint(eager=True)
    return _CACHE[key]


def release_session_cache(spark: SparkSession) -> int:
    """Free the BLOCKS, not just the references: ``_CACHE.clear()`` alone
    drops the Python handles while every eagerly localCheckpointed
    frame's materialized RDD stays resident in the block manager until
    py4j finalizers + the ContextCleaner nondeterministically collect it
    — measured by the round-6 review as prior-rep cluster-label and flag
    frames sitting in memory during the shuffle sweep's timed cold reps.
    Unpersists every persistent RDD in the context (localCheckpoint
    blocks included) and clears the registry. ONLY for bench/test
    teardown between cold reps: a checkpointed frame has no lineage to
    recompute from, so any still-held reference becomes unusable."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jmap.values():
        jrdd.unpersist(True)
        n += 1
    _CACHE.clear()
    return n
