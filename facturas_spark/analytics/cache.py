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
