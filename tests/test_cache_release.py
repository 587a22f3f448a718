"""Scoped block release for the session cache (round-7 advice).

``release_session_cache`` must free ONLY the block RDDs recorded for the
module's own ``session_cached`` entries: an eagerly localCheckpointed
frame has no lineage to recompute from, so a blanket
``getPersistentRDDs`` sweep would permanently break any checkpointed
frame a *concurrent* caller still holds. The blanket sweep lives on as
``teardown_all_rdd_blocks`` for bench/test teardown where the whole
session's block population must go.
"""
from __future__ import annotations

import pytest

from facturas_spark.analytics import cache as C


def _blocks_alive(df) -> bool:
    """True iff re-reading the frame still works (its blocks exist)."""
    try:
        return df.count() >= 0
    except Exception:
        return False


@pytest.fixture()
def clean_registry(spark):
    C.teardown_all_rdd_blocks(spark)
    yield
    C.teardown_all_rdd_blocks(spark)


def test_release_frees_own_entries(spark, clean_registry):
    df = C.session_cached(
        spark, "/tmp/x", "t1", lambda: spark.range(100).toDF("n")
    )
    assert df.count() == 100
    key = (spark.sparkContext.applicationId, "/tmp/x", "t1")
    ids = list(C._CACHE_RDD_IDS[key])
    assert ids, "eager checkpoint must register at least one block RDD"
    n = C.release_session_cache(spark)
    assert n >= 1
    alive = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (set(ids) & alive), "own checkpoint blocks must be gone"
    assert not C._CACHE and not C._CACHE_RDD_IDS


def test_release_spares_foreign_checkpointed_frame(spark, clean_registry):
    # a frame checkpointed by some OTHER caller, concurrently held
    foreign = spark.range(50).toDF("n").localCheckpoint(eager=True)
    assert foreign.count() == 50
    C.session_cached(spark, "/tmp/x", "t2", lambda: spark.range(10).toDF("n"))
    C.release_session_cache(spark)
    # the foreign frame must still be usable — the old blanket sweep
    # would have unpersisted its only copy
    assert _blocks_alive(foreign) and foreign.count() == 50


def test_teardown_all_kills_everything(spark, clean_registry):
    foreign = spark.range(50).toDF("n").localCheckpoint(eager=True)
    C.session_cached(spark, "/tmp/x", "t3", lambda: spark.range(10).toDF("n"))
    C.teardown_all_rdd_blocks(spark)
    alive = spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    assert len(alive) == 0
    assert not C._CACHE


def test_component_partitions_env_validated(spark, monkeypatch):
    from facturas_spark.analytics.dedup import _component_layout

    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    for bad in ("0", "-3", "lots"):
        monkeypatch.setenv("SPARK_GRAFT_COMPONENT_PARTITIONS", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_COMPONENT_PARTITIONS"):
            _component_layout(pairs, None)
    monkeypatch.setenv("SPARK_GRAFT_COMPONENT_PARTITIONS", "4")
    _, n = _component_layout(pairs, None)
    assert n == 4
