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


def test_concurrent_checkpoint_attribution_disjoint(spark, clean_registry):
    """Many threads checkpointing through checkpoint_with_ids at once
    (release barrier maximizes window overlap): every thread's id list
    must cover its own frame and be disjoint from every other's — the
    unlocked before/after delta would let overlapping windows claim each
    other's unrecomputable blocks. Releasing one thread's ids must leave
    all other frames readable."""
    import threading

    from facturas_spark.analytics.cache import checkpoint_with_ids

    n_threads = 6
    barrier = threading.Barrier(n_threads)
    results: dict[int, tuple] = {}
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            df = spark.range(i * 1000, i * 1000 + 500).toDF("n")
            barrier.wait(timeout=60)
            results[i] = checkpoint_with_ids(spark, df)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors and len(results) == n_threads
    all_ids = [set(ids) for _, ids in results.values()]
    for i in range(n_threads):
        assert all_ids[i], "every checkpoint must register blocks"
        for j in range(i + 1, n_threads):
            assert not (all_ids[i] & all_ids[j]), (i, j)
    # freeing thread 0's blocks leaves every other frame readable
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in results[0][1]:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(True)
    for i in range(1, n_threads):
        assert results[i][0].count() == 500


def test_build_scratch_freed_entry_survives(spark, clean_registry):
    """make()-internal tracked checkpoints (component rounds, candidate
    frames) are scratch: they must be GONE the moment the entry
    materializes, while the entry itself stays readable and the scratch
    ids never contaminate the entry's release list."""
    scratch_ids: list[int] = []

    def make():
        inner, ids = C.tracked_checkpoint_ids(spark.range(500).toDF("n"))
        scratch_ids.extend(ids)
        return inner.selectExpr("sum(n) as s")

    df = C.session_cached(spark, "/tmp/x", "scratch1", make)
    assert df.collect()[0]["s"] == 499 * 500 // 2
    alive = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert scratch_ids and not (set(scratch_ids) & alive), (
        "build scratch must be freed at entry materialization"
    )
    key = (spark.sparkContext.applicationId, "/tmp/x", "scratch1")
    assert not (set(scratch_ids) & set(C._CACHE_RDD_IDS[key]))
    assert df.collect()[0]["s"] == 499 * 500 // 2  # entry still readable
    assert not C._LOOSE_IDS, "scoped scratch must not hit the loose ledger"


def test_loose_ledger_drained_by_release(spark, clean_registry):
    """A tracked checkpoint OUTSIDE any build scope (top-level query
    path) registers on the loose ledger; release_session_cache frees it.
    In-loop early freeing of the same ids must be a harmless no-op."""
    df, ids = C.tracked_checkpoint_ids(spark.range(100).toDF("n"))
    assert df.count() == 100 and ids
    assert set(ids) <= set(C._LOOSE_IDS)
    # early free (what the component loops do per round), then release
    C.free_block_ids(spark, ids)
    n = C.release_session_cache(spark)  # double-free: must not raise
    assert n >= 0 and not C._LOOSE_IDS
    alive = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (set(ids) & alive)


def test_component_loop_footprint_bounded(spark, clean_registry):
    """A long path graph forces the min-label loop through O(diameter)
    rounds; superseded rounds must be freed as the loop runs, so the
    block population at return is O(1) frames, not O(rounds)."""
    from facturas_spark.analytics.dedup import _min_label_components

    before = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id1 long, id2 long"
    )
    labels = _min_label_components(pairs)
    assert labels.filter("cluster_id = 0").count() == 13  # one component
    after = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    # alive: the pairs checkpoint + the FINAL labels round only (und and
    # every superseded round freed in-loop; diameter 12 ⇒ ≥3 rounds)
    assert len(after - before) <= 3, sorted(after - before)
    C.release_session_cache(spark)  # loose ledger: everything attributable
    end = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (end - before), "release must drain all loop blocks"


def test_star_component_loop_footprint_bounded(spark, clean_registry):
    from facturas_spark.analytics.dedup import _star_components

    before = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id1 long, id2 long"
    )
    labels = _star_components(pairs)
    assert labels.filter("cluster_id = 0").count() == 13
    after = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    # alive: pairs ckpt + nodes + FINAL edge set (superseded rounds freed)
    assert len(after - before) <= 4, sorted(after - before)
    C.release_session_cache(spark)
    end = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (end - before)


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
