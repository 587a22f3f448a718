"""By-construction tests for the end-to-end dedup chain operators.

The oracle gate checks cross-engine agreement; these tests pin the
SEMANTICS on a corpus whose ground-truth clusters are known by
construction: exact copies, near-copies (one word changed), and
unrelated documents.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tiny_corpus_dir(spark, tmp_path_factory):
    base = " ".join(f"word{i}" for i in range(60))
    near = base.replace("word30", "changed")      # ~95% shingle overlap
    docs = [
        (0, base, "en"),
        (1, base, "en"),                          # exact dup of 0
        (2, near, "en"),                          # near-dup of 0/1
        (3, " ".join(f"other{i}" for i in range(60)), "en"),  # unrelated
        (4, "tiny", "en"),                        # <3 words: no shingles
        (5, base + " tail1 tail2", "en"),         # still >0.5 jaccard
    ]
    out = str(tmp_path_factory.mktemp("dedup") / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string, lang string").write.parquet(
        out
    )
    return out.rsplit("/documents.parquet", 1)[0]


def test_lsh_chain_finds_known_clusters(spark, tiny_corpus_dir):
    """Exact and near duplicates land in one cluster labeled by the min
    doc_id; unrelated and shingle-less docs stay out of the node set."""
    from facturas_spark.analytics.dedup import dedup_lsh_clusters

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_lsh_clusters(spark, tiny_corpus_dir).collect()
    }
    assert labels[0] == 0 and labels[1] == 0 and labels[2] == 0
    assert labels[5] == 0
    assert 3 not in labels  # unrelated: never a candidate pair survivor
    assert 4 not in labels  # no shingles -> excluded from the chain


def test_embedding_lsh_same_bucket_only(spark, tmp_path):
    """Candidates come only from sign-bucket collisions: opposite-sign
    vectors never pair even at cosine 1 with themselves; same-bucket
    near-identical vectors do."""
    from facturas_spark.analytics import dedup as D

    vecs = [
        (0, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (1, [0.9, 1.1, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),   # same bucket, cos~1
        (2, [-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),  # bucket 0
        (3, [-0.9, -1.1, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),  # bucket 0
    ]
    out = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).write.parquet(out)
    rows = D.dedup_embedding_lsh(spark, str(tmp_path)).collect()
    pairs = {(r["id1"], r["id2"]) for r in rows}
    # 0-1 share bucket 255, 2-3 share bucket 0; cross-bucket pairs absent
    assert (0, 1) in pairs and (2, 3) in pairs
    assert (0, 2) not in pairs and (1, 3) not in pairs
    by_pair = {(r["id1"], r["id2"]): r["cos_sim"] for r in rows}
    assert by_pair[(0, 1)] > 0.99
    assert by_pair[(2, 3)] > 0.99  # negatives of each other: cos still ~1

def test_embedding_lsh_multiband_recall(spark, tmp_path):
    """Banding recovers pairs a single bucket misses: vectors 0/1 disagree
    on a dim inside band 0 (different band-0 keys) but share band 1 — the
    banded chain pairs them; a single 8-bit bucket could not."""
    from facturas_spark.analytics import dedup as D

    base = [1.0] * 16
    flip0 = [-1.0] + [1.0] * 15          # band-0 key differs, band-1 equal
    anti = [-1.0] * 16                   # differs in every band
    out = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        [(0, base), (1, flip0), (2, anti)],
        "vec_id long, embedding array<float>",
    ).write.parquet(out)
    rows = D.dedup_embedding_lsh(spark, str(tmp_path)).collect()
    pairs = {(r["id1"], r["id2"]) for r in rows}
    assert (0, 1) in pairs               # band-1 collision, cos ~0.875
    assert (0, 2) not in pairs           # no shared band key (and cos -1)
    assert (1, 2) not in pairs


def test_embedding_lsh_short_vectors_band_gated(spark, tmp_path):
    """Vectors shorter than a band's dim slice skip that band instead of
    colliding on a null-padded key: 8-dim vectors emit band 0 only."""
    from facturas_spark.analytics import dedup as D
    from facturas_spark.analytics.dedup import EMB_BAND_BITS, N_EMB_BANDS

    assert N_EMB_BANDS * EMB_BAND_BITS == 32
    vecs = [
        (0, [1.0] * 8),
        (1, [-1.0] * 8),   # opposite band-0 key; no higher bands exist
    ]
    out = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).write.parquet(out)
    assert D.dedup_embedding_lsh(spark, str(tmp_path)).count() == 0


def test_components_partitioned_path_identical(spark):
    """The cluster-scale layout (hash-partitioned N-way co-partitioned
    joins, no broadcast, no coalesce(1)) produces exactly the labels of
    the sandbox layout on a graph with a chain, a triangle, a 2-clique
    and an isolated pair."""
    from facturas_spark.analytics.dedup import _min_label_components

    edges = [
        (1, 2), (2, 3), (3, 4),        # chain -> cluster 1
        (10, 11), (11, 12), (10, 12),  # triangle -> cluster 10
        (20, 21),                      # pair -> cluster 20
        (30, 31),                      # pair -> cluster 30
    ]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    base = {
        (r["doc_id"], r["cluster_id"])
        for r in _min_label_components(pairs).collect()
    }
    part = {
        (r["doc_id"], r["cluster_id"])
        for r in _min_label_components(pairs, partitions=8).collect()
    }
    assert base == part
    assert base == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20), (30, 30), (31, 30),
    }


def test_xxhash64_family_same_clusters(spark):
    """The production hash family (xxhash64 integer MinHash — no hex
    strings, ~4x cheaper) must find the same near-dup clusters as the
    DuckDB-portable md5 family on the test corpus: both are uniform hash
    families, so band collisions recover the same >=0.5-Jaccard pairs and
    the verify step makes the final clusters hash-family-independent."""
    from facturas_spark.analytics.dedup import dedup_lsh_clusters

    sf = "/root/testdata/sf0.001"
    md5_rows = sorted(map(tuple, dedup_lsh_clusters(spark, sf).collect()))
    xx_rows = sorted(
        map(tuple, dedup_lsh_clusters(spark, sf, family="xxhash64").collect())
    )
    assert md5_rows == xx_rows
    assert len(md5_rows) > 0


def test_star_components_equal_min_label(spark):
    """Large-star/small-star (the deep-component safety valve) produces
    exactly min-label's (doc_id, cluster_id) labels — fixed shapes
    including a DEEP chain (min-label's worst case), plus randomized
    graphs, plus the env-flag dispatch and the partitioned layout."""
    import os
    import random

    from facturas_spark.analytics.dedup import (
        _min_label_components,
        _star_components,
    )

    def labels(df):
        return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}

    fixed = [
        [(1, 2), (2, 3), (3, 4)],
        [(10, 11), (11, 12), (10, 12), (20, 21)],
        [(i, i + 1) for i in range(1, 30)],          # depth-29 chain
        [(2, 1)],                                    # reversed order pair
        [(5, 5), (6, 7)],                            # self-loop ignored
    ]
    rng = random.Random(7)
    for _ in range(3):
        n = rng.randrange(5, 30)
        fixed.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(n)]
        )
    for edges in fixed:
        pairs = spark.createDataFrame(edges, "id1 long, id2 long")
        want = labels(_min_label_components(pairs))
        assert labels(_star_components(pairs)) == want, edges
        assert labels(_star_components(pairs, partitions=4)) == want, edges

    # env-flag dispatch: _min_label_components itself routes to star
    pairs = spark.createDataFrame(fixed[2], "id1 long, id2 long")
    want = labels(_min_label_components(pairs))
    os.environ["SPARK_GRAFT_COMPONENT_ALGO"] = "star"
    try:
        assert labels(_min_label_components(pairs)) == want
    finally:
        del os.environ["SPARK_GRAFT_COMPONENT_ALGO"]


def test_components_adaptive_layout_threshold(spark):
    """_component_layout auto-selects the N-way co-partitioned loop once
    the materialized pair count crosses the threshold (env-overridable),
    with identical labels either side of the switch."""
    import os

    from facturas_spark.analytics.dedup import (
        _component_layout,
        _min_label_components,
    )

    edges = [(i, i + 1) for i in range(0, 40, 2)]  # 20 disjoint pairs
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")

    # below threshold: sandbox single-partition broadcast layout
    _, p = _component_layout(pairs, None)
    assert p is None

    os.environ["SPARK_GRAFT_COMPONENT_AUTO_THRESHOLD"] = "10"
    try:
        _, p = _component_layout(pairs, None)
        assert p is not None and p >= 2
        # the adaptive run (threshold crossed -> partitioned loop) keeps
        # exactly the labels of the explicit layouts
        want = {(a, a) for a, _ in edges} | {(b, a) for a, b in edges}
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in _min_label_components(pairs).collect()
        }
        assert got == want
    finally:
        del os.environ["SPARK_GRAFT_COMPONENT_AUTO_THRESHOLD"]

    # explicit argument always wins over the adaptive count
    _, p = _component_layout(pairs, 4)
    assert p == 4
