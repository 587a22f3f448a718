"""Deduplication + matching operators exposed as oracle-checkable queries.

Training-data-pipeline staples over the ``documents`` table plus
fuzzy-matching demos over TPC-H part names. Everything here is expressible
in both Spark SQL and DuckDB so the driver's oracle gate covers it.

Portability note: MinHash normally uses an integer hash family; DuckDB
can't parse hex -> int without extensions, so the hash family is
``min(md5(token || ':' || i))`` under LEXICOGRAPHIC order — md5 hex strings
are uniformly distributed, so the min-string is a valid MinHash permutation
stand-in, and both engines produce identical signatures. SimHash similarly
uses md5-derived hex-nibble bits (see simhash_expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_HASHES = 8  # MinHash signature length
N_BANDS = 4   # LSH bands (2 rows per band)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _words(col):
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+"),
        lambda x: x != F.lit(""),
    )


def m3_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 demo: edit distance between consecutive part names (built-in
    levenshtein, both engines); keys restricted so output stays small."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    a = part.select(F.col("p_partkey").alias("k1"), F.col("p_name").alias("n1"))
    b = part.select(F.col("p_partkey").alias("k2"), F.col("p_name").alias("n2"))
    return (
        a.join(b, a.k1 + 1 == b.k2)
        .select("k1", "k2", F.levenshtein("n1", "n2").alias("lev"))
        .orderBy("k1")
    )


def m5_product_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 word-overlap matcher over part-name pairs (key<=200, k1<k2),
    returning only matching pairs — the fuzzy-join primitive."""
    from facturas_spark.matching.similarity import comparar_productos_expr

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    a = part.select(F.col("p_partkey").alias("k1"), F.col("p_name").alias("n1"))
    b = part.select(F.col("p_partkey").alias("k2"), F.col("p_name").alias("n2"))
    return (
        a.join(b, a.k1 < b.k2)
        .filter(comparar_productos_expr(F.col("n1"), F.col("n2")))
        .select("k1", "k2")
        .orderBy("k1", "k2")
    )


def m14_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14 duplicate detection: same (custkey, orderdate) seen >1 time —
    the reference's CIF+numero_factura equality check shape."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", F.to_date("o_orderdate").alias("fecha"))
        .agg(F.count("*").alias("copies"), F.min("o_orderkey").alias("first_key"))
        .filter(F.col("copies") > 1)
        .orderBy("o_custkey", "fecha")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection over documents.

    signature_i = min over word tokens of md5(token || ':' || i);
    band_j = md5(sig_{2j} || sig_{2j+1}); docs sharing a band key are
    near-dup candidates. Output: per-band-collision-group stats.
    Scale shape: one shuffle on band key (explode -> groupBy), candidate
    verification would be a self-join within groups — counts reported here.
    """
    docs = _t(spark, sf_dir, "documents").filter(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    words = _words(F.col("text"))

    def _sig(i: int):
        # NB: a 2-arg lambda to F.transform receives (element, index) — a
        # default-arg capture of i would be shadowed by the array index
        suffix = f":{i}"
        return F.array_min(
            F.transform(words, lambda w: F.md5(F.concat(w, F.lit(suffix))))
        ).alias(f"h{i}")

    sigs = [_sig(i) for i in range(N_HASHES)]
    sig_df = docs.select("doc_id", *sigs)
    bands = sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.md5(
                            F.concat(F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}"))
                        ).alias("key"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    groups = bands.groupBy("band", "key").agg(F.count("*").alias("members"))
    return (
        groups.filter(F.col("members") > 1)
        .groupBy("band")
        .agg(
            F.count("*").alias("collision_groups"),
            F.sum("members").alias("docs_in_collisions"),
            F.max("members").alias("max_group"),
        )
        .orderBy("band")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup over a small doc window (id<40 x id<40):
    shingle arrays -> intersection/union sizes. array_distinct before the
    set ops (shingles repeat). Reports pairs with jaccard >= 0.01."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    words = _words(F.col("text"))
    # valid shingle starts: i in [0, w-3] (1-based element_at below)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
                F.element_at(words, i + 3),
            ),
        )
    )
    sh = (
        docs.select("doc_id", F.size(words).alias("_w"), shingles.alias("sh"))
        .filter(F.col("_w") >= 3)
        .drop("_w")
    )
    a = sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("s1"))
    b = sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("s2"))
    pairs = a.join(b, a.id1 < b.id2)
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.size(F.array_union("s1", "s2"))
    jac = inter / union
    return (
        pairs.select("id1", "id2", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.01)
        .orderBy("id1", "id2")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER formation: connected components over the
    ngram-Jaccard pair graph via iterative min-label propagation to a
    fixpoint (the step after pair detection a real dedup pipeline needs —
    'keep one doc per component'). Node set = docs in >=1 near-dup pair;
    cluster_id = the component's min doc_id.

    Scale shape: each iteration is one shuffle on the node id (join +
    min-agg); convergence in O(diameter) rounds — near-dup components are
    shallow (dups of dups), so 3-5 rounds in practice. Results persist per
    round so lineage stays flat. DuckDB oracle computes the same
    components with a recursive reachability CTE."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    # the pair graph is tiny relative to the corpus (near-dups are rare):
    # collapse to one partition and broadcast inside the loop so each
    # round is a handful of tasks, not shuffle-partition fan-out. At true
    # cluster scale swap coalesce(1) for hash-partitioning on the node id
    # (the loop body is partitioning-agnostic).
    und = (
        pairs.unionByName(
            pairs.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
        )
        .toDF("src", "dst")
        .coalesce(1)
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .coalesce(1)
        .persist()
    )
    labels.count()
    while True:
        neigh = (
            und.join(F.broadcast(labels), und.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("_nl"))
        )
        merged = (
            labels.join(F.broadcast(neigh), labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
            .coalesce(1)
            .persist()
        )
        changed = merged.filter(F.col("label") != F.col("_old")).count()
        labels.unpersist()
        labels = merged.drop("_old")
        if changed == 0:
            break
    und.unpersist()
    return labels.select(
        "doc_id", F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION: keep one document per near-dup component (the
    component's min doc_id) and every untouched document — the surviving
    corpus after cluster-based dedup. Anti-join of the doc window against
    non-canonical cluster members; at scale the cluster map is the small
    side (dup ratio << 1), so the anti-join broadcasts."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    clusters = dedup_clusters(spark, sf_dir)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return (
        docs.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang", F.length("text").alias("n_chars"))
        .orderBy("doc_id")
    )


N_SIMHASH_BITS = 16


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprints over documents (doc_id < 60).

    Portable bit family: bit_k of token = 1 iff hex char k of md5(token) is
    in [8..f] (each nibble's MSB is a fair coin). simhash bit_k = majority
    vote over tokens; emitted as an integer. Identical in DuckDB.
    """
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    words = _words(F.col("text"))
    hashes = F.transform(words, lambda w: F.md5(w))
    n = F.size(hashes)
    bits = []
    for k in range(N_SIMHASH_BITS):
        pos = k + 1
        votes = F.size(
            F.filter(
                hashes,
                lambda h: F.substring(h, pos, 1).isin(*"89abcdef"),
            )
        )
        bits.append(F.when(votes * 2 > n, F.lit(1 << k)).otherwise(F.lit(0)))
    simhash = sum(bits[1:], bits[0])
    return (
        docs.select("doc_id", simhash.alias("simhash"))
        .filter(F.size(words) > 0)
        .orderBy("doc_id")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: vector pairs (id<80, id1<id2) with
    cosine >= 0.2 — the semantic-dedup primitive over array<float>.
    JVM-side aggregate/zip_with; brute-force quadratic on the small window
    (the scale path is LSH-bucketing, see ann_lsh_buckets)."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"))
    pairs = a.join(b, a.id1 < b.id2)
    dot = F.aggregate(
        F.zip_with("e1", "e2", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    cos = dot / (norm(F.col("e1")) * norm(F.col("e2")))
    return (
        pairs.select("id1", "id2", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
        .orderBy("id1", "id2")
    )


def txt_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via polynomial rolling hash of the normalized
    text: fold (acc*31 + ascii(char)) % 1000000007 over characters.
    Order-sensitive (unlike the md5 fingerprint in dedup_exact)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    norm = F.lower(F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", " "))
    chars = F.split(norm, "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


def txt_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer: word pieces + standalone punctuation
    (`[a-z0-9]+|[^a-z0-9\\s]`) over lowered text — the LLM-pretraining
    token-count estimator; per-lang totals."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce("text", F.lit(""))),
            F.lit(r"([a-z0-9]+|[^a-z0-9\s])"),
            1,
        )
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(toks).alias("total_tokens"),
            F.round(F.avg(toks), 2).alias("avg_tokens"),
            F.count("*").alias("docs"),
        )
        .orderBy("lang")
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN scale path: 8-bit sign bucket over the first 8
    embedding dims (axis-aligned hyperplanes — deterministic and portable).
    At scale, top-k search probes only the query's bucket (+neighbors),
    turning the brute-force O(N) scan into O(N/256). Output: bucket
    occupancy histogram (the candidate-reduction evidence)."""
    emb = _t(spark, sf_dir, "embeddings")
    bucket = None
    for i in range(8):
        bit = F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return (
        emb.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("vectors"))
        .orderBy("bucket")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN scale path: K=8 coarse centroids (vectors
    vec_id 1..8 — a deterministic stand-in for a k-means codebook), every
    vector assigned to its max-cosine centroid (ties to the lowest
    centroid id), then top-10 cosine search for query vec 0 runs ONLY
    inside the query's cell — the scan shrinks O(N) -> O(N/K), and at
    cluster scale the assignment is a write-time column so the probe is a
    partition-pruned read. Plan: centroids broadcast (8 rows), one
    window argmax on vec_id, TakeOrdered for the top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8))
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )

    def cos(a: str, b: str):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        n = lambda c: F.sqrt(  # noqa: E731
            F.aggregate(
                F.transform(c, lambda v: v.cast("double") * v.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return dot / (n(a) * n(b))

    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", cos("embedding", "ce").alias("_s"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("_s").desc(), F.col("cent_id")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cell"))
    )
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("cell").alias("qcell")
    )
    return (
        assigned.join(F.broadcast(q), assigned.cell == F.col("qcell"))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "cell",
            F.round(cos("embedding", "qe"), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


def txt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram-heuristic family): counts of
    language-marker tokens -> argmax guess; confusion counts vs the lang
    column. All built-ins; one shuffle."""
    docs = _t(spark, sf_dir, "documents")
    words = _words(F.col("text"))

    def hits(markers: list[str]):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    en = hits(["the", "of", "and", "to", "in", "a", "is"])
    es = hits(["el", "la", "de", "que", "los", "las", "una", "y"])
    guess = (
        F.when((en > es) & (en > 0), "en")
        .when((es > en) & (es > 0), "es")
        .when((en == es) & (en > 0), "tie")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", guess.alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("docs"))
        .orderBy("lang", "guess")
    )
