"""sf1 scale-up proof (round-4 directive 8): run the production clean
job and the most expensive documents/embeddings suite queries at sf1 —
10x the largest driver-provided gate (sf0.1) — and record wall times +
plan-stability signals for BENCH.md.

The driver ships parquet only up to sf0.1, so sf1 is synthesized
DETERMINISTICALLY here, executor-side (mapInPandas over an id range — no
driver materialization), matching the driver tables' shape and
distribution:

- documents(doc_id, text, lang, source, n_chars): bag-of-words text over
  the driver corpus' ~30-word vocab, 10-120 words, langs weighted like
  the small gates, source = src{doc_id % 200} (source count scales with the
  corpus, keeping per-source volume at the sf0.1 level so the quota
  stage cuts proportionally). 4% of docs are exact
  duplicates of an earlier doc and 4% near-duplicates (a few words
  perturbed), so the dedup stages do representative work at scale.
- embeddings(vec_id, embedding float[64], label): hash-seeded
  N(0,1)/8 vectors; 5% are near-copies of an earlier vector (cosine
  ~0.999) so near-dup/ANN paths have real neighbors.

TPC-H-shaped tables (orders/lineitem — the cotejo/escandallos queries)
are NOT scaled here: the driver provides them only to sf0.1 and their
generators are not part of this repo's contract. The sf1 evidence covers
the corpus pipeline, which is the 100-TB-shaped surface.

Usage: python tools/sf1_bench.py [--regen] [--skip-clean]
Writes BENCH_sf1.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.localdata/sf1")
N_DOCS = 50_000
N_VECS = 20_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query a big key window join vector table "
    "stream row merge data customer the"
).split()
_LANGS = ["en", "en", "en", "en", "en", "es", "es", "fr", "de", "zh"]


def _gen_documents(spark):
    import pandas as pd

    def gen(batches):
        import random

        def pick_original(rng, i):
            # dup sources must be docs whose OWN stored text is the
            # _doc_words output (round-5 review: picking a doc that was
            # itself a dup/near-dup duplicates nothing)
            for _ in range(8):
                src = rng.randrange(max(1, i - 5000), i)
                if _is_original(src):
                    return src
            return src

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random(0x5F1D0C5 ^ (i * 2654435761 % (1 << 32)))
                r = rng.random()
                if i >= 100 and r < 0.04:
                    # exact duplicate of an earlier ORIGINAL doc
                    words = _doc_words(pick_original(rng, i))
                elif i >= 100 and r < 0.08:
                    words = _doc_words(pick_original(rng, i))
                    for _ in range(max(1, len(words) // 30)):
                        words[rng.randrange(len(words))] = rng.choice(_VOCAB)
                else:
                    words = _doc_words(i)
                text = " ".join(words)
                out.append(
                    (i, text, _LANGS[i % len(_LANGS)], f"src{i % 200}", len(text))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    return spark.range(0, N_DOCS, 1, CPUS * 2).mapInPandas(
        gen,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )


def _is_original(i: int) -> bool:
    """Whether doc i's stored text equals _doc_words(i) (i.e. it took
    neither dup branch) — mirrors the branch condition exactly."""
    import random

    rng = random.Random(0x5F1D0C5 ^ (i * 2654435761 % (1 << 32)))
    return i < 100 or rng.random() >= 0.08


def _doc_words(i: int) -> list:
    import random

    rng = random.Random(0xD0C ^ (i * 40503 % (1 << 32)))
    n = 10 + int(rng.random() ** 2 * 110)
    return [rng.choice(_VOCAB) for _ in range(n)]


def _gen_embeddings(spark, n_vecs: int = N_VECS):
    import pandas as pd

    def gen(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for v in pdf["id"]:
                v = int(v)
                rs = np.random.RandomState(v % (1 << 31))
                e = (rs.randn(64) / 8.0).astype("float32")
                if v >= 100 and v % 20 == 7:  # 5%: near-copy of v-50
                    rs2 = np.random.RandomState((v - 50) % (1 << 31))
                    e = (rs2.randn(64) / 8.0).astype("float32")
                    e[v % 64] += 0.003
                out.append((v, e.tolist(), v % 10))
            yield pd.DataFrame(out, columns=["vec_id", "embedding", "label"])

    return spark.range(0, n_vecs, 1, CPUS).mapInPandas(
        gen, schema="vec_id long, embedding array<float>, label int"
    )


# the most expensive documents/embeddings-backed suite queries at sf0.1
# (BENCH_r04 ordering), i.e. the ones whose cost scales with the corpus
EXPENSIVE = [
    "corpus_clean_stats",
    "dedup_lsh_clusters",
    "txt_substring_dup",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "txt_decontamination",
    "corpus_chunking",
    "dedup_semantic",
    "dedup_embedding_lsh",
    "txt_unigram_lm_score",
]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    regen = "--regen" in argv
    skip_clean = "--skip-clean" in argv

    from facturas_spark.session import get_spark

    spark = get_spark("sf1-bench", cores=CPUS)

    docs_path = f"{SF1_DIR}/documents.parquet"
    emb_path = f"{SF1_DIR}/embeddings.parquet"
    if regen and os.path.isdir(SF1_DIR):
        shutil.rmtree(SF1_DIR)
    if not os.path.isdir(docs_path):
        t0 = time.perf_counter()
        _gen_documents(spark).write.mode("overwrite").parquet(docs_path)
        _gen_embeddings(spark).write.mode("overwrite").parquet(emb_path)
        print(
            f"# generated sf1 ({N_DOCS} docs, {N_VECS} vecs) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    result: dict = {"metric": "sf1_suite", "sf": 1.0, "cpus": CPUS,
                    "n_docs": N_DOCS, "queries": {}, "plans": {}}

    # 1. the production clean job (stage-resumable, fresh output dir)
    if not skip_clean:
        out_dir = f"{SF1_DIR}/clean_out"
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        from facturas_spark.jobs.clean_corpus import main as clean_main

        t0 = time.perf_counter()
        rc = clean_main(
            ["--input", docs_path, "--output", out_dir]
        )
        dt = round(time.perf_counter() - t0, 2)
        assert rc == 0
        kept = spark.read.parquet(f"{out_dir}/clean").count()
        result["clean_job"] = {"sec": dt, "kept": kept, "input": N_DOCS}

    # 2. expensive suite queries, pointed at the sf1 dir
    import __spark_entry__ as em

    qs = em.queries()
    for name in EXPENSIVE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF1_DIR)
        n = len(df.collect())
        dt = round(time.perf_counter() - t0, 2)
        result["queries"][name] = {"sec": dt, "rows": n}
        plan = df._jdf.queryExecution().executedPlan().toString()
        result["plans"][name] = {
            "aqe": "AdaptiveSparkPlan" in plan,
            "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
            "broadcasts": plan.count("BroadcastExchange"),
            # 'Exchange' also matches inside 'BroadcastExchange' and
            # 'ReusedExchange' — subtract both so shuffles counts real
            # shuffle exchanges only
            "shuffles": plan.count("Exchange")
            - plan.count("BroadcastExchange")
            - plan.count("ReusedExchange"),
            "sorts": plan.count("Sort "),
        }

    result["total_query_sec"] = round(
        sum(q["sec"] for q in result["queries"].values()), 2
    )
    with open("/root/repo/BENCH_sf1.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
