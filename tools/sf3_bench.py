"""sf3 scale probe with planted Zipf host/source skew (round-5 verdict
directive 7): one more octave past the sf1 proof (150k docs = 3x sf1 =
30x the largest driver gate) AND a deliberately skewed source
distribution — the shape real crawls have, where the quota and
reputation stages hurt first.

Corpus shape: identical schema/text generator to tools/sf1_bench.py
(same vocab, same 4% exact + 4% near dup plants), but ``source`` is
drawn from a truncated Zipf over 200 sources (weight 1/rank^1.3): the
top source carries ~30% of all docs, the top 10 ~60%. Uniform sf1 gave
every source ~250 docs; here the hot source gets ~45k — the per-source
quota window (one partition per source) and any source-keyed shuffle
see a genuinely hot key.

Evidence recorded (BENCH_sf3.json):
- clean job per-stage wall (flags/clean/stats — the job itself reports
  ``sec`` per stage since round 6) + funnel rows, on the skewed corpus
- hot-source concentration actually generated (top-1 / top-10 share)
- the expensive dedup-chain queries at sf3 with the sf1 plan-stability
  markers (AQE on, shuffle/broadcast/sort counts, AQE skew reads)
- a quota-stage isolation timing: the same per-source window on the
  Zipf corpus vs a uniform re-key of the SAME rows — the wall delta IS
  the hot-partition cost, and the mitigation note points at
  ``--pack-shards`` / salting for the 100-TB case.

Usage: python tools/sf3_bench.py [--regen] [--skip-clean]
Writes BENCH_sf3.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF3_DIR = os.environ.get("SPARK_GRAFT_SF3_DIR", "/root/repo/.localdata/sf3")
N_DOCS = int(os.environ.get("SPARK_GRAFT_SF3_DOCS", "150000"))
N_SOURCES = 200
ZIPF_S = 1.3
# 0 = the sf1 30-word vocab; N>0 = synthetic "w{k}" vocab of size N with a
# quadratic-skew draw. The tiny sf1 vocab is FINE at <=150k docs but
# saturates the 3-gram shingle space beyond that: band buckets crowd with
# false candidates and the verify stage goes superlinear — a corpus
# artifact, not an engine property. Big sweep corpora use a real-sized
# vocab so candidate volume stays proportional to true duplication.
VOCAB_SIZE = int(os.environ.get("SPARK_GRAFT_SF3_VOCAB", "0"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _zipf_cum() -> list:
    w = [1.0 / (r ** ZIPF_S) for r in range(1, N_SOURCES + 1)]
    t = sum(w)
    acc, out = 0.0, []
    for x in w:
        acc += x / t
        out.append(acc)
    return out


def _gen_documents(spark):
    """Same text/dup generator as sf1 (executor-side, deterministic),
    Zipf-assigned source."""
    import pandas as pd

    from tools.sf1_bench import _VOCAB, _LANGS, _doc_words, _is_original

    cum = _zipf_cum()

    def gen(batches):
        import bisect
        import random

        def pick_original(rng, i):
            for _ in range(8):
                src = rng.randrange(max(1, i - 5000), i)
                if _is_original(src):
                    return src
            return src

        def doc_words(i):
            if not VOCAB_SIZE:
                return _doc_words(i)
            rng = random.Random(0xD0C ^ (i * 40503 % (1 << 32)))
            n = 10 + int(rng.random() ** 2 * 110)
            # 40% base-vocab words keep the language-marker density the
            # quality stages key on (an all-"w{k}" corpus fails langid/
            # gopher wholesale and the dedup stages see an empty frame);
            # 60% big-vocab words keep the shingle space diverse
            return [
                rng.choice(_VOCAB)
                if rng.random() < 0.4
                else f"w{int(rng.random() ** 2 * VOCAB_SIZE)}"
                for _ in range(n)
            ]

        def perturb_word(rng):
            return (
                f"w{rng.randrange(VOCAB_SIZE)}" if VOCAB_SIZE
                else rng.choice(_VOCAB)
            )

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random(0x5F1D0C5 ^ (i * 2654435761 % (1 << 32)))
                r = rng.random()
                if i >= 100 and r < 0.04:
                    words = doc_words(pick_original(rng, i))
                elif i >= 100 and r < 0.08:
                    words = doc_words(pick_original(rng, i))
                    for _ in range(max(1, len(words) // 30)):
                        words[rng.randrange(len(words))] = perturb_word(rng)
                else:
                    words = doc_words(i)
                text = " ".join(words)
                # Zipf source: rank via inverse-CDF on a dedicated
                # deterministic draw (decoupled from the dup branch rng)
                zr = random.Random(0x51F3 ^ (i * 69069 % (1 << 32))).random()
                rank = bisect.bisect_left(cum, zr)
                out.append(
                    (i, text, _LANGS[i % len(_LANGS)], f"src{rank}", len(text))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    return spark.range(0, N_DOCS, 1, CPUS * 2).mapInPandas(
        gen,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )


EXPENSIVE = [
    "dedup_lsh_clusters",
    "dedup_minhash_lsh",
    "txt_substring_dup",
    "txt_decontamination",
    "corpus_source_quota",
    "dedup_semantic",
]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    regen = "--regen" in argv
    skip_clean = "--skip-clean" in argv
    gen_only = "--gen-only" in argv  # synthesize the corpus, run nothing

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from facturas_spark.session import get_spark

    spark = get_spark("sf3-bench", cores=CPUS)

    docs_path = f"{SF3_DIR}/documents.parquet"
    if regen and os.path.isdir(SF3_DIR):
        shutil.rmtree(SF3_DIR)
    if not os.path.isdir(docs_path):
        t0 = time.perf_counter()
        _gen_documents(spark).write.mode("overwrite").parquet(docs_path)
        # embeddings: sf1 generator shape at 3x vectors (round-6 review:
        # the first cut reused sf1's hardcoded 20k count, so the sf3
        # embedding-dedup timings were recorded against an input that
        # had not grown at all)
        from tools.sf1_bench import N_VECS, _gen_embeddings

        _gen_embeddings(spark, n_vecs=3 * N_VECS).write.mode(
            "overwrite"
        ).parquet(f"{SF3_DIR}/embeddings.parquet")
        print(
            f"# generated sf3 ({N_DOCS} Zipf-source docs) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    if gen_only:
        print(json.dumps({"metric": "sf3_gen_only", "n_docs": N_DOCS,
                          "dir": SF3_DIR}))
        return 0

    docs = spark.read.parquet(docs_path)
    by_src = (
        docs.groupBy("source").count().orderBy(F.desc("count")).limit(10).collect()
    )
    top1 = by_src[0]["count"] / N_DOCS
    top10 = sum(r["count"] for r in by_src) / N_DOCS
    result: dict = {
        "metric": "sf3_skew_suite",
        "sf": 3.0,
        "cpus": CPUS,
        "n_docs": N_DOCS,
        "zipf_s": ZIPF_S,
        "top1_source_share": round(top1, 3),
        "top10_source_share": round(top10, 3),
        "queries": {},
        "plans": {},
    }

    # 1. production clean job on the skewed corpus (per-stage walls come
    # from the job itself since round 6)
    if not skip_clean:
        out_dir = f"{SF3_DIR}/clean_out"
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        import contextlib
        import io as _io

        from facturas_spark.jobs.clean_corpus import main as clean_main

        buf = _io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            rc = clean_main(["--input", docs_path, "--output", out_dir])
        dt = round(time.perf_counter() - t0, 2)
        assert rc == 0
        job = json.loads(buf.getvalue().strip().splitlines()[-1])
        kept = spark.read.parquet(f"{out_dir}/clean").count()
        result["clean_job"] = {
            "sec": dt,
            "kept": kept,
            "input": N_DOCS,
            "stage_sec": {
                k: v.get("sec") for k, v in job["stages"].items()
            },
            "funnel": job["stages"].get("stats", {}).get("funnel"),
        }

    # 2. quota-window isolation: Zipf key vs uniform re-key of the SAME
    # rows — the delta is the hot-partition cost the 100-TB design must
    # absorb (mitigations: --pack-shards for packing; for quota, the
    # count-then-sample two-phase form documented in corpus_clean.py)
    def quota_time(frame) -> float:
        qw = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        t0 = time.perf_counter()
        frame.withColumn("rn", F.row_number().over(qw)).filter(
            F.col("rn") <= 15
        ).count()
        return round(time.perf_counter() - t0, 3)

    uniform = docs.withColumn(
        "source", F.concat(F.lit("u"), F.pmod(F.xxhash64("doc_id"), F.lit(N_SOURCES)))
    )
    docs.persist().count()
    uniform.persist().count()
    result["quota_window"] = {
        "zipf_sec": quota_time(docs),
        "uniform_sec": quota_time(uniform),
    }
    docs.unpersist()
    uniform.unpersist()

    # 3. expensive suite queries at sf3 — plan stability + skew markers
    import __spark_entry__ as em

    qs = em.queries()
    for name in EXPENSIVE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF3_DIR)
        n = len(df.collect())
        dt = round(time.perf_counter() - t0, 2)
        result["queries"][name] = {"sec": dt, "rows": n}
        plan = df._jdf.queryExecution().executedPlan().toString()
        result["plans"][name] = {
            "aqe": "AdaptiveSparkPlan" in plan,
            "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
            "aqe_skew_reads": plan.count("skewed"),
            "broadcasts": plan.count("BroadcastExchange"),
            "shuffles": plan.count("Exchange")
            - plan.count("BroadcastExchange")
            - plan.count("ReusedExchange"),
            "sorts": plan.count("Sort "),
        }

    result["total_query_sec"] = round(
        sum(q["sec"] for q in result["queries"].values()), 2
    )
    with open("/root/repo/BENCH_sf3.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
