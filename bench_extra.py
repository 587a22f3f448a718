"""Per-query isolation probe (guide §1.4): noop-sink vs collect timing.

`bench.py` is frozen for measurement; this harness answers the question
bench.py cannot: for one query, how much of the wall is Spark compute
(noop sink forces every column of every row, no driver transfer) and how
much is the driver-side collect (pickle path, fixed cost per row)?

Usage:
  python bench_extra.py [--sf DIR] [--plans OUTDIR] [--reps N] q1 q2 ...
  python bench_extra.py --top          # the default heavy set

Prints one JSON line per query:
  {"query": name, "noop": [s, ...], "collect": [s, ...], "rows": n}
and, with --plans, writes OUTDIR/<query>.txt with explain("formatted").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "txt_substring_dup", "dedup_embedding_lsh", "numier_upsert_ventas",
    "esc_food_cost_platos", "dedup_minhash_lsh", "txt_decontamination",
    "ocr_layout_facets", "c1_classify_documents", "txt_tfidf_keywords",
    "corpus_dsir_weights", "events_json_props", "ann_ivf_multiprobe",
    "q02_top_products", "ann_ivf_topk", "txt_unigram_lm_score",
    "q12_multi_price_products", "txt_charset_normalize", "v_productos_top",
    "events_sessionization", "cotejo_inverso_pipeline", "txt_quality_score",
    "cotejo_pipeline", "corpus_chunking", "txt_content_lines",
    "txt_field_extraction", "url_quality_filter", "txt_langid",
    "corpus_vocab_topk", "multimodal_features", "q08_price_history_log",
    "dedup_url_normalize", "supplier_dim", "numier_upsert_catalogo",
    "q11_spend_per_product", "q10_purchase_gaps", "dedup_incremental",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir, plans_dir, reps, suffix = SF_DIR, None, 2, ""
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a in ("--sf", "--plans", "--reps", "--suffix"):
            v = next(it, None)
            if v is None:
                sys.exit(f"{a} requires a value")
            if a == "--sf":
                sf_dir = v
            elif a == "--plans":
                plans_dir = v
            elif a == "--reps":
                reps = int(v)
            else:
                suffix = v
        elif a == "--top":
            names.extend(HEAVY)
        else:
            names.append(a)
    if not names:
        names = HEAVY

    import __spark_entry__ as em
    from facturas_spark.session import get_spark

    qs = em.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries (fail fast, before the session): {unknown}")
    spark = get_spark("bench-extra", cores=CPUS)
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        noop_times, collect_times, rows = [], [], None
        if plans_dir:
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            noop_times.append(round(time.perf_counter() - t0, 3))
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            out = df.collect()
            collect_times.append(round(time.perf_counter() - t0, 3))
            rows = len(out)
        print(json.dumps({
            "query": name, "sf_dir": sf_dir, "noop": noop_times,
            "collect": collect_times, "rows": rows,
        }), flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
