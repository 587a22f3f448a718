"""Multi-executor parity: the extraction job on ``local-cluster[2,4,...]``.

``local[N]`` runs every task in the driver JVM — closures, broadcasts, and
Arrow batches never cross a process boundary, so serialization bugs hide.
``local-cluster[2,4,mem]`` launches two REAL executor JVMs with separate
Python worker pools: the fused UDF, its imported package code, and the
result rows all travel the same wire a production cluster uses.

Runs in a SUBPROCESS because a JVM allows one SparkContext and the shared
session fixture owns this process's. Marked by runtime cost: ~60 s for
cluster startup + job; it asserts byte-level parity of the full extraction
output against the in-process local-mode run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.appName("cluster-parity")
    .master("local-cluster[2,4,2048]")
    .config("spark.executorEnv.PYTHONPATH", %(repo)r)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
from facturas_spark.synth import gen_corpus_slice
from facturas_spark.pipeline import extract_pages

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen(it):
    import pandas as pd
    for pdf in it:
        rows = gen_corpus_slice(pdf["id"].tolist(), seed=42)
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


pages = spark.range(0, 300, 1, 8).mapInPandas(gen, schema=SCHEMA)
out = extract_pages(pages)
rows = sorted(
    (
        r.url,
        r.tipo_documento,
        r.proveedor_cif,
        r.numero_factura,
        str(r.fecha_factura),
        r.total_factura,
        r.confianza_global,
        r.requiere_revision,
        r.extracted_text,
    )
    for r in out.collect()
)
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
spark.stop()
import hashlib
digest = hashlib.md5(repr(rows).encode()).hexdigest()
print("RESULT" + json.dumps({"n": len(rows), "executors": execs,
                             "digest": digest}))
"""


def _run_cluster_job() -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _JOB % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    pytest.fail(f"cluster job produced no RESULT line:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def test_extraction_parity_across_real_executors(spark):
    from facturas_spark.pipeline import extract_pages
    from facturas_spark.synth import gen_corpus_slice

    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = gen_corpus_slice(pdf["id"].tolist(), seed=42)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    pages = spark.range(0, 300, 1, 8).mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    local_rows = sorted(
        (
            r.url,
            r.tipo_documento,
            r.proveedor_cif,
            r.numero_factura,
            str(r.fecha_factura),
            r.total_factura,
            r.confianza_global,
            r.requiere_revision,
            r.extracted_text,
        )
        for r in extract_pages(pages).collect()
    )
    import hashlib

    local = {
        "n": len(local_rows),
        "digest": hashlib.md5(repr(local_rows).encode()).hexdigest(),
    }

    cluster = _run_cluster_job()
    # driver + 2 executors register in getExecutorMemoryStatus
    assert cluster["executors"] >= 3, cluster
    assert cluster["n"] == local["n"] == 300
    assert cluster["digest"] == local["digest"]


_CLEAN_JOB = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.appName("cluster-clean-parity")
    .master("local-cluster[2,4,2048]")
    .config("spark.executorEnv.PYTHONPATH", %(repo)r)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
from facturas_spark.analytics.corpus_clean import per_doc_flags

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
flags = per_doc_flags(docs, semantic_tau=0.95)
rows = sorted(
    (r.doc_id, r.s0, r.s1, r.s2, r.s3, r.s5, r.s6, r.sem_drop, r.s7,
     r.n_red, r.tokens, r.pack_id, r.scrubbed)
    for r in flags.collect()
)
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
spark.stop()
import hashlib
digest = hashlib.md5(repr(rows).encode()).hexdigest()
print("RESULT" + json.dumps({"n": len(rows), "executors": execs,
                             "digest": digest}))
"""


def test_clean_chain_parity_across_real_executors(spark):
    """The full clean chain (quality filters, both dedup chains INCLUDING
    the SemDeDup embedding stage, quota, packing) on two real executor
    JVMs: every persisted joint, broadcast, window and the embed
    pandas_udf cross the wire; the per-doc decision frame must be
    byte-identical to the in-process local-mode run."""
    import hashlib

    from facturas_spark.analytics.corpus_clean import per_doc_flags

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    local_rows = sorted(
        (r.doc_id, r.s0, r.s1, r.s2, r.s3, r.s5, r.s6, r.sem_drop, r.s7,
         r.n_red, r.tokens, r.pack_id, r.scrubbed)
        for r in per_doc_flags(docs, semantic_tau=0.95).collect()
    )
    local = {
        "n": len(local_rows),
        "digest": hashlib.md5(repr(local_rows).encode()).hexdigest(),
    }

    proc = subprocess.run(
        [sys.executable, "-c", _CLEAN_JOB % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    cluster = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            cluster = json.loads(line[len("RESULT"):])
    assert cluster is not None, (
        f"cluster clean job produced no RESULT line:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    assert cluster["executors"] >= 3, cluster
    assert cluster["n"] == local["n"] > 0
    assert cluster["digest"] == local["digest"]
