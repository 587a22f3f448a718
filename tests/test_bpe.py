"""Real-BPE tokenizer (extraction/bpe.py): learning determinism, the
replace-chain == canonical-merge-loop equivalence (the property that
makes the JVM-side encoder and the DuckDB twin legal), and three-way
Spark / Python / DuckDB parity on hostile text."""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from facturas_spark.extraction import bpe


def _norm_py(text):
    """encode_py keeps punct identity; the expression maps every punct
    char to the '.' placeholder (count-preserving)."""
    return [
        w if re.fullmatch(r"[a-z0-9]+", w) else "."
        for w in bpe.encode_py(text or "")
    ]


def test_learning_is_deterministic_and_real():
    m1 = bpe.learn_bpe(bpe.SEED_CORPUS, bpe.N_MERGES)
    m2 = bpe.learn_bpe(bpe.SEED_CORPUS, bpe.N_MERGES)
    assert m1 == m2 == bpe.MERGES
    assert len(bpe.MERGES) == bpe.N_MERGES
    # multi-char merges exist (real subwords, not a char vocab) and
    # every merge consumes only previously-available symbols
    assert any(len(a + b) > 3 for a, b in bpe.MERGES)
    available = {chr(c) for c in range(ord("a"), ord("z") + 1)} | set(
        "0123456789"
    )
    for a, b in bpe.MERGES:
        assert a in available and b in available, (a, b)
        available.add(a + b)


def test_creation_order_replace_equals_canonical_loop():
    """The load-bearing equivalence: applying merges in creation order,
    one global leftmost pass each (what the replace chain does), equals
    the canonical lowest-rank-first priority loop per word."""

    def canonical(word):
        ranks = {p: i for i, p in enumerate(bpe.MERGES)}
        sym = list(word)
        while len(sym) > 1:
            pairs = [(ranks.get((sym[i], sym[i + 1]), 1 << 30), i) for i in range(len(sym) - 1)]
            best_rank = min(p[0] for p in pairs)
            if best_rank == 1 << 30:
                break
            a, b = bpe.MERGES[best_rank]
            i, new = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        return sym

    for w in [
        "factura", "informacion", "aaaa", "the", "thethethe", "x",
        "deduplication", "tokenization", "restaurante", "0123456789",
        "mississippi", "zzzzzz", "arttear", "terter",
    ]:
        assert canonical(w) == bpe.encode_py(w), w


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ", max_size=40))
def test_property_creation_order_equivalence(text):
    ranks = {p: i for i, p in enumerate(bpe.MERGES)}

    def canonical(word):
        sym = list(word)
        while len(sym) > 1:
            cand = [(ranks[(sym[i], sym[i + 1])], i) for i in range(len(sym) - 1) if (sym[i], sym[i + 1]) in ranks]
            if not cand:
                break
            a, b = bpe.MERGES[min(c[0] for c in cand)]
            i, new = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        return sym

    want = []
    for w in re.findall(r"[a-z0-9]+", text):
        want.extend(canonical(w))
    assert want == bpe.encode_py(text)


HOSTILE = [
    "factura total importe 123,45 the quick brown foxes",
    "aaaa aaaaaa information informacion",
    "don't stop; URLs: https://a.com/x?q=1",
    "",
    None,
    "  \t\nmixed   whitespace\n\nlines  ",
    "ñoño €uro daño |pipes| and . dots .. here",
    "the the the thethethe",
    "| | || |a b| marker '|' in the input itself",
    "a" * 300,
    # engine whitespace-class edges: \x0B is \s to Java but not RE2;
    # \xa0 is \s to Python-unicode but to neither engine (round-5
    # review finding — the explicit WS class pins all three)
    "a\x0bb c\xa0d e\x0c f\rg",
]


def test_three_way_parity_spark_python_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE)], "i int, text string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            bpe.token_count_expr(F.col("text")).alias("n"),
            bpe.tokens_expr(F.col("text")).alias("toks"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(HOSTILE)))
    sql = (
        "WITH " + bpe.bpe_ctes_sql("t", "i", "text")
        + f" SELECT i, {bpe.token_count_from_spread_sql()} AS n,"
        + f" {bpe.tokens_from_spread_sql()} AS toks"
        + f" FROM {bpe.bpe_done_name()} ORDER BY i"
    )
    duck = {r[0]: r for r in con.execute(sql).fetchall()}

    for i, t in enumerate(HOSTILE):
        py = _norm_py(t)
        assert got[i]["n"] == len(py) == duck[i][1], (t, got[i]["n"], len(py))
        assert got[i]["toks"] == py == duck[i][2], t


def test_expression_is_jvm_only(spark):
    """No Python UDF / no BatchEvalPython in the token-count plan."""
    df = spark.createDataFrame([("hola factura",)], "text string")
    plan = (
        df.select(bpe.token_count_expr(F.col("text")).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_counts_compress_vs_chars():
    """Sanity: on seed-domain text, BPE emits far fewer tokens than
    chars (the merges actually fire)."""
    s = "factura numero fecha total importe base imponible iva cliente"
    toks = bpe.encode_py(s)
    n_chars = len(s.replace(" ", ""))
    assert len(toks) < n_chars * 0.65, (len(toks), n_chars)


def test_seq_counts_equal_vocab_join_counts(spark):
    """_bpe_counts_from_seq (size of the cached token sequence) must be
    row-identical to _bpe_doc_token_counts (the vocabulary-join sum) —
    the equality the round-7 shared tokenized-corpus cache rests on,
    including 0 for docs with no pre-tokens."""
    from pyspark.sql import functions as F

    from facturas_spark.analytics import dedup as D

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    via_join = {
        r["doc_id"]: r["tokens"]
        for r in D._bpe_doc_token_counts(
            docs, vocab=D._bpe_vocab(spark, sf)
        ).collect()
    }
    via_seq = {
        r["doc_id"]: r["tokens"]
        for r in D._bpe_counts_from_seq(
            docs, D._bpe_token_seq(spark, sf)
        ).collect()
    }
    assert via_join == via_seq
    assert len(via_seq) == docs.count()
