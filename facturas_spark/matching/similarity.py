"""Fuzzy string-similarity operators (SURVEY §2.5 M3-M6).

Pure-Python reference-exact kernels (for in-UDF use and tests) plus Spark
column-expression builders that keep the same semantics JVM-side (higher-
order array functions — no Python in the hot path).

Reference (studied, not copied):
- levenshteinDistance        process-invoice/index.ts:2564-2595 (M3)
- calculateStringSimilarity  process-invoice/index.ts:2526-2561 (M4)
- compararProductos          cotejo-inteligente/index.ts:580-607 (M5)
- cosineSimilarity           ask-my-invoices/index.ts:653-684 (M6)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "levenshtein_py",
    "string_similarity_py",
    "comparar_productos_py",
    "cosine_py",
    "norm_desc_expr",
    "comparar_productos_expr",
    "product_overlap_ratio_expr",
]


def levenshtein_py(a: str, b: str) -> int:
    """Classic DP edit distance (M3). Spark-side use the built-in
    ``F.levenshtein``; this exists for the M4 kernel + tests."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        bc = b[i - 1]
        for j in range(1, n + 1):
            cost = 0 if bc == a[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost, cur[j - 1] + 1, prev[j] + 1)
        prev = cur
    return prev[n]


def string_similarity_py(s1: str, s2: str) -> float:
    """Word-set similarity (M4), exact reference rule order per word1:
    exact=1; containment (both len>3)=0.8; |Δlen|<=2 and (containment or
    lev<=2)=0.6; first matching rule breaks. Score = matches/max(|w1|,|w2|)
    over words of length>2."""
    words1 = [w for w in s1.split(" ") if len(w) > 2]
    words2 = [w for w in s2.split(" ") if len(w) > 2]
    if not words1 or not words2:
        return 0.0
    matches = 0.0
    total = max(len(words1), len(words2))
    for w1 in words1:
        for w2 in words2:
            if w1 == w2:
                matches += 1
                break
            if len(w1) > 3 and len(w2) > 3 and (w2 in w1 or w1 in w2):
                matches += 0.8
                break
            if abs(len(w1) - len(w2)) <= 2:
                longer, shorter = (w1, w2) if len(w1) > len(w2) else (w2, w1)
                if shorter in longer or levenshtein_py(w1, w2) <= 2:
                    matches += 0.6
                    break
    return matches / total


def _norm_py(s: str) -> str:
    import re

    s = s.lower()
    s = re.sub(r"[^a-z0-9\s]", " ", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def comparar_productos_py(desc1: str, desc2: str) -> bool:
    """M5: normalized exact match, else >60% of desc1's words (len>2)
    present in desc2's word set. Denominator counts ALL desc1 words
    (including short ones) — reference behavior."""
    d1, d2 = _norm_py(desc1), _norm_py(desc2)
    if d1 == d2:
        return True
    w1 = d1.split(" ")
    w2 = set(d2.split(" "))
    comunes = sum(1 for w in w1 if len(w) > 2 and w in w2)
    return comunes / len(w1) > 0.6


def cosine_py(a, b) -> float:
    """M6: dot/(||a||*||b||), clamped at 0 (reference clamps negatives)."""
    import math

    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na == 0 or nb == 0:
        return 0.0
    return max(0.0, dot / (na * nb))


# --- Spark column-expression builders (JVM-side, whole-stage codegen) --------

def norm_desc_expr(col: Column) -> Column:
    """M5 normalization as a column: lower, non-alnum -> space, collapse."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def comparar_productos_expr(a: Column, b: Column) -> Column:
    """M5 as a boolean column over two raw description columns."""
    na, nb = norm_desc_expr(a), norm_desc_expr(b)
    w1 = F.split(na, " ")
    w2 = F.split(nb, " ")
    comunes = F.size(
        F.filter(w1, lambda w: (F.length(w) > 2) & F.array_contains(w2, w))
    )
    return (na == nb) | (comunes / F.size(w1) > 0.6)


def product_overlap_ratio_expr(f_prods: Column, a_prods: Column) -> Column:
    """Fraction of invoice products matching some delivery-note product via
    M5 (cotejo-inteligente/index.ts:1523-1545). Pure higher-order functions —
    runs JVM-side inside the join stage, no UDF."""

    def _match(fp: Column, ap: Column) -> Column:
        nf, na_ = norm_desc_expr(fp), norm_desc_expr(ap)
        w1 = F.split(nf, " ")
        w2 = F.split(na_, " ")
        comunes = F.size(
            F.filter(w1, lambda w: (F.length(w) > 2) & F.array_contains(w2, w))
        )
        return (nf == na_) | (comunes / F.size(w1) > 0.6)

    coincidencias = F.size(
        F.filter(f_prods, lambda fp: F.exists(a_prods, lambda ap: _match(fp, ap)))
    )
    return coincidencias / F.size(f_prods)
