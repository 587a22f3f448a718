"""Real byte-pair-encoding tokenizer with a frozen, deterministically
learned merge table — the budget denominator for corpus packing/chunking
(round-4 directive: upgrade the "BPE-ish" regex splitter to real merges
so packing budgets match what a trainer's tokenizer sees).

Design (public practice: Sennrich et al. 2016 "Neural Machine Translation
of Rare Words with Subword Units"; GPT-2's pre-tokenize-then-merge shape):

- **Training** (`learn_bpe`) runs ONCE at import over the frozen
  `SEED_CORPUS` below: lowercase alphanumeric words, start from
  characters, repeatedly merge the most frequent adjacent symbol pair
  (ties broken lexicographically so the table is bit-stable across
  Python versions/platforms). The learned table is the tokenizer —
  the seed never changes, so the merges are effectively a vendored
  constant that stays readable as code.

- **Encoding is a chain of plain string replacements, fully JVM-side.**
  Applying merges in *creation order*, one global leftmost-first pass
  each, is equivalent to the canonical lowest-rank-first loop: a merge
  can only create pairs involving its OWN new symbol, and every merge
  consuming that symbol was necessarily learned later. So the encoder
  is `replace(replace(... N_MERGES times))` — no UDF, no Python in the
  hot path, and DuckDB can run the *identical* chain, which is what
  makes the oracle twin possible (`merge_chain_sql`).

- **Token-boundary safety without lookarounds**: text is spread into
  `|c |a |t ` marker form (marker before each symbol, space after), so
  the replacement `'|a |b ' -> '|ab '` can never match a symbol TAIL
  (`|st |h ` does not contain `|t |h `) nor a symbol PREFIX (the
  trailing space pins the right edge), and consuming the separator
  still leaves the next symbol's own marker for back-to-back merges
  (`|a |a |a |a ` -> `|aa |aa `). DuckDB's RE2 has no lookbehind, so
  this representation — not regex boundaries — is what keeps the two
  engines bit-identical.

- Non-alphanumeric chars count one token each (the same rule as the
  previous regex estimator); whitespace tokenizes to nothing. Merges
  are alphanumeric-only by construction, so punctuation and whitespace
  act as natural merge barriers after the `[^a-z0-9\\s]` -> space
  cleanup in the word channel.

Reference parity note: the reference repo (supabase/functions TS) has no
tokenizer; this is a beyond-reference LLM-pipeline operator. Budget
consumers: `analytics/dedup.py::corpus_packing`, `corpus_chunking`,
`txt_bpe_token_stats`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Frozen training text: ES invoice prose (the reference's domain) + EN
# web prose — enough shared subwords that merges generalize to both
# channels of the synthetic corpus. NEVER edit casually: the learned
# merge table (and therefore every BPE-denominated budget, chunk
# fingerprint and oracle twin) derives from it.
SEED_CORPUS = """
factura numero fecha total importe base imponible iva cuota tipo cliente
proveedor direccion telefono producto cantidad precio unidad descuento
subtotal pago forma vencimiento albaran pedido referencia codigo articulo
descripcion observaciones gracias por su compra distribuciones alimentacion
restaurante cocina aceite harina tomate queso leche huevos pan carne
pollo ternera pescado arroz azucar cafe vino cerveza agua botella caja
kilo litro unidades entrega reparto almacen the quick brown fox jumps over
the lazy dog a web page about news articles and blog posts with comments
search results for products and services online shopping cart checkout
pages contact information about us privacy policy terms of service the
weather today is sunny with a chance of rain sports scores and match
reports science and technology news the latest research in machine
learning language models are trained on large text corpora extracted
from web crawls after deduplication and quality filtering tokenization
splits text into subword units counted against a training budget
"""

# Whitespace class used by EVERY engine surface. Spelled out because the
# engines disagree on '\\s': Java includes \x0B, RE2 does not, Python adds
# unicode spaces — any of those silently breaks the bit-exact oracle gates
# (round-5 review finding: 'a\x0Bb' tokenized differently per engine).
WS = " \t\n\r\f\x0b"

N_MERGES = 160


def _word_freqs(corpus: str) -> dict:
    freqs: dict = {}
    for w in re.findall(r"[a-z0-9]+", corpus.lower()):
        freqs[w] = freqs.get(w, 0) + 1
    return freqs


def learn_bpe(corpus: str, n_merges: int) -> list:
    """Sennrich BPE training, deterministic: most-frequent adjacent pair
    first, ties to the lexicographically smallest pair. Returns merges
    in creation order as (left, right) string pairs."""
    words = {tuple(w): f for w, f in _word_freqs(corpus).items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_words = {}
        for sym, f in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


MERGES = learn_bpe(SEED_CORPUS, N_MERGES)


def encode_py(text: str) -> list:
    """Pure-Python reference encoder (canonical creation-order merge
    loop over pre-tokenized words) — the property-test oracle for the
    expression chain; NOT a hot path."""
    out = []
    for tok in re.findall("[a-z0-9]+|[^a-z0-9" + WS + "]", text.lower()):
        if not re.fullmatch(r"[a-z0-9]+", tok):
            out.append(tok)
            continue
        sym = list(tok)
        for a, b in MERGES:
            i, new = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        out.extend(sym)
    return out


# --- Spark expression surface ------------------------------------------
#
# SCALE NOTE (round 5): the merge chain costs O(len * N_MERGES) string
# copies. Applied per DOCUMENT that is ~3 ms/doc on the JVM — fine for a
# word, wasteful for a corpus. The corpus-scale consumers therefore
# TOKENIZE THE VOCABULARY, NOT THE CORPUS: explode docs into pre-tokens,
# run the chain over DISTINCT words only (Heaps' law: vocabulary grows
# ~sqrt of corpus), and join the per-word token counts/arrays back. See
# dedup.txt_bpe_token_stats / corpus_packing / corpus_chunking for the
# join shape; `pretokens_expr` below is the shared pre-tokenizer.


def _spread(col: Column) -> Column:
    """Marker-spread form of lowered text: non-alnum -> one token each,
    then every char c becomes '|c ' ('|' is safe — it is cleaned to a
    one-token placeholder char first, see below)."""
    low = F.lower(F.coalesce(col, F.lit("")))
    # every non-alnum, non-space char is ONE token; represent it with a
    # neutral placeholder ('0'-adjacent puncts would otherwise need
    # per-char escapes in the marker alphabet). Token COUNT is what the
    # budget needs; punct identity is not budget-relevant, but adjacency
    # blocking is — so the placeholder must not be alphanumeric. We use
    # '.' (never part of a merge: merges are learned on [a-z0-9] only).
    clean = F.regexp_replace(low, f"[^a-z0-9{WS}]", ".")
    # '.' in the spread regex matches NO newline in Java or RE2 — fold
    # all whitespace to plain spaces first so every char gets a marker
    clean = F.regexp_replace(clean, f"[{WS}]", " ")
    return F.regexp_replace(clean, r"(.)", r"|$1 ")


def pretokens_expr(col: Column) -> Column:
    """Pre-token sequence of a document: lowercase alphanumeric words
    plus one '.' per punctuation char (the same normalization `_spread`
    applies) — the unit the vocabulary join keys on."""
    low = F.lower(F.coalesce(col, F.lit("")))
    clean = F.regexp_replace(low, f"[^a-z0-9{WS}]", ".")
    return F.regexp_extract_all(clean, F.lit(r"([a-z0-9]+|\.)"), 1)


def _ws_sql() -> str:
    """The WS class as RE2 escapes for DuckDB (literal backslash
    sequences — RE2's \\s lacks \\x0B, so the class is spelled out on
    both engines)."""
    return " \\t\\n\\r\\f\\x0b"


def pretokens_sql(expr: str) -> str:
    """DuckDB twin of `pretokens_expr`."""
    low = f"lower(coalesce({expr}, ''))"
    clean = f"regexp_replace({low}, '[^a-z0-9{_ws_sql()}]', '.', 'g')"
    return f"regexp_extract_all({clean}, '([a-z0-9]+|\\.)', 1)"


def encode_expr(col: Column) -> Column:
    """The spread string after the full merge chain — JVM-side only."""
    s = _spread(col)
    for a, b in MERGES:
        s = F.replace(s, F.lit(f"|{a} |{b} "), F.lit(f"|{a}{b} "))
    return s


def token_count_expr(col: Column) -> Column:
    """BPE token count: units of the merged spread that aren't
    whitespace tokens ('|x...' with len > 1 and x non-space)."""
    enc = encode_expr(col)
    units = F.split(enc, " ")
    # after the whitespace fold every unit is '|<symbol>' or the bare
    # '|' of a space token — length > 1 IS the token predicate
    return F.size(F.filter(units, lambda u: F.length(u) > 1)).cast("long")


def tokens_expr(col: Column) -> Column:
    """BPE tokens as an array<string> (marker stripped) — the chunking
    denominator."""
    enc = encode_expr(col)
    units = F.split(enc, " ")
    toks = F.filter(units, lambda u: F.length(u) > 1)
    return F.transform(toks, lambda u: F.substring(u, 2, 1000))


# --- DuckDB twin surface -----------------------------------------------


def spread_sql(expr: str) -> str:
    """DuckDB SQL for `_spread` over the given text expression."""
    low = f"lower(coalesce({expr}, ''))"
    clean = f"regexp_replace({low}, '[^a-z0-9{_ws_sql()}]', '.', 'g')"
    clean = f"regexp_replace({clean}, '[{_ws_sql()}]', ' ', 'g')"
    return f"regexp_replace({clean}, '(.)', '|\\1 ', 'g')"


# DuckDB's binder caps expression nesting at 128, so the 160-replace
# chain cannot be one expression — it is emitted as a chain of CTE
# stages, <= _SQL_BATCH replaces per stage, each rebinding column _s.
_SQL_BATCH = 50


def bpe_ctes_sql(from_clause: str, key_cols: str, expr: str, prefix: str = "bpe") -> str:
    """DuckDB CTE-chain fragment applying the full merge chain.

    Returns comma-separated CTE definitions ``{prefix}0 AS (...), ...``
    where the LAST CTE (named ``bpe_done_name(prefix)``) holds columns
    ``{key_cols}, _s`` with ``_s`` the fully merged spread string::

        WITH {bpe_ctes_sql('documents', 'doc_id', 'text')},
             final AS (SELECT doc_id, {tokens_from_spread_sql()} ...
                       FROM {bpe_done_name()})
    """
    parts = [
        f"{prefix}0 AS (SELECT {key_cols}, {spread_sql(expr)} AS _s"
        f" FROM {from_clause})"
    ]
    batches = [
        MERGES[i : i + _SQL_BATCH] for i in range(0, len(MERGES), _SQL_BATCH)
    ]
    for bi, batch in enumerate(batches):
        t = "_s"
        for a, b in batch:
            t = f"replace({t}, '|{a} |{b} ', '|{a}{b} ')"
        parts.append(
            f"{prefix}{bi + 1} AS (SELECT {key_cols}, {t} AS _s"
            f" FROM {prefix}{bi})"
        )
    return ",\n".join(parts)


def bpe_done_name(prefix: str = "bpe") -> str:
    """Name of the final CTE produced by `bpe_ctes_sql`."""
    n_batches = (len(MERGES) + _SQL_BATCH - 1) // _SQL_BATCH
    return f"{prefix}{n_batches}"


def tokens_from_spread_sql(spread_col: str = "_s") -> str:
    """DuckDB SQL: BPE tokens as VARCHAR[] from a merged spread column."""
    return (
        f"list_transform(list_filter(string_split({spread_col}, ' '), "
        "u -> length(u) > 1), u -> u[2:])"
    )


def token_count_from_spread_sql(spread_col: str = "_s") -> str:
    """DuckDB SQL: BPE token count (BIGINT) from a merged spread column."""
    return f"CAST(len({tokens_from_spread_sql(spread_col)}) AS BIGINT)"
