"""Deterministic synthetic invoice corpus (Common-Crawl-style ``pages`` table).

Generates the input shape from BASELINE.json's input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
plus per-row *expected* extraction values known by construction, so golden
tests can assert the byte-identical invariant without circular logic.

Determinism: every value derives from ``random.Random(f"{seed}:{i}")`` per
document index; no wall clock, no global RNG state. Hosts are drawn from a
Zipf-ish skewed pool (host 0 gets ~35% of pages) to exercise salting/skew
handling at scale.

Field values are chosen so the reference's selection rules are unambiguous
(see textparse.py):
- amounts: base in [100, 799] with 2 decimals -> cuota >= tipo for every
  tipo in {4,10,21}, so max-selection picks the labeled cuota, not the rate
  token; total < 1000 so no thousands separator corrupts the amount regex.
- invoice number: bare digits, shortest candidate.
- one CIF per document; supplier name on the line above the CIF line.
- date within the [as_of-10y, as_of+2y] sanity window.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone

from facturas_spark.extraction.textparse import js_round2

__all__ = ["SynthDoc", "gen_corpus", "corpus_rows", "PAGES_SCHEMA_DDL"]

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_SUPPLIERS = [
    ("DISTRIBUCIONES GARRIDO S.L.", "B"),
    ("CARNICAS DEL SUR S.A.", "A"),
    ("PESCADOS MARISOL S.L.U.", "B"),
    ("FRUTAS HERMANOS LOPEZ S.C.", "J"),
    ("LACTEOS LA VEGA S.L.", "B"),
    ("BODEGAS TORREALTA S.A.", "A"),
    ("PANADERIA EL MOLINO S.L.", "B"),
    ("AVICOLA SANTA MARTA S.L.", "B"),
    ("CONSERVAS EL FARO S.A.", "A"),
    ("ACEITES OLIVAR ALTO S.L.", "B"),
]

_PRODUCTS = [
    ("Pollo entero fresco", "kg"),
    ("Lomo de cerdo", "kg"),
    ("Merluza del norte", "kg"),
    ("Tomate pera", "kg"),
    ("Queso curado oveja", "kg"),
    ("Vino tinto crianza", "botella"),
    ("Pan de pueblo", "uds"),
    ("Huevos camperos", "docena"),
    ("Aceite oliva virgen extra", "l"),
    ("Gambas cocidas", "kg"),
]

_CITIES = ["SEVILLA", "HUELVA", "GRANADA", "MALAGA", "CORDOBA", "JEREZ"]
_STREETS = ["Mayor", "Real", "Ancha", "Nueva", "Larga", "Feria"]

_NAV_WORDS = ["inicio", "productos", "contacto", "ofertas", "clientes", "zona privada"]

_HOSTS = [f"proveedor{i}.example.es" for i in range(20)]
# Zipf-ish host weights: host k gets weight 1/(k+1); host 0 dominates.
_HOST_WEIGHTS = [1.0 / (k + 1) for k in range(len(_HOSTS))]
_HOST_CUM = []
_acc = 0.0
for _w in _HOST_WEIGHTS:
    _acc += _w
    _HOST_CUM.append(_acc)


def _pick_host(rng: random.Random) -> str:
    r = rng.random() * _HOST_CUM[-1]
    for host, c in zip(_HOSTS, _HOST_CUM):
        if r <= c:
            return host
    return _HOSTS[-1]


def _fmt_es(x: float) -> str:
    """Spanish 2-decimal format: 52.3 -> '52,30' (no thousands separator)."""
    return f"{x:.2f}".replace(".", ",")


@dataclass
class SynthDoc:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str
    doc_type: str  # 'factura' | 'albaran'
    # expected extraction (byte-identical golden values)
    exp_proveedor: str
    exp_cif: str
    exp_numero: str
    exp_fecha: date | None
    exp_base: float
    exp_cuota: float
    exp_total: float
    exp_tipo: int
    n_products: int


def _render_factura(rng: random.Random, doc_id: int) -> tuple[str, dict]:
    name, cif_letter = _SUPPLIERS[rng.randrange(len(_SUPPLIERS))]
    cif = f"{cif_letter}{rng.randrange(10_000_000, 99_999_999)}"
    numero = str(rng.randrange(100, 99_999))
    d = date(2024, 1, 1) + timedelta(days=rng.randrange(0, 700))
    tipo = rng.choice([4, 10, 21])
    base = js_round2(rng.uniform(100.0, 799.0))
    cuota = js_round2(base * tipo / 100.0)
    total = js_round2(base + cuota)

    n_prod = rng.randrange(2, 6)
    prod_lines = []
    for k in range(n_prod):
        pname, unit = _PRODUCTS[rng.randrange(len(_PRODUCTS))]
        qty = js_round2(rng.uniform(1.0, 9.0))
        price = js_round2(rng.uniform(2.0, 40.0))
        prod_lines.append(
            f"{pname} {_fmt_es(qty)} {unit} x {_fmt_es(price)} EUR"
        )

    street = _STREETS[rng.randrange(len(_STREETS))]
    city = _CITIES[rng.randrange(len(_CITIES))]
    lines = [
        name,
        f"CIF: {cif}",
        f"C/ {street}, {rng.randrange(1, 99)}",
        f"{rng.randrange(10000, 52999)} {city}",
        "Nº FACTURA",
        numero,
        "FECHA",
        f"{d.day:02d}/{d.month:02d}/{d.year}",
        "CONCEPTOS",
        *prod_lines,
        # IVA line deliberately precedes BASE: the reference's value-before-
        # label pattern `(amt)\s*€?\s*IVA` would otherwise capture the BASE
        # amount (> cuota) across the newline and max-selection would pick it.
        # With this order all candidate-selection rules resolve to the labeled
        # values (cuota >= tipo holds because base >= 100).
        f"IVA {tipo}%: {_fmt_es(cuota)}€",
        f"BASE IMPONIBLE: {_fmt_es(base)}€",
        f"TOTAL: {_fmt_es(total)}€",
        "Forma de pago: transferencia",
    ]
    text = "\n".join(lines)
    exp = {
        "exp_proveedor": name,
        "exp_cif": cif,
        "exp_numero": numero,
        "exp_fecha": d,
        "exp_base": base,
        "exp_cuota": cuota,
        "exp_total": total,
        "exp_tipo": tipo,
        "n_products": n_prod,
        "doc_type": "factura",
    }
    return text, exp


def _render_albaran(rng: random.Random, doc_id: int) -> tuple[str, dict]:
    name, cif_letter = _SUPPLIERS[rng.randrange(len(_SUPPLIERS))]
    cif = f"{cif_letter}{rng.randrange(10_000_000, 99_999_999)}"
    numero = str(rng.randrange(100, 99_999))
    d = date(2024, 1, 1) + timedelta(days=rng.randrange(0, 700))
    n_prod = rng.randrange(1, 4)
    prod_lines = []
    for k in range(n_prod):
        pname, unit = _PRODUCTS[rng.randrange(len(_PRODUCTS))]
        qty = js_round2(rng.uniform(1.0, 9.0))
        prod_lines.append(f"{pname} {_fmt_es(qty)} {unit}")
    lines = [
        name,
        f"CIF: {cif}",
        "ALBARAN DE ENTREGA",
        f"Nº {numero}",
        "FECHA",
        f"{d.day:02d}/{d.month:02d}/{d.year}",
        *prod_lines,
        "Recibido conforme",
        "Transportista: J. Perez",
    ]
    text = "\n".join(lines)
    exp = {
        "exp_proveedor": name,
        "exp_cif": cif,
        "exp_numero": numero,
        "exp_fecha": d,
        "exp_base": 0.0,
        "exp_cuota": 0.0,
        "exp_total": 0.0,
        "exp_tipo": 21,
        "n_products": n_prod,
        "doc_type": "albaran",
    }
    return text, exp


def _wrap_html(rng: random.Random, text: str) -> bytes:
    """Wrap content lines in <p> blocks, surrounded by link-dense nav/footer
    boilerplate that :func:`extract_main_text` must drop. The invariant
    ``extract_main_text(html) == text`` holds by construction: every content
    line becomes exactly one kept block; nav blocks are pure links
    (link_density 1.0 > 0.5) with no value shapes."""
    nav = " ".join(
        f'<a href="/{w.replace(" ", "-")}">{w}</a>' for w in _NAV_WORDS
    )
    body_parts = [f"<div>{nav}</div>"]
    for line in text.split("\n"):
        body_parts.append(f"<p>{line}</p>")
    body_parts.append(f"<div>{nav}</div>")
    html = (
        "<html><head><title>doc</title>"
        "<style>p{margin:0}</style>"
        "<script>var x=1;</script></head><body>"
        + "".join(body_parts)
        + "</body></html>"
    )
    return html.encode("utf-8")


def gen_corpus(n_docs: int, seed: int = 42, albaran_ratio: float = 0.25,
               html_ratio: float = 0.5) -> list[SynthDoc]:
    """Generate ``n_docs`` deterministic documents.

    ``html_ratio`` of docs carry the payload only in ``html`` (text column
    None -> engine must run the boilerplate strip); the rest carry pre-
    extracted ``text`` (html still present). ``albaran_ratio`` of docs are
    delivery notes (no fiscal amounts)."""
    return [gen_one(i, seed, albaran_ratio, html_ratio) for i in range(n_docs)]


def gen_one(i: int, seed: int = 42, albaran_ratio: float = 0.25,
            html_ratio: float = 0.5) -> SynthDoc:
    """Generate document ``i`` independently (per-doc RNG keyed by index) —
    executor-side generation slices the corpus without coordination."""
    rng = random.Random(f"{seed}:{i}")
    is_albaran = rng.random() < albaran_ratio
    text, exp = (_render_albaran if is_albaran else _render_factura)(rng, i)
    host = _pick_host(rng)
    url = f"https://{host}/doc/{seed}/{i}.html"
    warc_ts = datetime(2025, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=i * 137 % 31_536_000
    )
    html = _wrap_html(rng, text)
    text_col = None if rng.random() < html_ratio else text
    lang = "es" if rng.random() < 0.9 else "en"
    return SynthDoc(url=url, warc_ts=warc_ts, html=html, text=text_col, lang=lang, **exp)


def gen_corpus_slice(ids, seed: int = 42, **kw) -> list[tuple]:
    """Input-table rows for an arbitrary id slice (executor-side generation)."""
    out = []
    for i in ids:
        d = gen_one(int(i), seed, **kw)
        out.append((d.url, d.warc_ts, d.html, d.text, d.lang))
    return out


def synth_ocr_doc(i: int, seed: int = 42) -> dict:
    """One deterministic Document-AI-style ocr_doc (FIXTURES.md §3 shape).

    Lays words on a row grid: token spans index into the flat text
    (byte-identical invariant), boxes on a 1681x2379 page (the reference
    fixture's dims), one line/block per row, one products table. Includes
    the edge cases FIXTURES.md names: an out-of-bounds trailing segment
    (must be dropped by T1) and jittered y coords (y-clustering must still
    rebuild rows).
    """
    rng = random.Random(f"ocr:{seed}:{i}")
    width, height = 1681.0, 2379.0
    row_h = 40.0
    supplier, cif_letter = _SUPPLIERS[rng.randrange(len(_SUPPLIERS))]
    cif = f"{cif_letter}{rng.randrange(10_000_000, 99_999_999)}"
    numero = str(rng.randrange(100, 99_999))
    d = date(2024, 1, 1) + timedelta(days=rng.randrange(0, 700))

    rows_words: list[list[str]] = [
        supplier.split(" "),
        ["CIF:", cif],
        ["FACTURA", "Nº", numero],
        ["FECHA", f"{d.day:02d}/{d.month:02d}/{d.year}"],
        ["CODIGO", "DESCRIPCION", "CANTIDAD", "PRECIO"],
    ]
    n_prods = rng.randrange(2, 5)
    prod_rows = []
    for k in range(n_prods):
        pname, _unit = _PRODUCTS[rng.randrange(len(_PRODUCTS))]
        code = f"P{rng.randrange(1000, 9999)}"
        qty = f"{rng.randrange(1, 9)},{rng.randrange(10, 99)}"
        price = f"{rng.randrange(2, 80)},{rng.randrange(10, 99)}"
        prod_rows.append((code, pname, qty, price))
        rows_words.append([code, *pname.split(" "), qty, price])

    # flat text + token offsets
    text_parts: list[str] = []
    tokens = []
    lines = []
    blocks = []
    table_cells: dict[tuple[int, int], tuple[int, int]] = {}  # (row, col)->span
    pos = 0
    for r, words in enumerate(rows_words):
        row_start = pos
        x = 60.0
        y = 80.0 + r * row_h + rng.uniform(-3.0, 3.0)  # jitter for clustering
        col_idx = 0
        word_spans = []
        for w_i, w in enumerate(words):
            start = pos
            text_parts.append(w)
            pos += len(w)
            end = pos
            text_parts.append(" " if w_i < len(words) - 1 else "\n")
            pos += 1
            tokens.append(
                {
                    "start": start, "end": end,
                    "x": x, "y": y, "w": 9.0 * len(w), "h": 28.0,
                    "conf": 0.97,
                }
            )
            word_spans.append((start, end))
            x += 9.0 * len(w) + 14.0
        lines.append(
            {"start": row_start, "end": pos - 1, "x": 60.0, "y": y, "w": x - 60.0,
             "h": 28.0, "conf": 0.96}
        )
        if r >= 4:  # header + product rows form the table grid
            if r == 4:
                for c, span in enumerate(word_spans):
                    table_cells[(0, c)] = span
            else:
                # product rows: code, name words..., qty, price -> 4 cells
                code_span = word_spans[0]
                name_span = (word_spans[1][0], word_spans[-3][1])
                qty_span = word_spans[-2]
                price_span = word_spans[-1]
                for c, span in enumerate((code_span, name_span, qty_span, price_span)):
                    table_cells[(r - 4, c)] = span
    blocks.append({"start": 0, "end": pos - 1, "x": 50.0, "y": 70.0,
                   "w": width - 100.0, "h": row_h * len(rows_words), "conf": 0.9})
    # paragraphs: consecutive line pairs (Document AI paragraphs sit
    # between lines and blocks in the layout hierarchy; the walk assigns
    # them the 0.75 prior — index.ts:1128)
    paragraphs = []
    for r0 in range(0, len(lines), 2):
        pair = lines[r0 : r0 + 2]
        paragraphs.append(
            {
                "start": pair[0]["start"], "end": pair[-1]["end"],
                "x": 60.0, "y": pair[0]["y"],
                "w": max(ln["w"] for ln in pair),
                "h": sum(ln["h"] for ln in pair),
                "conf": 0.95,
            }
        )
    text = "".join(text_parts)

    header_cells = [
        {"start": table_cells[(0, c)][0], "end": table_cells[(0, c)][1]}
        for c in range(4)
    ]
    body_rows = [
        [
            {"start": table_cells[(r, c)][0], "end": table_cells[(r, c)][1]}
            for c in range(4)
        ]
        for r in range(1, n_prods + 1)
    ]
    # edge case: an out-of-bounds token T1 must drop
    tokens.append({"start": 10, "end": len(text) + 50, "x": 0.0, "y": 0.0,
                   "w": 1.0, "h": 1.0, "conf": 0.1})

    page = {
        "page_no": 1, "width": width, "height": height,
        "tokens": tokens, "lines": lines, "blocks": blocks,
        "paragraphs": paragraphs,
        "tables": [{"header_cells": header_cells, "body_rows": body_rows}],
    }
    return {
        "url": f"https://ocr.example.es/doc/{seed}/{i}",
        "text": text,
        "pages": [page],
        # golden expectations
        "exp_rows": [" ".join(w) for w in rows_words],
        "exp_products": [
            {"codigo": c, "descripcion": n, "cantidad": q, "precio": p}
            for c, n, q, p in prod_rows
        ],
        "exp_cif": cif,
        "exp_numero": numero,
        "exp_fecha": d,
    }


def ocr_rows(n_docs: int, seed: int = 42) -> list[tuple]:
    """Input rows for spark.createDataFrame(rows, OCR_DOC_DDL)."""
    out = []
    for i in range(n_docs):
        doc = synth_ocr_doc(i, seed)
        pages = [
            (
                p["page_no"], p["width"], p["height"],
                [tuple(t[k] for k in ("start", "end", "x", "y", "w", "h", "conf")) for t in p["tokens"]],
                [tuple(t[k] for k in ("start", "end", "x", "y", "w", "h", "conf")) for t in p["lines"]],
                [tuple(t[k] for k in ("start", "end", "x", "y", "w", "h", "conf")) for t in p["blocks"]],
                [tuple(t[k] for k in ("start", "end", "x", "y", "w", "h", "conf")) for t in p["paragraphs"]],
                [
                    (
                        [(c["start"], c["end"]) for c in tb["header_cells"]],
                        [[(c["start"], c["end"]) for c in row] for row in tb["body_rows"]],
                    )
                    for tb in p["tables"]
                ],
            )
            for p in doc["pages"]
        ]
        out.append((doc["url"], doc["text"], pages))
    return out


def corpus_rows(n_docs: int, seed: int = 42, **kw) -> list[tuple]:
    """Rows for ``spark.createDataFrame(rows, PAGES_SCHEMA_DDL)`` (input
    columns only, no golden columns)."""
    return [
        (d.url, d.warc_ts, d.html, d.text, d.lang)
        for d in gen_corpus(n_docs, seed, **kw)
    ]
