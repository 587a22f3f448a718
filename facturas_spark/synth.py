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


def corpus_rows(n_docs: int, seed: int = 42, **kw) -> list[tuple]:
    """Rows for ``spark.createDataFrame(rows, PAGES_SCHEMA_DDL)`` (input
    columns only, no golden columns)."""
    return [
        (d.url, d.warc_ts, d.html, d.text, d.lang)
        for d in gen_corpus(n_docs, seed, **kw)
    ]
