"""Deterministic pure-Python parser core (the byte-identical invariant layer).

Reimplements the reference's deterministic text extractors with the *same
observable semantics* (branch-for-branch) so that per-document outputs are
byte-identical. Reference citations (read-only study, no code copied):

- ``parseImporte``           /root/reference/supabase/functions/process-invoice/index.ts:1380-1432
- ``parseSpanishAmount``     process-invoice/index.ts:1812-1847 (strict variant:
                             a lone comma is ALWAYS decimal, even "1,234" -> 1.234)
- ``convertToISODate``       process-invoice/index.ts:1435-1475
- ``parseSpanishDate``       process-invoice/index.ts:2863-2919 (2-digit year
                             always +2000, round-trip validity check)
- ``extractDataFromTextFallback`` patterns + selection
                             process-invoice/index.ts:1208-1733
- supplier cascade           process-invoice/index.ts:1482-1592

Everything here is stdlib-only, deterministic (no wall clock: the reference's
``new Date()`` fallbacks are replaced by a fixed ``as_of`` reference date and a
``None`` sentinel), and designed to be called on batches inside Arrow pandas
UDFs (precompiled module-level regexes; no I/O).

JS-semantics shims:
- ``_js_parse_float`` mirrors ``parseFloat`` (longest valid numeric prefix).
- ``js_round2``       mirrors ``Math.round(x*100)/100`` (half away from zero
                      for positives, in float64 — NOT banker's rounding).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from datetime import date

__all__ = [
    "js_round2",
    "parse_importe",
    "parse_spanish_amount",
    "convert_to_iso_date",
    "parse_spanish_date",
    "extract_fields",
    "classify_document",
    "ExtractedFields",
    "AS_OF_DEFAULT",
]

# Fixed "today" so the reference's wall-clock date-range sanity check
# [now-10y, now+2y] is deterministic. Overridable per call.
AS_OF_DEFAULT = date(2026, 1, 1)

# Sentinel the reference fills with `new Date().toISOString()`; we must stay
# deterministic, so unparseable/absent dates become None.
_FLOAT_PREFIX = re.compile(r"^[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def _js_parse_float(s: str) -> float:
    """JS ``parseFloat``: longest numeric prefix, NaN if none."""
    m = _FLOAT_PREFIX.match(s.strip())
    if not m:
        return math.nan
    return float(m.group(0))


def js_round2(x: float) -> float:
    """JS ``Math.round(x * 100) / 100`` in float64.

    Math.round = floor(x + 0.5) — half away from zero for positive values
    (all reference amounts are >= 0 when this is applied).
    """
    if math.isnan(x):
        return x
    return math.floor(x * 100.0 + 0.5) / 100.0


_CURRENCY_WS = re.compile(r"[€$£¥\s]")
_CURRENCY_ONLY = re.compile(r"[€$£¥]")
_WS_ONLY = re.compile(r"\s")


def parse_importe(importe_str: str | None) -> float:
    """Fallback-variant amount parser (process-invoice/index.ts:1380-1432).

    Disambiguates '.' vs ',' by last-separator position; a lone separator is
    decimal iff exactly 2 parts and <=2 trailing digits, else thousands.
    Returns 0.0 for empty/unparseable. Rounds half-up to 2dp.
    """
    if not importe_str:
        return 0.0
    clean = _CURRENCY_WS.sub("", importe_str.strip())
    if "." in clean and "," in clean:
        if clean.rfind(",") > clean.rfind("."):
            clean = clean.replace(".", "").replace(",", ".", 1)
        else:
            clean = clean.replace(",", "")
    elif "," in clean:
        parts = clean.split(",")
        if len(parts) == 2 and len(parts[1]) <= 2:
            clean = clean.replace(",", ".", 1)
        else:
            clean = clean.replace(",", "")
    elif "." in clean:
        parts = clean.split(".")
        if len(parts) == 2 and len(parts[1]) <= 2:
            pass  # decimal already
        else:
            clean = clean.replace(".", "")
    result = _js_parse_float(clean)
    if math.isnan(result):
        return 0.0
    return js_round2(result)


def parse_spanish_amount(amount_str: str | None) -> float | None:
    """Strict-variant amount parser (process-invoice/index.ts:1812-1847).

    Differs from :func:`parse_importe`: a lone comma is ALWAYS decimal
    ("1,234" -> 1.234), no rounding, negative -> None, unparseable -> None.
    """
    if not amount_str:
        return None
    clean = _CURRENCY_ONLY.sub("", str(amount_str).strip())
    clean = _WS_ONLY.sub("", clean)
    if "," in clean and "." in clean:
        clean = clean.replace(".", "").replace(",", ".", 1)
    elif "," in clean:
        clean = clean.replace(",", ".", 1)
    amount = _js_parse_float(clean)
    if math.isnan(amount) or amount < 0:
        return None
    return amount


_DMY = re.compile(r"^\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4}$")
_YMD = re.compile(r"^\d{4}[\/\-\.]\d{1,2}[\/\-\.]\d{1,2}$")
_SEP = re.compile(r"[\/\-\.]")
_LONG_ES = re.compile(r"(\d{1,2})\s+de\s+(\w+)\s+de\s+(\d{4})")
_MESES = {
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5, "junio": 6,
    "julio": 7, "agosto": 8, "septiembre": 9, "octubre": 10, "noviembre": 11,
    "diciembre": 12,
}


def _mk_date(year: int, month: int, day: int) -> date | None:
    """JS ``new Date(y, m-1, d)`` normalizes overflow (month 13 -> next year,
    day 32 -> next month). Reproduce that normalization."""
    y = year + (month - 1) // 12
    m = (month - 1) % 12 + 1
    try:
        base = date(y, m, 1)
    except ValueError:
        return None
    return date.fromordinal(base.toordinal() + (day - 1))


def convert_to_iso_date(date_str: str | None) -> date | None:
    """``convertToISODate`` (process-invoice/index.ts:1435-1475) minus the
    non-deterministic ``new Date()`` fallback (-> None sentinel).

    2-digit years: <50 -> 20xx, else 19xx (index.ts:1444).
    """
    if not date_str:
        return None
    clean = date_str.strip()
    if _DMY.match(clean):
        day_s, month_s, year_s = _SEP.split(clean)
        if len(year_s) == 2:
            year = 2000 + int(year_s) if int(year_s) < 50 else 1900 + int(year_s)
        else:
            year = int(year_s)
        return _mk_date(year, int(month_s), int(day_s))
    if _YMD.match(clean):
        year_s, month_s, day_s = _SEP.split(clean)
        return _mk_date(int(year_s), int(month_s), int(day_s))
    if "de" in clean:
        m = _LONG_ES.search(clean)
        if m:
            month = _MESES.get(m.group(2).lower())
            if month is not None:
                return _mk_date(int(m.group(3)), month, int(m.group(1)))
    return None


_SPANISH_DATE_PATTERNS = [
    re.compile(r"^(\d{1,2})\/(\d{1,2})\/(\d{2,4})$"),
    re.compile(r"^(\d{1,2})-(\d{1,2})-(\d{2,4})$"),
    re.compile(r"^(\d{1,2})\.(\d{1,2})\.(\d{2,4})$"),
]


def parse_spanish_date(date_str: str | None) -> date | None:
    """``parseSpanishDate`` (process-invoice/index.ts:2863-2919): 2-digit year
    always +2000; validity via round-trip (no JS date normalization accepted);
    native-Date fallback excised (non-deterministic/locale-dependent)."""
    if not date_str:
        return None
    clean = str(date_str).strip()
    for pat in _SPANISH_DATE_PATTERNS:
        m = pat.match(clean)
        if m:
            day, month, year = int(m.group(1)), int(m.group(2)), int(m.group(3))
            if year < 100:
                year += 2000
            if 1 <= day <= 31 and 1 <= month <= 12:
                d = _mk_date(year, month, day)
                if d is not None and (d.year, d.month, d.day) == (year, month, day):
                    return d
    return None


# --- Field-extraction pattern bank (process-invoice/index.ts:1229-1325) ----
# Each entry mirrors one JS RegExp; group(1) is what extractWithPatterns keeps.
_I = re.IGNORECASE

_PAT_CIF = [
    re.compile(r"\b([A-Z]\-\d{8}\d{1,2})\b", _I),
    re.compile(r"\b([A-Z]\d{8}[A-Z0-9]?)\b", _I),
    re.compile(r"(?:CIF|C\.I\.F\.)\s*[:\s]*([A-Z][\-\d]{8,10})", _I),
    # 3-alternative pattern: JS keeps m[1] only, so alts 2/3 contribute nothing
    re.compile(
        r"\b([A-Z]\d{8}[A-Z0-9]?)\b"
        r"|\b(?:[A-Z][\s\-]?\d{2}[\.\s]?\d{3}[\.\s]?\d{3}[\s\-]?[A-Z0-9])\b"
        r"|\b(?:\d{8}[A-Z])\b",
        _I,
    ),
]

_PAT_NUMERO = [
    re.compile(r"(?:Nº?\s*FACTURA|N[ÚU]MERO?\s*FACTURA)\s*\n?(\d+)", _I),
    re.compile(r"(?:FACTURA|factura|Factura)\s*\n?(\d+)", _I),
    re.compile(r"(?:Nº|NUMERO?|num|NUM)\s*\n?(\d+)", _I),
    re.compile(r"(?:f\.?n\.?|F\.?N\.?)\s*[:\s]*(\d+)", _I),
    re.compile(r"(?:FACTURA|factura|Factura)\s*[:\s#\-]*([A-Z0-9\-\/\.\s]{1,20})", _I),
    re.compile(r"(?:invoice|Invoice|INVOICE)\s*[:\s#\-]*([A-Z0-9\-\/\.\s]{1,20})", _I),
]

_PAT_FECHA = [
    re.compile(r"(?:FECHA|fecha|Date|date)\s*\n?(\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4})", _I),
    re.compile(r"(\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4})"),
    re.compile(r"(\d{1,2}\-\d{1,2}\-\d{4})"),
    re.compile(r"(\d{1,2}\.\d{1,2}\.\d{4})"),
    re.compile(r"(\d{2,4}[\/\-\.]\d{1,2}[\/\-\.]\d{1,2})"),
    re.compile(r"(\d{1,2}\s+de\s+\w+\s+de\s+\d{4})", _I),
]

_AMT = r"(\d{1,8}[,\.]\d{1,2})"
_PAT_TOTAL = [
    re.compile(r"(?:TOTAL|total|Total)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:L[íi]quido|LIQUIDO|liquido)\s*(?:\(EUR\))?\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:IMPORTE\s*TOTAL|importe\s*total)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:TOTAL\s*FACTURA|total\s*factura)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:SUMA\s*TOTAL|suma\s*total)\s*[:\s]*" + _AMT + r"\s*€?", _I),
]

_PAT_BASE = [
    re.compile(r"(?:BASE\s*IMPONIBLE|base\s*imponible)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:SUBTOTAL|subtotal|Subtotal)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:BASE|base|Base)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:IMPORTE\s*NETO|importe\s*neto)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:NETO|neto|Neto)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:BASE\s*IMPONIBLE|base\s*imponible)\s*" + _AMT, _I),
    re.compile(_AMT + r"\s*€?\s*(?:BASE|base|Base)", _I),
    re.compile(r"(?:SUBTOTAL|subtotal)\s*" + _AMT, _I),
    re.compile(r"(?:BASE\s*IMPONIBLE|base\s*imponible)\s*(\d{1,8})", _I),
    re.compile(r"(\d{1,8})\s*(?:BASE|base|Base)", _I),
]

_PAT_CUOTA = [
    re.compile(r"(?:IVA|iva)\s*\d{1,2}%?\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:CUOTA\s*IVA|cuota\s*iva)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:I\.V\.A\.|i\.v\.a\.)\s*[:\s]*" + _AMT + r"\s*€?", _I),
    re.compile(r"(?:IVA|iva)\s*" + _AMT, _I),
    re.compile(_AMT + r"\s*€?\s*(?:IVA|iva)", _I),
    re.compile(r"(?:CUOTA\s*IVA|cuota\s*iva)\s*" + _AMT, _I),
    re.compile(r"(?:IVA|iva)\s*(\d{1,8})", _I),
    re.compile(r"(\d{1,8})\s*(?:IVA|iva)", _I),
]

_PAT_TIPO = [
    re.compile(r"(?:IVA|iva|I\.V\.A\.)\s*(\d{1,2})[%\s]", _I),
    re.compile(r"(\d{1,2})\s*%\s*(?:IVA|iva)", _I),
    re.compile(r"(?:al|AL)\s*(\d{1,2})\s*%", _I),
]

_STRIP_CIF = re.compile(r"[\s\-\.]")
_HAS_DIGIT = re.compile(r"\d")
_LETTERS = re.compile(r"[a-zA-ZáéíóúüñÁÉÍÓÚÜÑ]")
_ONLY_DIGITS = re.compile(r"^\d+$")
_LEADING_KEYWORD_1 = re.compile(r"^(FACTURA|INVOICE|factura|invoice|fecha|date|cliente|customer)", _I)
_LEADING_KEYWORD_2 = re.compile(r"^(FACTURA|INVOICE|factura|fecha|total|cliente|€)", _I)
_LEADING_KEYWORD_3 = re.compile(r"^(FACTURA|INVOICE|factura|fecha|total|base|€)", _I)
_LEADING_DIGIT = re.compile(r"^\d")
_LEADING_ADDR = re.compile(r"^(C\/|CALLE|AV\.|AVENIDA|PLAZA)", _I)
_WS_RUN = re.compile(r"\s+")

_EMPRESA_INDICATORS = [
    "S.L.", "S.A.", "S.L.U.", "S.C.", "C.B.", "SL", "SA", "SLU",
    "Ltd", "Inc", "Corp", "GmbH", "LLC", "LTD",
    "Sociedad", "Limitada", "Anónima", "Company", "Compañía",
]

_MERCANTIL_BLACKLIST = [
    "CIF", "TELÉFONO", "C/", "POLÍGONO", "INDUSTRIAL", "CTRA",
    "KM", "CÁDIZ", "SANLÚCAR", "BARRAMEDA",
]

_PROVEEDOR_UNKNOWN = "Proveedor no identificado"
_NUMERO_UNKNOWN = "SIN_NUMERO"


# Per-pattern necessary-literal gates (CNF over lowercase substrings): a
# pattern is scanned only when, for every group, at least one alternative
# occurs in the lowered text. Each literal is provably required by the
# regex (e.g. every branch of `Nº?\s*FACTURA|N[ÚU]MERO?\s*FACTURA` contains
# FACTURA), so skipping the scan cannot change the candidate list — it just
# converts most of the 42 full-text regex passes into substring probes.
_Gate = tuple[tuple[str, ...], ...]

_GATED_CIF: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_CIF[0], ()),
    (_PAT_CIF[1], ()),
    (_PAT_CIF[2], (("cif", "c.i.f"),)),
    (_PAT_CIF[3], ()),
]
_GATED_NUMERO: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_NUMERO[0], (("factura",),)),
    (_PAT_NUMERO[1], (("factura",),)),
    (_PAT_NUMERO[2], (("nº", "num"),)),
    (_PAT_NUMERO[3], (("fn", "f.n"),)),
    (_PAT_NUMERO[4], (("factura",),)),
    (_PAT_NUMERO[5], (("invoice",),)),
]
_GATED_FECHA: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_FECHA[0], (("fecha", "date"),)),
    (_PAT_FECHA[1], ()),
    (_PAT_FECHA[2], ()),
    (_PAT_FECHA[3], ()),
    (_PAT_FECHA[4], ()),
    (_PAT_FECHA[5], (("de",),)),
]
_GATED_TOTAL: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_TOTAL[0], (("total",),)),
    (_PAT_TOTAL[1], (("líquido", "liquido"),)),
    (_PAT_TOTAL[2], (("importe",), ("total",))),
    (_PAT_TOTAL[3], (("total",), ("factura",))),
    (_PAT_TOTAL[4], (("suma",), ("total",))),
]
_GATED_BASE: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_BASE[0], (("base",), ("imponible",))),
    (_PAT_BASE[1], (("subtotal",),)),
    (_PAT_BASE[2], (("base",),)),
    (_PAT_BASE[3], (("importe",), ("neto",))),
    (_PAT_BASE[4], (("neto",),)),
    (_PAT_BASE[5], (("base",), ("imponible",))),
    (_PAT_BASE[6], (("base",),)),
    (_PAT_BASE[7], (("subtotal",),)),
    (_PAT_BASE[8], (("base",), ("imponible",))),
    (_PAT_BASE[9], (("base",),)),
]
_GATED_CUOTA: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_CUOTA[0], (("iva",),)),
    (_PAT_CUOTA[1], (("cuota",), ("iva",))),
    (_PAT_CUOTA[2], (("i.v.a",),)),
    (_PAT_CUOTA[3], (("iva",),)),
    (_PAT_CUOTA[4], (("iva",),)),
    (_PAT_CUOTA[5], (("cuota",), ("iva",))),
    (_PAT_CUOTA[6], (("iva",),)),
    (_PAT_CUOTA[7], (("iva",),)),
]
_GATED_TIPO: list[tuple[re.Pattern[str], _Gate]] = [
    (_PAT_TIPO[0], (("iva", "i.v.a"),)),
    (_PAT_TIPO[1], (("iva",), ("%",))),
    (_PAT_TIPO[2], (("al",), ("%",))),
]


def _extract_all_gated(
    bank: list[tuple[re.Pattern[str], _Gate]], text: str, low: str
) -> list[str]:
    """Gated variant of :func:`_extract_all`: same output (same pattern
    order, same text order, same filter(Boolean)), skipping patterns whose
    necessary literals are absent from ``low``."""
    out: list[str] = []
    for pat, cnf in bank:
        for alts in cnf:
            for a in alts:
                if a in low:
                    break
            else:
                break  # a required group has no alternative present
        else:
            for g in pat.findall(text):
                g = g.strip()
                if g:
                    out.append(g)
    return out


def _extract_all(patterns: list[re.Pattern[str]], text: str) -> list[str]:
    """``extractWithPatterns``: collect group(1) of every match, in pattern
    order then text order; drop empty/None (JS ``filter(Boolean)``).

    Every bank pattern has exactly one capturing group (asserted in
    tests/test_textparse.py), so ``findall`` returns the group strings
    directly — no Match objects, ~2x less Python overhead than finditer.
    A non-participating group (alternation branches without the group)
    yields '' from findall exactly as ``m.group(1) is None`` did."""
    out: list[str] = []
    for pat in patterns:
        for g in pat.findall(text):
            g = g.strip()
            if g:
                out.append(g)
    return out


@dataclass
class ExtractedFields:
    """Result of the deterministic fallback extraction (one document)."""

    proveedor_nombre: str = _PROVEEDOR_UNKNOWN
    proveedor_cif: str | None = None
    numero_factura: str = _NUMERO_UNKNOWN
    fecha_factura: date | None = None
    total_factura: float = 0.0
    base_imponible: float = 0.0
    cuota_iva: float = 0.0
    tipo_iva: int = 21
    confianza_global: float = 0.0
    confianza_proveedor: float = 0.0
    confianza_datos_fiscales: float = 0.0
    confianza_importes: float = 0.0
    cifs_detectados: list[str] = field(default_factory=list)


def _select_supplier(lines: list[str], cifs: list[str]) -> str:
    """Supplier cascade, exact rule order (process-invoice/index.ts:1482-1592)."""
    nombre = _PROVEEDOR_UNKNOWN

    # Strategy 1: near the first CIF (±4 lines)
    if cifs:
        cif = cifs[0]
        for i, line in enumerate(lines):
            if cif in line or cif[:8] in line:
                for j in range(max(0, i - 4), min(len(lines) - 1, i + 4) + 1):
                    cand = lines[j].strip()
                    if cif in cand:
                        continue
                    if len(cand) < 5 or len(cand) > 120:
                        continue
                    if _ONLY_DIGITS.match(cand):
                        continue
                    if _DMY.match(cand):
                        continue
                    if _LEADING_KEYWORD_1.match(cand):
                        continue
                    letters = len(_LETTERS.findall(cand))
                    if letters >= 4 and letters >= len(cand) * 0.3:
                        nombre = cand
                        break
                if nombre != _PROVEEDOR_UNKNOWN:
                    break

    # Strategy 1b: after "INSCRITA EN EL REGISTRO MERCANTIL"
    if nombre == _PROVEEDOR_UNKNOWN:
        for i, line in enumerate(lines):
            if "INSCRITA EN EL REGISTRO MERCANTIL" in line:
                for j in range(i + 1, min(i + 3, len(lines) - 1) + 1):
                    cand = lines[j].strip()
                    if 5 < len(cand) < 120 and not any(
                        b in cand for b in _MERCANTIL_BLACKLIST
                    ):
                        nombre = cand
                        break
                if nombre != _PROVEEDOR_UNKNOWN:
                    break

    # Strategy 2: corporate-suffix indicators in first 25 lines
    if nombre == _PROVEEDOR_UNKNOWN:
        for line in lines[:25]:
            cand = line.strip()
            if len(cand) < 5 or len(cand) > 120:
                continue
            if _LEADING_KEYWORD_2.match(cand):
                continue
            for ind in _EMPRESA_INDICATORS:
                if ind in cand:
                    nombre = cand
                    break
            if nombre != _PROVEEDOR_UNKNOWN:
                break

    # Strategy 3: first plausible 2-8-word line in first 15
    if nombre == _PROVEEDOR_UNKNOWN:
        for line in lines[:15]:
            cand = line.strip()
            if len(cand) < 8 or len(cand) > 100:
                continue
            if _LEADING_KEYWORD_3.match(cand):
                continue
            if _LEADING_DIGIT.match(cand):
                continue
            if _LEADING_ADDR.match(cand):
                continue
            letters = len(_LETTERS.findall(cand))
            words = len(cand.split())
            if letters >= 8 and 2 <= words <= 8:
                nombre = cand
                break

    return nombre


def extract_fields(text: str | None, as_of: date = AS_OF_DEFAULT) -> ExtractedFields:
    """Deterministic field extraction for one document.

    Mirrors ``extractDataFromTextFallback`` (process-invoice/index.ts:1208-1733):
    pattern bank -> candidate selection -> fiscal reconciliation -> confidence.
    ``as_of`` replaces the reference's wall-clock for the date sanity window
    [Jan 1 of (as_of.year-10), Dec 31 of (as_of.year+2)].
    """
    if text is None:
        text = ""  # flows through the normal path -> conf 0.3 + coherence 0.1

    lines = [ln for ln in text.split("\n") if ln.strip()]

    # Conservative guards: each pattern bank can only match if its required
    # literal appears (e.g. every total-pattern alternative contains
    # TOTAL/LIQUIDO/IMPORTE/SUMA). When the guard fails the bank provably
    # yields [] — skipping the 5-10 regex scans is semantics-free and is the
    # dominant win on the realistic web corpus where most pages are NOT
    # invoices.
    low = text.lower()
    has_digit = _HAS_DIGIT.search(text) is not None

    cifs = (
        [_STRIP_CIF.sub("", c) for c in _extract_all_gated(_GATED_CIF, text, low)]
        if has_digit
        else []
    )
    numeros = (
        _extract_all_gated(_GATED_NUMERO, text, low)
        if has_digit
        and ("factura" in low or "invoice" in low or "nº" in low or "num" in low
             or "fn" in low or "f.n" in low)
        else []
    )
    fechas = _extract_all_gated(_GATED_FECHA, text, low) if has_digit else []
    totales = (
        _extract_all_gated(_GATED_TOTAL, text, low)
        if has_digit
        and ("total" in low or "líquido" in low or "liquido" in low
             or "importe" in low or "suma" in low)
        else []
    )
    bases = (
        _extract_all_gated(_GATED_BASE, text, low)
        if has_digit and ("base" in low or "subtotal" in low or "neto" in low)
        else []
    )
    cuotas = (
        _extract_all_gated(_GATED_CUOTA, text, low)
        if has_digit and ("iva" in low or "i.v.a" in low or "cuota" in low)
        else []
    )
    tipos: list[int] = []
    tipo_raw = (
        _extract_all_gated(_GATED_TIPO, text, low)
        if has_digit and ("iva" in low or "i.v.a" in low or "al" in low)
        else []
    )
    for t in tipo_raw:
        try:
            n = int(t)
        except ValueError:
            continue
        if 0 <= n <= 30:
            tipos.append(n)

    proveedor = _select_supplier(lines, cifs)

    # Invoice number: shortest candidate with a digit, len 1..25
    numero = _NUMERO_UNKNOWN
    candidatos = [
        _WS_RUN.sub(" ", f).strip() for f in numeros
    ]
    candidatos = [f for f in candidatos if 1 <= len(f) <= 25 and _HAS_DIGIT.search(f)]
    if candidatos:
        # min is the stable-sort head: first of the shortest (JS sort tie)
        numero = min(candidatos, key=len)

    # Date: first candidate parsing into [as_of-10y Jan1, as_of+2y Dec31]
    fecha: date | None = None
    lo = date(as_of.year - 10, 1, 1)
    hi = date(as_of.year + 2, 12, 31)
    for f in fechas:
        d = convert_to_iso_date(f)
        if d is not None and lo <= d <= hi:
            fecha = d
            break

    # CIF: first with length >= 9, else first, else None
    cif_sel = next((c for c in cifs if len(c) >= 9), cifs[0] if cifs else None)

    total_cands = sorted((n for n in map(parse_importe, totales) if n > 0), reverse=True)
    base_cands = sorted((n for n in map(parse_importe, bases) if n > 0), reverse=True)
    iva_cands = sorted((n for n in map(parse_importe, cuotas) if n > 0), reverse=True)

    total = total_cands[0] if total_cands else 0.0
    base = base_cands[0] if base_cands else 0.0
    cuota = iva_cands[0] if iva_cands else 0.0
    tipo = next((t for t in tipos if t in (4, 10, 21)), tipos[0] if tipos else 21)

    # Fiscal reconciliation (F11), exact branch order (index.ts:1646-1688)
    if total > 0 and base == 0 and tipo > 0:
        base = total / (1 + tipo / 100)
        cuota = total - base
    elif base > 0 and cuota == 0 and tipo > 0:
        cuota = base * (tipo / 100)
        total = base + cuota
    elif base > 0 and cuota > 0 and total == 0:
        total = base + cuota
    elif base > 0 and total > 0 and cuota == 0:
        cuota = total - base

    # Coherence correction: overwrite total if |total-(base+cuota)| > 0.01
    if base > 0 and cuota > 0 and total > 0:
        if abs(total - (base + cuota)) > 0.01:
            total = base + cuota

    total = js_round2(total)
    base = js_round2(base)
    cuota = js_round2(cuota)

    # Confidence (F12, index.ts:1697-1712)
    conf = 0.3
    if proveedor != _PROVEEDOR_UNKNOWN:
        conf += 0.2
    if cif_sel and len(cif_sel) >= 9:
        conf += 0.15
    if numero != _NUMERO_UNKNOWN and len(numero) >= 2:
        conf += 0.1
    if total > 0:
        conf += 0.15
    if base > 0:
        conf += 0.1
    if abs(total - (base + cuota)) <= 0.1:
        conf += 0.1
    conf = min(conf, 1.0)

    return ExtractedFields(
        proveedor_nombre=proveedor,
        proveedor_cif=cif_sel,
        numero_factura=numero,
        fecha_factura=fecha,
        total_factura=total,
        base_imponible=base,
        cuota_iva=cuota,
        tipo_iva=tipo,
        confianza_global=js_round2(conf),
        confianza_proveedor=js_round2(conf * 0.8),
        confianza_datos_fiscales=js_round2(conf * 0.9),
        confianza_importes=js_round2(conf * 0.85),
        cifs_detectados=cifs,
    )


# --- C1 document classifier (process-invoice/index.ts:3982-4116) ------------

_ALBARAN_KEYWORDS = [
    "albarán", "albaran", "delivery note", "nota de entrega",
    "entrega", "entregado", "recepción", "recibido",
]
_FACTURA_KEYWORDS = [
    "factura", "invoice", "total factura", "base imponible",
    "cuota iva", "vencimiento", "pagar",
]
_ENTREGA_INDICATORS = [
    "transportista", "conductor", "matrícula", "conformidad",
    "firma", "estado entrega",
]
_PRICE_SHAPE = re.compile(r"\d+[,\.]\d{2}\s*€")


def classify_document(text: str | None) -> tuple[str, float, str]:
    """``classifyDocument`` (process-invoice/index.ts:3982-4116), exact rules:

    1. albarán-word and no factura-word -> ('albaran', 0.95)
    2. factura-word and no albarán-word -> ('factura', 0.95)
    3. both -> ('factura', 0.95)   (invoice referencing delivery notes)
    4. neither: >3 price shapes -> ('factura', 0.7); >1 delivery indicator ->
       ('albaran', 0.6); else ('factura', 0.5). Short text -> ('factura', 0.3).
    Returns (tipo, confianza, razonamiento-tag).
    """
    if not text or len(text) < 10:
        return ("factura", 0.3, "texto_insuficiente")
    low = text.lower()
    has_albaran = any(k in low for k in _ALBARAN_KEYWORDS)
    has_factura = any(k in low for k in _FACTURA_KEYWORDS)
    if has_albaran and not has_factura:
        return ("albaran", 0.95, "albaran_sin_factura")
    if has_factura and not has_albaran:
        return ("factura", 0.95, "factura_sin_albaran")
    if has_albaran and has_factura:
        return ("factura", 0.95, "factura_con_ref_albaran")
    price_count = len(_PRICE_SHAPE.findall(low))
    if price_count > 3:
        return ("factura", 0.7, f"precios={price_count}")
    entrega_hits = sum(1 for k in _ENTREGA_INDICATORS if k in low)
    if entrega_hits > 1:
        return ("albaran", 0.6, f"indicadores_entrega={entrega_hits}")
    return ("factura", 0.5, "default")
