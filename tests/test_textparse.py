"""Table-driven tests for the deterministic parser core.

Case tables mirror the branch structure of the reference parsers
(process-invoice/index.ts:1380-1475, 1812-1847, 2863-2919) including the
documented disagreement between the two amount-parser variants on "1,234".
"""

from __future__ import annotations

from datetime import date

import pytest

from facturas_spark.extraction.textparse import (
    classify_document,
    convert_to_iso_date,
    extract_fields,
    js_round2,
    parse_importe,
    parse_spanish_amount,
    parse_spanish_date,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("1.234,56", 1234.56),   # Spanish: dot thousands, comma decimal
        ("1,234.56", 1234.56),   # English: comma thousands, dot decimal
        ("123,45", 123.45),      # lone comma, <=2 trailing -> decimal
        ("1,234", 1234.0),       # lone comma, 3 trailing -> thousands
        ("123.45", 123.45),      # lone dot, <=2 trailing -> decimal
        ("1.234", 1234.0),       # lone dot, 3 trailing -> thousands
        ("77,55€", 77.55),
        ("  64,09 € ", 64.09),
        ("$1,000,000", 1000000.0),
        ("0,01", 0.01),
        ("", 0.0),
        (None, 0.0),
        ("abc", 0.0),
        ("12.34.56", 123456.0),  # multi-dot -> all stripped as thousands
    ],
)
def test_parse_importe(raw, expected):
    assert parse_importe(raw) == expected


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("1.234,56", 1234.56),
        ("1,234", 1.234),        # strict variant: comma ALWAYS decimal
        ("123,45", 123.45),
        ("77,55€", 77.55),
        ("-5,00", None),         # negative -> None
        ("", None),
        (None, None),
        ("abc", None),
    ],
)
def test_parse_spanish_amount(raw, expected):
    assert parse_spanish_amount(raw) == expected


def test_variants_disagree_on_lone_comma_thousands():
    # the documented reference inconsistency we must preserve per call site
    assert parse_importe("1,234") == 1234.0
    assert parse_spanish_amount("1,234") == 1.234


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("29/05/2025", date(2025, 5, 29)),
        ("29-05-2025", date(2025, 5, 29)),
        ("29.05.2025", date(2025, 5, 29)),
        ("05/01/49", date(2049, 1, 5)),    # 2-digit <50 -> 20xx
        ("05/01/51", date(1951, 1, 5)),    # 2-digit >=50 -> 19xx
        ("2025-05-29", date(2025, 5, 29)),
        ("2025/5/9", date(2025, 5, 9)),
        ("12 de enero de 2024", date(2024, 1, 12)),
        ("3 de septiembre de 2023", date(2023, 9, 3)),
        ("31/02/2024", date(2024, 3, 2)),  # JS Date normalizes overflow
        ("notadate", None),
        ("", None),
        (None, None),
    ],
)
def test_convert_to_iso_date(raw, expected):
    assert convert_to_iso_date(raw) == expected


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("29/05/2025", date(2025, 5, 29)),
        ("31/12/99", date(2099, 12, 31)),  # always +2000 in this variant
        ("31/02/2024", None),              # round-trip validity check
        ("32/01/2024", None),
        ("15.06.24", date(2024, 6, 15)),
        ("", None),
    ],
)
def test_parse_spanish_date(raw, expected):
    assert parse_spanish_date(raw) == expected


def test_js_round2_half_up():
    assert js_round2(1.005) == 1.0   # float64: 1.005*100 = 100.4999... -> 100
    assert js_round2(1.015) == 1.01  # float64: 1.015*100 = 101.4999... -> 101
    assert js_round2(1.045) == 1.05  # float64: 1.045*100 = 104.5000...01 -> 105
    assert js_round2(64.094999) == 64.09
    assert js_round2(64.095) == 64.1


INVOICE = """CORRELIMO HUELVA S.L.
CIF: B56390065
C/ Feria, 12
21001 HUELVA
Nº FACTURA
43001874
FECHA
31/07/2025
CONCEPTOS
Merluza del norte 4,00 kg x 12,50 EUR
IVA 21%: 13,46€
BASE IMPONIBLE: 64,09€
TOTAL: 77,55€
"""


def test_extract_fields_end_to_end():
    f = extract_fields(INVOICE)
    assert f.proveedor_nombre == "CORRELIMO HUELVA S.L."
    assert f.proveedor_cif == "B56390065"
    assert f.numero_factura == "43001874"
    assert f.fecha_factura == date(2025, 7, 31)
    assert f.base_imponible == 64.09
    # Reference quirk, faithfully preserved: the `IVA\s*(\d+)` cuota pattern
    # (index.ts:1311) also captures the rate token "21" from "IVA 21%", and
    # max-selection picks it whenever the true cuota < tipo (here 13.46<21).
    # The coherence rule then overwrites total = base + cuota = 85.09.
    assert f.cuota_iva == 21.0
    assert f.total_factura == 85.09
    assert f.tipo_iva == 21
    assert f.confianza_global == 1.0


def test_extract_fields_large_invoice_no_rate_capture():
    # when cuota >= tipo (base >= 100 at 21%), the labeled cuota wins
    text = INVOICE.replace("13,46", "134,61").replace("64,09", "641,00").replace(
        "77,55", "775,61"
    )
    f = extract_fields(text)
    assert f.base_imponible == 641.0
    assert f.cuota_iva == 134.61
    assert f.total_factura == 775.61


def test_fiscal_reconciliation_from_total():
    # only TOTAL present -> base/cuota derived: base = total/(1+t/100)
    f = extract_fields("ACME CORPORACION S.L.\nCIF: B12345678\nTOTAL: 121,00€\nIVA 21%")
    assert f.total_factura == 121.0
    assert f.base_imponible == 100.0
    assert f.cuota_iva == 21.0


def test_value_before_label_capture_is_faithful():
    # digits ending the previous line are captured by the value-before-label
    # pattern `(\d{1,8})\s*BASE` across the newline — reference behavior
    f = extract_fields("CIF: B12345678\nBASE IMPONIBLE: 200,00€")
    assert f.base_imponible == 12345678.0


def test_fiscal_reconciliation_from_base():
    f = extract_fields(
        "ACME CORPORACION S.L.\nCIF: B12345678\nDireccion: Calle Mayor\n"
        "BASE IMPONIBLE: 200,00€\nal 10 %"
    )
    assert f.base_imponible == 200.0
    assert f.cuota_iva == 20.0
    assert f.total_factura == 220.0
    assert f.tipo_iva == 10


def test_coherence_overwrites_total():
    text = "EMPRESA DEMO S.A.\nIVA 21%: 21,00€\nBASE IMPONIBLE: 100,00€\nTOTAL: 500,00€"
    f = extract_fields(text)
    assert f.total_factura == 121.0  # corrected to base + cuota


def test_confidence_bounds():
    f = extract_fields("")
    assert f.confianza_global == 0.3 + 0.1  # empty: coherence 0==0+0 bonus
    f2 = extract_fields(INVOICE)
    assert 0.0 <= f2.confianza_global <= 1.0


def test_shortest_invoice_number_wins():
    text = "FACTURA: ABC-123-XYZ\nNº FACTURA\n905"
    f = extract_fields(text)
    assert f.numero_factura == "905"


def test_date_sanity_window():
    # 01/01/1990 is outside [as_of-10y, as_of+2y] and rejected; the YYYY/MM/DD
    # pattern then re-matches the prefix "01/01/19" (faithful reference
    # fallback) which parses as 2019-01-01 — in-window, so selected.
    f = extract_fields("FECHA\n01/01/1990\nTOTAL: 10,00€")
    assert f.fecha_factura == date(2019, 1, 1)
    f2 = extract_fields("FECHA\n01/01/2020\nTOTAL: 10,00€")
    assert f2.fecha_factura == date(2020, 1, 1)
    # no in-window candidate at all -> None sentinel (ref: new Date(), excised)
    f3 = extract_fields("TOTAL: 10,00€")
    assert f3.fecha_factura is None


def test_cif_selection_prefers_len9():
    text = "CIF: A-1234567\nOtra CIF: B56390065"
    f = extract_fields(text)
    assert f.proveedor_cif == "B56390065"


@pytest.mark.parametrize(
    ("text", "tipo", "conf"),
    [
        ("ALBARAN DE ENTREGA\nRecibido conforme", "albaran", 0.95),
        ("FACTURA Nº 905\nbase imponible 100", "factura", 0.95),
        ("FACTURA con referencia a albaran 33", "factura", 0.95),
        ("x", "factura", 0.3),
        ("texto neutro sin claves aqui presente", "factura", 0.5),
        (
            "transportista Juan conductor Pedro con matrícula 1234ABC",
            "albaran",
            0.6,
        ),
    ],
)
def test_classify_document(text, tipo, conf):
    t, c, _ = classify_document(text)
    assert (t, c) == (tipo, conf)


# --- hot-path gate invariants (round 3 optimizations) -----------------------

def test_bank_patterns_have_single_group():
    """`_extract_all` uses findall, which returns the group string directly
    only when every pattern has exactly one capturing group."""
    from facturas_spark.extraction import textparse as tp

    for bank in (tp._PAT_CIF, tp._PAT_NUMERO, tp._PAT_FECHA, tp._PAT_TOTAL,
                 tp._PAT_BASE, tp._PAT_CUOTA, tp._PAT_TIPO):
        for pat in bank:
            assert pat.groups == 1, pat.pattern


def test_gated_extract_matches_ungated():
    """The per-pattern literal gates are necessary conditions: gated and
    ungated extraction agree on keyword-soup inputs designed to straddle
    every gate boundary."""
    import random

    from facturas_spark.extraction import textparse as tp

    rnd = random.Random(99)
    vocab = [
        "FACTURA", "factura:", "TOTAL", "BASE IMPONIBLE", "IVA 21%", "I.V.A.",
        "Nº", "num 44", "f.n: 7", "invoice #12", "SUBTOTAL", "NETO",
        "LIQUIDO (EUR):", "líquido", "SUMA TOTAL", "al 10 %", "CIF: A-12345678",
        "B12345678", "12/05/2024", "2024-05-12", "12 de enero de 2024",
        "1.234,56", "77,55 €", "texto", "c.i.f", "fecha", "date", "cuota iva",
        "IMPORTE TOTAL", "IMPORTE NETO", "0,00", "99", "%",
    ]
    banks = [
        (tp._PAT_CIF, tp._GATED_CIF), (tp._PAT_NUMERO, tp._GATED_NUMERO),
        (tp._PAT_FECHA, tp._GATED_FECHA), (tp._PAT_TOTAL, tp._GATED_TOTAL),
        (tp._PAT_BASE, tp._GATED_BASE), (tp._PAT_CUOTA, tp._GATED_CUOTA),
        (tp._PAT_TIPO, tp._GATED_TIPO),
    ]
    for _ in range(800):
        text = " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 12)))
        if rnd.random() < 0.3:
            text = text.replace(" ", "\n", 1)
        low = text.lower()
        for plain, gated in banks:
            assert tp._extract_all(plain, text) == tp._extract_all_gated(
                gated, text, low
            ), text
