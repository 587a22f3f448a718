"""End-to-end golden test on the reference's REAL Document-AI fixture.

The reference ships one complete real OCR response —
dashboard-facturas-claude/JSON_MUESTRA (DIMARBA -> CORRELIMO HUELVA S.L.,
20,734 lines) — the only non-synthetic truth anchor available. This test
feeds it through the docai converter and asserts the known document
truths at the layers where the DETERMINISTIC path surfaces them:

  supplier CIF B11039138 / client CIF B56390065 (F1 + F10),
  fecha 31/07/2025 (F3), Total Bruto 64,09 / IVA 13,46 @21% / TOTAL 77,55
  (F4/F5/F6/F11), numero 43001874 + ALB ref OL/000175 as byte-identical
  line spans (T1/T3), the 4 line items (P1), classification (C1), and the
  M7 cotejo suggestion built from the extracted fields.

Where the reference's own deterministic fallback provably yields a
different value than the document truth (numero '77' from pattern 5's
char class stopping at ',', form-field 'factura' substring routing
catching 'TOTAL FACTURA:'), the test pins the FAITHFUL value and cites
the reference lines — byte-identical to the reference's computation, not
to a human reading of the invoice.
"""

from __future__ import annotations

import json
from datetime import date
from pathlib import Path

import pytest

FIXTURE = Path("/root/reference/dashboard-facturas-claude/JSON_MUESTRA")

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def docai_doc() -> dict:
    return json.loads(FIXTURE.read_text())


@pytest.fixture(scope="module")
def ocr_doc(docai_doc) -> dict:
    from facturas_spark.extraction.docai import docai_to_ocr_doc

    return docai_to_ocr_doc(docai_doc, url="docai://dimarba-43001874")


def test_conversion_shape(ocr_doc):
    assert len(ocr_doc["text"]) == 1067
    assert len(ocr_doc["pages"]) == 1
    p = ocr_doc["pages"][0]
    assert (p["width"], p["height"]) == (1681.0, 2379.0)
    assert len(p["blocks"]) == 66
    assert len(p["lines"]) == 84
    assert len(p["tokens"]) == 187
    assert len(p["tables"]) == 5


def test_t1_t3_byte_identical_spans(ocr_doc):
    """T1 invariant on real data: every walked element reconstructs
    byte-identically from [start:end) — and the known truths appear as
    exact line spans."""
    from facturas_spark.extraction.ocr import walk_layout

    els = walk_layout(ocr_doc["text"], ocr_doc["pages"])
    # 66 blocks + 66 paragraphs + 84 lines + 187 tokens, all valid
    assert len(els) == 403
    for e in els:
        assert e["texto"] == e["texto"].strip() and e["texto"]
        assert e["texto"] in ocr_doc["text"]
    lines = {e["texto"] for e in els if e["kind"] == "line"}
    assert "DIMARBA" in lines
    assert "C.I.F. B11039138" in lines          # supplier CIF
    assert "C.I.F. B56390065" in lines          # client CIF
    assert "43001874" in lines                  # the real invoice number
    assert "OL/000175 Fecha: 14/07/2025" in lines  # the ALB ref line
    assert "TOTAL FACTURA:" in lines


def test_t3_full_walk_variant(docai_doc):
    """The formFields/tables walk variant (index.ts:3894-3977) on the real
    fixture. Pins two reference behaviors:

    - tables DO emit (they carry a layout with boundingPoly): 5 elements
      at the flat 0.8 prior, keyed 1-based with the singular kind;
    - formFields emit NOTHING even though the page has 18 — the fixture
      keeps boundingPoly inside fieldName/fieldValue, but
      extractCoordinates only checks item.layout / item.boundingBox /
      item.boundingPoly (index.ts:350-374), finds none, and returns null.
      Faithful means reproducing that miss, not fixing it."""
    from facturas_spark.extraction.docai import docai_walk_coordinates

    coords = docai_walk_coordinates(docai_doc)
    tipos = {}
    for v in coords.values():
        tipos[v["tipo"]] = tipos.get(v["tipo"], 0) + 1
    assert tipos == {"block": 66, "paragraph": 66, "line": 84, "token": 187, "table": 5}
    assert "formField" not in tipos  # the pinned null-coords miss
    t1 = coords["pagina_1_table_1"]
    assert t1["confidence"] == 0.8 and t1["pagina"] == 1
    assert t1["texto"].startswith("ALBARÁN")
    # paragraph prior 0.75, layout kinds keep their T3 priors
    assert coords["pagina_1_paragraph_1"]["confidence"] == 0.75
    assert coords["pagina_1_block_1"]["confidence"] == 0.7


def test_p1_table_line_items(ocr_doc):
    """P1 on the real line-item table: the merged header cell binds desc
    AND cantidad to column 0 (reference findIndex semantics,
    index.ts:2066-2077); the 4 body rows emit with the 'Precio' column
    (index 1) as price and cantidad falling back to 1 (parseSpanishAmount
    of the code/date blob is null -> `|| 1`, index.ts:2094-2096)."""
    from facturas_spark.extraction.ocr import extract_table_products

    prods = extract_table_products(ocr_doc["text"], ocr_doc["pages"])
    assert len(prods) == 4
    assert [p["precio_total_linea_sin_iva"] for p in prods] == [5.37, 0.83, 0.82, 7.91]
    assert all(p["cantidad"] == 1.0 for p in prods)
    assert all(p["confianza_linea"] == 0.9 for p in prods)
    assert prods[0]["descripcion_original"] == "OL/2025000175 10/07/25 1001"


def test_f13_form_field_routing_faithful(docai_doc):
    """F13 over the real 18 formFields. Two reference behaviors this
    fixture exposes (both faithful, both cited):
    - the 'factura' substring branch (index.ts:535) catches the
      'TOTAL FACTURA:' field BEFORE the totalfactura branch can see it,
      so numero_factura = '77,55' and total_factura stays 0;
    - the second 'Fecha: ' field (the albaran date 14/07/2025) overwrites
      the first 'FECHA' (31/07/2025) — last write wins (index.ts:510)."""
    from facturas_spark.extraction.docai import docai_form_fields
    from facturas_spark.extraction.ocr import map_form_fields

    fields = docai_form_fields(docai_doc)
    assert len(fields) == 18
    assert ("FECHA", "31/07/2025", pytest.approx(0.71743166)) == fields[0]
    d = map_form_fields(fields)
    assert d["fecha_factura"] == date(2025, 7, 14)   # faithful overwrite
    assert d["numero_factura"] == "77,55"            # faithful mis-route
    assert d["base_imponible"] == 64.09              # 'Total base imponible :'
    assert d["total_factura"] == 0.0                 # consumed by 'factura' branch
    assert d["confianza_datos_fiscales"] == pytest.approx(0.71743166)


def test_full_text_extraction_known_truths(ocr_doc):
    """F1-F12 deterministic fallback over the real flattened text."""
    from facturas_spark.extraction.textparse import classify_document, extract_fields

    f = extract_fields(ocr_doc["text"])
    assert f.proveedor_nombre == "DIMARBA"
    assert f.proveedor_cif == "B11039138"
    assert f.fecha_factura == date(2025, 7, 31)
    assert f.total_factura == 77.55
    assert f.base_imponible == 64.09
    assert f.cuota_iva == 13.46
    assert f.tipo_iva == 21
    # F11 coherence holds exactly: 64.09 + 13.46 == 77.55
    assert f.confianza_global == 1.0
    assert set(f.cifs_detectados) == {"B11039138", "B56390065"}
    # numero: the reference fallback's shortest-candidate pick yields '77'
    # (pattern /FACTURA\s*[:\s#\-]*([A-Z0-9\-\/\.\s]{1,20})/ at
    # index.ts:1252 stops at the ',' of '77,55'; index.ts:1609 sorts by
    # length) — the document's real number 43001874 is only reachable via
    # the excluded LLM path; byte-identical means '77' here.
    assert f.numero_factura == "77"
    # C1: ALBARAN mention + invoice keywords -> factura_con_ref_albaran
    assert classify_document(ocr_doc["text"]) == (
        "factura",
        0.95,
        "factura_con_ref_albaran",
    )


def test_f10_client_vs_supplier(ocr_doc):
    """F10 smartRestaurantFilter with the client's own CIF: both CIFs
    found in order, own CIF excluded, supplier CIF survives."""
    from facturas_spark.matching.context import smart_restaurant_filter

    ctx = smart_restaurant_filter(ocr_doc["text"], "B56390065")
    assert ctx["found_cifs"] == ["B11039138", "B56390065"]
    assert ctx["has_restaurant_cif"] is True
    assert ctx["exclude_cif"] == "B56390065"


def test_rows_rebuilt_from_real_token_boxes(ocr_doc):
    """P1 generalization on real token geometry: y-clustering rebuilds
    visual rows; the supplier CIF line survives byte-per-token."""
    from facturas_spark.extraction.ocr import reconstruct_rows_from_tokens

    rows = reconstruct_rows_from_tokens(ocr_doc["text"], ocr_doc["pages"][0])
    assert len(rows) == 32
    assert rows[0] == "DIMARBA"
    assert "C.I.F. B11039138" in rows


def test_m7_cotejo_from_fixture_fields(spark, ocr_doc):
    """M7 end-to-end on the fixture's own extracted values: factura
    (31/07/2025, 77.55, the 4 P1 products) vs albaran OL/000175
    (14/07/2025, Total Bruto 64.09). Temporal method: 17 days -> +0.02,
    amount delta 17.36%% -> +0.02, base 0.85 -> 0.89; consolidation beats
    the 0.55 last-chance candidate; +0.02 products adjust -> 0.91 ->
    'sugerencia' (0.7 <= s < 0.95)."""
    from facturas_spark.extraction.ocr import extract_table_products
    from facturas_spark.matching.cotejo import run_cotejo

    prods = [
        p["descripcion_original"]
        for p in extract_table_products(ocr_doc["text"], ocr_doc["pages"])
    ]
    facturas = spark.createDataFrame(
        [("fac-43001874", "DIMARBA", date(2025, 7, 31), 77.55, prods)],
        "factura_id string, proveedor_nombre string, fecha_factura date, "
        "total_factura double, productos array<string>",
    )
    albaranes = spark.createDataFrame(
        [("alb-OL000175", "OL/000175", "DIMARBA", date(2025, 7, 14), 64.09, [])],
        "albaran_id string, numero_albaran string, proveedor_nombre string, "
        "fecha_albaran date, total_albaran double, productos array<string>",
    )
    out = run_cotejo(facturas, albaranes, as_of=date(2025, 7, 31)).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["metodo"] == "proximidad_temporal"
    assert row["score"] == pytest.approx(0.91)
    assert row["categoria_enlace"] == "sugerencia"
