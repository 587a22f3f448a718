"""OCR layout layer tests: T1 byte-identical spans, T3 walk, P1 tables,
F13 form-field mapper, F14 entity mapper, y-clustering row rebuild."""

from __future__ import annotations

from datetime import date

import pandas as pd
import pytest

from facturas_spark.extraction.ocr import (
    OCR_DOC_DDL,
    extract_table_products,
    map_entities,
    map_form_fields,
    reconstruct_rows_from_tokens,
    walk_layout,
)
from facturas_spark.synth import ocr_rows, synth_ocr_doc

DOCS = [synth_ocr_doc(i, seed=42) for i in range(25)]


def test_walk_layout_byte_identical():
    for doc in DOCS:
        els = walk_layout(doc["text"], doc["pages"])
        # every token element's text must equal the exact slice (trimmed)
        for el in els:
            assert el["texto"] == el["texto"].strip()
            assert len(el["texto"]) > 0
        # confidence priors per kind (reference singular keys, index.ts:1125-1130)
        kinds = {e["kind"]: e["conf"] for e in els}
        assert kinds["block"] == 0.7
        assert kinds["paragraph"] == 0.75
        assert kinds["line"] == 0.85
        assert kinds["token"] == 0.9
        # block 0 covers the whole text
        block = next(e for e in els if e["kind"] == "block")
        assert block["texto"] == doc["text"].strip()
        # ids are 1-based with the singular container key (index.ts:1141)
        assert block["id"] == "pagina_1_block_1"
        # paragraphs pair consecutive lines: first paragraph = lines 1+2
        line_texts = [e["texto"] for e in els if e["kind"] == "line"]
        para = next(e for e in els if e["kind"] == "paragraph")
        assert para["texto"].startswith(line_texts[0])
        assert para["texto"].endswith(line_texts[1])


def test_walk_layout_drops_out_of_bounds():
    doc = DOCS[0]
    n_tokens_in = len(doc["pages"][0]["tokens"])
    els = [e for e in walk_layout(doc["text"], doc["pages"]) if e["kind"] == "token"]
    assert len(els) == n_tokens_in - 1  # the deliberate OOB token dropped


def test_rows_rebuilt_from_token_boxes():
    for doc in DOCS:
        rows = reconstruct_rows_from_tokens(doc["text"], doc["pages"][0])
        # OOB token contributes nothing; jittered y still clusters correctly
        assert rows == doc["exp_rows"], doc["url"]


def test_table_products_golden():
    for doc in DOCS:
        prods = extract_table_products(doc["text"], doc["pages"])
        assert len(prods) == len(doc["exp_products"]), doc["url"]
        for got, exp in zip(prods, doc["exp_products"]):
            assert got["codigo_producto"] == exp["codigo"]
            assert got["descripcion_original"] == exp["descripcion"]
            assert got["cantidad"] == pytest.approx(
                float(exp["cantidad"].replace(",", "."))
            )
            assert got["precio_total_linea_sin_iva"] == pytest.approx(
                float(exp["precio"].replace(",", "."))
            )
            assert got["confianza_linea"] == 0.9


def test_map_form_fields_routing():
    fields = [
        ("Fecha:", "31/07/2025", 0.95),
        ("Nº de Factura", "526 / 2025", 0.9),
        ("N.I.F.", "B-56.390.065", 0.85),
        ("TOTAL A PAGAR", "77,55", 0.92),
        ("Total conceptos", "64,09", 0.88),
        ("Fecha vto.", "31/08/2025", 0.9),  # excluded: contains 'vto'
    ]
    d = map_form_fields(fields)
    assert d["fecha_factura"] == date(2025, 7, 31)
    assert d["numero_factura"] == "526/2025"
    assert d["proveedor_cif"] == "B56390065"
    assert d["total_factura"] == 77.55
    assert d["base_imponible"] == 64.09
    # derived: cuota = round2(77.55-64.09) = 13.46; tipo = round(13.46/64.09*100) = 21
    assert d["cuota_iva"] == 13.46
    assert d["tipo_iva"] == 21
    assert d["confianza_datos_fiscales"] == 0.95
    assert d["confianza_importes"] == 0.92


def test_map_form_fields_total_factura_quirk():
    # Reference quirk, faithfully preserved: "TOTAL FACTURA" normalizes to
    # 'totalfactura', which contains 'factura' — the earlier numero branch of
    # the elif chain wins, so the amount lands in numero_factura and the
    # totalfactura branch is unreachable for that name (index.ts:536,573)
    d = map_form_fields([("TOTAL FACTURA", "77,55", 0.92)])
    assert d["numero_factura"] == "77,55"
    assert d["total_factura"] == 0.0


def test_map_form_fields_total_liquido_only_when_missing():
    # unaccented 'liquido' — the reference's includes('totalliquido') never
    # matches the accented form "Total líquido" (faithful quirk)
    d = map_form_fields([("Total liquido", "100,00", 0.9)])
    assert d["total_factura"] == 100.0
    d2 = map_form_fields(
        [("TOTAL A PAGAR", "50,00", 0.9), ("Total liquido", "100,00", 0.9)]
    )
    assert d2["total_factura"] == 50.0  # liquido doesn't override
    d3 = map_form_fields([("Total líquido", "100,00", 0.9)])
    assert d3["total_factura"] == 0.0  # accented form falls through


def test_map_form_fields_invalid_inputs():
    d = map_form_fields(
        [
            ("Fecha", "3/x/2025", 0.9),      # unparseable -> skipped
            ("CIF", "12345", 0.9),            # too short
            ("NIF", "ZZZZZZZZZ", 0.9),        # wrong shape
            ("TOTAL FACTURA", "-5,00", 0.9),  # negative -> None
            (None, None, 0.5),
        ]
    )
    assert d["fecha_factura"] is None
    assert d["proveedor_cif"] is None
    assert d["total_factura"] == 0.0


def test_map_entities():
    d = map_entities(
        [
            ("supplier_name", "DIMARBA S.L.", 0.9),
            ("invoice_id", "31/07/2025", 0.9),   # date-shaped -> rejected
            ("invoice_id", "43001874", 0.8),
            ("invoice_date", "31/07/2025", 0.85),
            ("total_amount", "77,55 €", 0.9),
            # 'net_amount' passes the outer money gate ('amount') but hits
            # no sub-route ('net' != 'neto') — faithful fall-through
            ("net_amount", "64,09", 0.88),
            ("base_amount", "64,09", 0.88),
        ]
    )
    assert d["proveedor_nombre"] == "DIMARBA S.L."
    assert d["numero_factura"] == "43001874"
    assert d["fecha_factura"] == date(2025, 7, 31)
    assert d["total_factura"] == 77.55
    assert d["base_imponible"] == 64.09
    assert d["confianza_global"] == pytest.approx((0.9 + 0.85 + 0.9) / 3)


def test_map_entities_faithful_gates():
    # money gate passes but no sub-route matches -> nothing assigned
    d = map_entities([("net_amount", "64,09", 0.88)])
    assert d["base_imponible"] == 0.0
    assert d["total_factura"] == 0.0
    # ...yet confianza_importes is NOT bumped either (assignment-gated)
    assert d["confianza_global"] == 0.3
    # numero gate rejects values containing '.', '-', '/'
    d2 = map_entities([("invoice_number", "F.2025", 0.9)])
    assert d2["numero_factura"] is None
    # one entity can hit several non-exclusive gates: 'invoice_date' sets
    # fecha; date-shaped value is rejected by the numero gate ('/')
    d3 = map_entities([("invoice_date", "31/07/2025", 0.7)])
    assert d3["fecha_factura"] == date(2025, 7, 31)
    assert d3["numero_factura"] is None
    # CIF keeps dots (reference strips only spaces and dashes)
    d4 = map_entities([("tax_id", "B-12.345.678", 0.9)])
    assert d4["proveedor_cif"] == "B12.345.678"


def test_map_entities_floor():
    assert map_entities([])["confianza_global"] == 0.3


def test_ocr_spark_roundtrip(spark):
    """The nested ocr_doc shape survives Spark (schema + per-row kernel)."""
    from pyspark.sql.functions import pandas_udf

    df = spark.createDataFrame(ocr_rows(10, seed=42), OCR_DOC_DDL)
    assert df.count() == 10

    @pandas_udf("int")
    def n_table_products(text: pd.Series, pages: pd.Series) -> pd.Series:
        out = []
        for t, ps in zip(text, pages):
            pages_py = [
                {
                    "tables": [
                        {
                            "header_cells": [
                                {"start": c["start"], "end": c["end"]}
                                for c in tb["header_cells"]
                            ],
                            "body_rows": [
                                [{"start": c["start"], "end": c["end"]} for c in row]
                                for row in tb["body_rows"]
                            ],
                        }
                        for tb in (p["tables"] or [])
                    ]
                }
                for p in ps
            ]
            out.append(len(extract_table_products(t, pages_py)))
        return pd.Series(out, dtype="int32")

    got = {
        r.url: r.n
        for r in df.select(
            "url", n_table_products("text", "pages").alias("n")
        ).collect()
    }
    for i in range(10):
        doc = synth_ocr_doc(i, seed=42)
        assert got[doc["url"]] == len(doc["exp_products"])