"""Tests for main-content extraction (boilerplate strip) and span layer."""

from __future__ import annotations

from facturas_spark.extraction.boilerplate import extract_main_text, line_content_mask
from facturas_spark.extraction.spans import cluster_rows, normalize_box, text_from_segments


def test_plain_text_passthrough():
    assert extract_main_text("hola  mundo \nsegunda linea") == "hola mundo\nsegunda linea"
    assert extract_main_text(None) == ""
    assert extract_main_text(b"") == ""


def test_html_strip_basics():
    html = (
        "<html><head><script>drop()</script><style>x{}</style></head>"
        "<body><p>TOTAL: 77,55€</p>"
        "<div><a href='/a'>inicio</a> <a href='/b'>contacto</a></div>"
        "<p>CORRELIMO HUELVA S.L.</p></body></html>"
    )
    out = extract_main_text(html)
    assert "TOTAL: 77,55" in out
    assert "CORRELIMO" in out
    assert "inicio" not in out  # link-density 1.0 nav dropped
    assert "drop()" not in out


def test_html_entities_and_digit_blocks():
    html = "<p>Garc&iacute;a &amp; Hijos S.L.</p><p>43001874</p>"
    out = extract_main_text(html)
    assert out == "García & Hijos S.L.\n43001874"


def test_value_shape_blocks_kept_even_when_linky():
    html = '<div><a href="/x">ver factura 12,34€</a></div>'
    assert "12,34" in extract_main_text(html)


def test_bytes_input_utf8():
    assert extract_main_text("<p>año 2025</p>".encode()) == "año 2025"


def test_line_content_mask():
    assert line_content_mask("CORRELIMO HUELVA S.L.")
    assert not line_content_mask("12345")
    assert not line_content_mask("29/05/2025")
    assert not line_content_mask("FACTURA 905")
    assert not line_content_mask("abc")  # too short
    assert not line_content_mask("x" * 121)


# ---- spans (T1): the byte-identical anchor --------------------------------

FULL = "Hello amazing world of documents"


def test_segments_basic():
    assert text_from_segments(FULL, [(0, 5)]) == "Hello"
    assert text_from_segments(FULL, [(0, 5), (13, 19)]) == "Hello world"
    # outer whitespace is trimmed (reference trims the concatenated result)
    assert text_from_segments(FULL, [(5, 14)]) == "amazing"


def test_segments_invalid_dropped():
    assert text_from_segments(FULL, [(-1, 5)]) == ""
    assert text_from_segments(FULL, [(0, 999)]) == ""
    assert text_from_segments(FULL, [(5, 5)]) == ""
    assert text_from_segments(FULL, [(None, 5)]) == ""
    assert text_from_segments(FULL, [(0, 5), (0, 999)]) == "Hello"
    assert text_from_segments(None, [(0, 5)]) == ""
    assert text_from_segments(FULL, None) == ""


def test_segments_missing_start_defaults_zero():
    # Document AI omits startIndex=0; callers feed 0 explicitly (index.ts:1110)
    assert text_from_segments(FULL, [(0, 5)]) == "Hello"


# ---- coordinates (T2) ------------------------------------------------------

def test_normalize_box_normalized_vertices():
    layout = {
        "boundingPoly": {
            "normalizedVertices": [
                {"x": 0.1, "y": 0.2},
                {"x": 0.5, "y": 0.2},
                {"x": 0.5, "y": 0.4},
                {"x": 0.1, "y": 0.4},
            ]
        }
    }
    box = normalize_box(layout, page_w=1000.0, page_h=2000.0)
    assert box == {"x": 100.0, "y": 400.0, "width": 400.0, "height": 400.0}


def test_normalize_box_pixel_vertices():
    layout = {"boundingPoly": {"vertices": [{"x": 10, "y": 20}, {"x": 110, "y": 70}]}}
    box = normalize_box(layout)
    assert box == {"x": 10.0, "y": 20.0, "width": 100.0, "height": 50.0}


def test_normalize_box_fallback_encodings():
    assert normalize_box({"boundingBox": {"vertices": [{"x": 1, "y": 2}, {"x": 3, "y": 4}]}}) == {
        "x": 1.0, "y": 2.0, "width": 2.0, "height": 2.0,
    }
    assert normalize_box({}) is None
    assert normalize_box(None) is None


# ---- row clustering (P1 generalization) ------------------------------------

def test_cluster_rows_by_y():
    toks = [
        {"x": 50, "y": 100, "h": 10, "t": "b"},
        {"x": 10, "y": 102, "h": 10, "t": "a"},
        {"x": 10, "y": 130, "h": 10, "t": "c"},
        {"x": 90, "y": 131, "h": 10, "t": "d"},
    ]
    rows = cluster_rows(toks, eps=6.0)
    assert [[t["t"] for t in row] for row in rows] == [["a", "b"], ["c", "d"]]


def test_cluster_rows_empty():
    assert cluster_rows([]) == []


def test_columnar_content_mask_matches_kernel(spark):
    """txt_content_lines' columnar T4 mask must agree with the Python
    kernel line_content_mask on every segment of the real corpus (the
    regex dialects and length/letter rules are meant to be the same
    operator in two execution forms)."""
    import re

    from pyspark.sql import functions as F

    from facturas_spark.extraction.boilerplate import line_content_mask

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    segs = [
        r["s"]
        for r in docs.select(
            F.explode(F.split(F.coalesce("text", F.lit("")), r"\.\s+")).alias("s")
        ).collect()
    ]
    cand = F.regexp_replace("raw", r"^\s+|\s+$", "")
    n = F.length(cand)
    letters = F.length(F.regexp_replace(cand, "[^a-zA-ZáéíóúüñÁÉÍÓÚÜÑ]", ""))
    keep = (
        (n >= 5) & (n <= 120)
        & ~cand.rlike(r"^\d+$")
        & ~cand.rlike(r"^\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4}$")
        & ~cand.rlike(r"(?i)^(factura|invoice|fecha|date|cliente|customer)")
        & (letters >= 4) & (letters >= n * 0.3)
    )
    sdf = spark.createDataFrame([(s,) for s in segs], "raw string").select(
        "raw", keep.alias("k")
    )
    got = {r["raw"]: r["k"] for r in sdf.collect()}
    for s in segs:
        assert got[s] == line_content_mask(s), repr(s)


def test_columnar_classifier_matches_kernel(spark):
    """c1_classify_documents' columnar cascade must agree with the Python
    kernel classify_document per document on the real corpus (same
    operator, two execution forms)."""
    from pyspark.sql import functions as F

    from facturas_spark.analytics.queries import c1_classify_documents
    from facturas_spark.extraction.textparse import classify_document

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("lang", "text").collect()
    expected = {}
    for r in docs:
        tipo, conf, razon = classify_document(r["text"])
        razon_tag = razon.split("=")[0]  # counts live in the tag suffix
        key = (r["lang"], tipo, conf, razon_tag)
        expected[key] = expected.get(key, 0) + 1
    got = {
        (r["lang"], r["tipo_documento"], r["confianza"], r["razonamiento"]): r["docs"]
        for r in c1_classify_documents(spark, sf).collect()
    }
    assert got == expected


def test_f8_columnar_variants_match_kernels(spark):
    """f8_date_variants' two year rules must equal the Python kernels
    (convert_to_iso_date: <50 -> 20xx else 19xx; parse_spanish_date:
    always +2000) on every synthesized token."""
    from facturas_spark.analytics.queries import f8_date_variants
    from facturas_spark.extraction.textparse import (
        convert_to_iso_date,
        parse_spanish_date,
    )

    rows = f8_date_variants(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert convert_to_iso_date(r["texto"]) == r["fecha_fallback"], r["texto"]
        assert parse_spanish_date(r["texto"]) == r["fecha_estricta"], r["texto"]
        assert r["coinciden"] == (r["fecha_fallback"] == r["fecha_estricta"])


def test_f7_columnar_variants_match_kernels(spark):
    """f7_amount_variants' columnar cascades must equal the Python kernels
    (parse_importe fallback with half-up 2dp; parse_spanish_amount strict,
    unrounded) on every synthesized token — including the '1,234'-shape
    disagreement row where the variants intentionally differ."""
    from facturas_spark.analytics.queries import f7_amount_variants
    from facturas_spark.extraction.textparse import (
        parse_importe,
        parse_spanish_amount,
    )

    rows = f7_amount_variants(spark, "/root/testdata/sf0.001").collect()
    assert rows
    saw_disagreement = False
    for r in rows:
        assert parse_importe(r["token"]) == r["importe_fallback"], r["token"]
        assert parse_spanish_amount(r["token"]) == r["importe_estricto"], r["token"]
        if not r["coinciden"]:
            saw_disagreement = True
    assert saw_disagreement  # the '1,234' / '1.234' shapes must split


def test_f2_columnar_matches_kernel(spark):
    """f2_invoice_number's candidate bank + shortest-pick must equal the
    full kernel pipeline's numero_factura on every synthesized text
    (pattern order, stable tie-break, keyword gate, SIN_NUMERO default)."""
    from facturas_spark.analytics.queries import f2_invoice_number
    from facturas_spark.extraction.textparse import extract_fields

    rows = f2_invoice_number(spark, "/root/testdata/sf0.001").collect()
    assert rows
    outcomes = set()
    for r in rows:
        assert extract_fields(r["texto"]).numero_factura == r["numero_factura"], (
            r["texto"],
            r["numero_factura"],
        )
        outcomes.add(r["escenario"])
    assert outcomes == set(range(6))  # every template synthesized


def test_f1_columnar_matches_kernel(spark):
    """f1_cif_extraction's bank + selection must equal the full kernel
    pipeline's proveedor_cif per text — including the quirk that a bare
    NIF (12345678Z) is invisible because pattern 4's alternatives carry
    no capture group, and the len>=9-else-first fallback."""
    from facturas_spark.analytics.queries import f1_cif_extraction
    from facturas_spark.extraction.textparse import extract_fields

    rows = f1_cif_extraction(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert extract_fields(r["texto"]).proveedor_cif == r["proveedor_cif"], (
            r["texto"],
            r["proveedor_cif"],
        )
    # the NIF-dropped scenario must really yield nothing
    assert all(r["proveedor_cif"] is None for r in rows if r["escenario"] == 3)
    # the short-fallback scenario picks a len-8 candidate
    assert all(
        r["proveedor_cif"] is not None and len(r["proveedor_cif"]) == 8
        for r in rows
        if r["escenario"] == 5
    )


def test_f4_f6_columnar_match_kernel_machinery(spark):
    """f4_f6_amount_banks must equal the kernel's candidate machinery
    (_extract_all banks + parse_importe + pick-max + tipo preference)
    per text — the pre-reconciliation selections F11 consumes."""
    from facturas_spark.analytics.queries import f4_f6_amount_banks
    from facturas_spark.extraction.textparse import (
        _PAT_BASE,
        _PAT_CUOTA,
        _PAT_TIPO,
        _PAT_TOTAL,
        _extract_all,
        parse_importe,
    )

    def bank_max(pats, texto, gate):
        if not any(ch.isdigit() for ch in texto) or not gate:
            return 0.0
        cands = sorted(
            (n for n in map(parse_importe, _extract_all(pats, texto)) if n > 0),
            reverse=True,
        )
        return cands[0] if cands else 0.0

    rows = f4_f6_amount_banks(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        t = r["texto"]
        low = t.lower()
        assert r["total_factura"] == bank_max(
            _PAT_TOTAL, t,
            any(w in low for w in ("total", "líquido", "liquido", "importe", "suma")),
        ), t
        assert r["base_imponible"] == bank_max(
            _PAT_BASE, t, any(w in low for w in ("base", "subtotal", "neto"))
        ), t
        assert r["cuota_iva"] == bank_max(
            _PAT_CUOTA, t, any(w in low for w in ("iva", "i.v.a", "cuota"))
        ), t
        tipos = []
        if any(ch.isdigit() for ch in t) and any(
            w in low for w in ("iva", "i.v.a", "al")
        ):
            for c in _extract_all(_PAT_TIPO, t):
                try:
                    n = int(c)
                except ValueError:
                    continue
                if 0 <= n <= 30:
                    tipos.append(n)
        exp_tipo = next((x for x in tipos if x in (4, 10, 21)), tipos[0] if tipos else 21)
        assert r["tipo_iva"] == exp_tipo, t
