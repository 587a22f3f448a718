"""Golden end-to-end: byte-identical extraction over the synthetic corpus.

Every field expectation is known by construction (synth.py chooses values
so the reference's candidate-selection rules are unambiguous); the html
wrapper round-trips through the boilerplate strip byte-identically.
"""

from __future__ import annotations

from facturas_spark.extraction.boilerplate import extract_main_text
from facturas_spark.extraction.textparse import classify_document, extract_fields
from facturas_spark.synth import gen_corpus

CORPUS = gen_corpus(200, seed=42)


def test_html_roundtrip_byte_identical():
    for d in CORPUS:
        if d.text is not None:
            assert extract_main_text(d.html) == d.text, d.url


def test_classification_golden():
    for d in CORPUS:
        text = d.text if d.text is not None else extract_main_text(d.html)
        tipo, conf, _ = classify_document(text)
        assert tipo == d.doc_type, d.url
        assert conf == 0.95


def test_fields_byte_identical():
    for d in CORPUS:
        text = d.text if d.text is not None else extract_main_text(d.html)
        f = extract_fields(text)
        assert f.proveedor_nombre == d.exp_proveedor, d.url
        assert f.proveedor_cif == d.exp_cif, d.url
        assert f.numero_factura == d.exp_numero, d.url
        assert f.fecha_factura == d.exp_fecha, d.url
        assert f.total_factura == d.exp_total, d.url
        assert f.base_imponible == d.exp_base, d.url
        assert f.cuota_iva == d.exp_cuota, d.url
        if d.doc_type == "factura":
            assert f.tipo_iva == d.exp_tipo, d.url


def test_determinism_same_seed():
    a = gen_corpus(20, seed=7)
    b = gen_corpus(20, seed=7)
    assert [(d.url, d.text, d.html) for d in a] == [(d.url, d.text, d.html) for d in b]


def test_host_skew_present():
    from collections import Counter

    hosts = Counter(d.url.split("/")[2] for d in gen_corpus(500, seed=42))
    top = hosts.most_common(1)[0][1]
    assert top / 500 > 0.2  # Zipf head dominates -> skew handling is exercised
