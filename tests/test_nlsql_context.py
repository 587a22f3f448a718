"""Q14 router + SQL safety gate + F10 context filter tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facturas_spark.analytics.nlsql import detect_query_type, is_sql_safe
from facturas_spark.matching.context import (
    smart_restaurant_filter,
    with_restaurant_filter,
)


@pytest.mark.parametrize(
    ("pregunta", "template"),
    [
        ("¿cuál es mi última factura?", "última_factura"),
        ("última factura recibida en el sistema", "ultima_factura_sistema"),
        ("facturas recientes de esta semana", "facturas_recientemente_recibidas"),
        ("¿cuántas facturas hay esta semana?", "facturas_esta_semana"),
        ("¿cuánto he gastado este mes?", "gasto_este_mes"),
        ("proveedores activos últimamente", "proveedores_activos"),
        ("¿qué producto he comprado más?", "productos_mas_comprados"),
        ("resumen del año", "resumen_anual"),
        ("top proveedores por gasto", "top_proveedores"),
        ("gasto por categoría", "productos_por_categoria"),
        ("hola buenas tardes", None),
    ],
)
def test_detect_query_type(pregunta, template):
    assert detect_query_type(pregunta) == template


def test_detect_query_type_rule_order():
    # 'última factura' + 'sistema' routes to the sistema variant, not the
    # plain one — rule order matters
    assert detect_query_type("última factura del sistema") == "ultima_factura_sistema"


RID = "abc-123"


@pytest.mark.parametrize(
    ("sql", "safe"),
    [
        (f"SELECT * FROM f WHERE restaurante_id = '{RID}'", True),
        (f"select total from f where restaurante_id = '{RID}' order by 1", True),
        ("SELECT * FROM f", False),                       # no tenant filter
        (f"DELETE FROM f WHERE restaurante_id = '{RID}'", False),
        (f"SELECT * FROM f WHERE restaurante_id = '{RID}'; DROP TABLE f; SELECT 1", False),
        (f"SELECT * FROM f WHERE restaurante_id = '{RID}' AND x IN (SELECT 1)", True),
        # faithful quirk: the dangerous-keyword check is substring-based, so
        # a column literally named 'created_at' trips the 'create' match
        (f"SELECT created_at FROM f WHERE restaurante_id = '{RID}'", False),
    ],
)
def test_is_sql_safe(sql, safe):
    assert is_sql_safe(sql, RID) is safe


INVOICE_TEXT = """FACTURA Nº 905
PROVEEDOR: CARNICAS DEL SUR S.A.
CIF: A11111111
FACTURAR A: RESTAURANTE PEPE
CLIENTE CIF: B22222222
"""


def test_smart_restaurant_filter_client_ok():
    ctx = smart_restaurant_filter(INVOICE_TEXT, "B22222222")
    assert ctx["found_cifs"] == ["A11111111", "B22222222"]
    assert ctx["has_restaurant_cif"] is True
    assert ctx["exclude_cif"] == "B22222222"
    # proveedor hits: FACTURA(+FACTURAR contains FACTURA), PROVEEDOR, VENDEDOR? ->
    # ['FACTURA','PROVEEDOR']; cliente hits: ['FACTURAR A','CLIENTE'] -> equal
    assert ctx["recomendacion"] == "restaurante_como_cliente"


def test_smart_restaurant_filter_supplier_warning():
    text = "FACTURA INVOICE EMISOR VENDEDOR\nCIF: B22222222"
    ctx = smart_restaurant_filter(text, "B22222222")
    assert ctx["recomendacion"] == "restaurante_como_proveedor"


def test_smart_restaurant_filter_no_own_cif():
    ctx = smart_restaurant_filter("FACTURA\nCIF: A11111111", "B99999999")
    assert ctx["has_restaurant_cif"] is False
    assert ctx["exclude_cif"] is None
    assert ctx["recomendacion"] == "sin_confusion"


def test_with_restaurant_filter_batch_parity(spark):
    docs = spark.createDataFrame(
        [
            ("r1", INVOICE_TEXT),
            ("r1", "FACTURA INVOICE EMISOR VENDEDOR\nCIF: B22222222"),
            ("r2", "FACTURA\nCIF: A11111111"),
        ],
        "restaurante_id string, extracted_text string",
    )
    own = spark.createDataFrame(
        [("r1", "B22222222"), ("r2", "B99999999")], "restaurante_id string, cif string"
    )
    rows = with_restaurant_filter(docs, own).collect()
    py = [
        smart_restaurant_filter(r.extracted_text, cif)
        for r, cif in zip(rows, ["B22222222", "B22222222", "B99999999"])
    ]
    for r, p in zip(rows, py):
        assert list(r.found_cifs) == p["found_cifs"]
        assert r.has_restaurant_cif == p["has_restaurant_cif"]
        assert r.recomendacion == p["recomendacion"]

# --- the two keyword extractors (distinct reference variants) -----------


def test_extraer_palabras_clave_q15_variant():
    from facturas_spark.analytics.nlsql import extraer_palabras_clave

    # JS \w is ASCII: accented letters are STRIPPED ('cuánto' -> 'cu nto')
    assert extraer_palabras_clave("¿cuánto he comprado de tomate?") == [
        "nto", "comprado", "tomate",
    ]
    # 35-word article list + pure-number filter + top 5
    assert extraer_palabras_clave("el total de las 123 facturas del mes") == [
        "total", "facturas", "mes",
    ]
    # 'uno' is NOT in the reference list (only un/una/unos/unas) — kept
    assert extraer_palabras_clave("uno dos tres cuatro cinco seis siete ocho") == [
        "uno", "dos", "tres", "cuatro", "cinco",
    ]


def test_extraer_palabras_clave_top5():
    from facturas_spark.analytics.nlsql import extraer_palabras_clave

    out = extraer_palabras_clave("alfa beta gama delta epsilon zeta eta")
    assert out == ["alfa", "beta", "gama", "delta", "epsilon"]


def test_extract_keywords_m2_variant():
    from facturas_spark.analytics.nlsql import extract_keywords_m2

    # accents SURVIVE in this variant; ñ too; top 3
    assert extract_keywords_m2("Jamón Ibérico de Bellota 5J") == [
        "jamón", "ibérico", "bellota",
    ]
    # 9-word article list only ('que' is NOT in it here)
    assert extract_keywords_m2("que pasa con los tomates") == ["que", "pasa", "tomates"]


def test_busqueda_hibrida_cascade(spark):
    from facturas_spark.analytics.nlsql import busqueda_hibrida

    SF = "/root/testdata/sf0.001"
    # template hit -> alta
    metodo, calidad, df = busqueda_hibrida(spark, SF, "resumen total del año")
    assert (metodo, calidad) == ("sql_exitoso", "alta")
    assert df.count() > 0
    # no template, keywords match product names -> textual_simple
    metodo2, calidad2, df2 = busqueda_hibrida(spark, SF, "necesito widget urgente")
    assert (metodo2, calidad2) == ("textual_simple", "baja")
    # no template, no keyword hits -> datos básicos (never empty)
    metodo3, calidad3, df3 = busqueda_hibrida(spark, SF, "zzzzxq qqzzy")
    assert (metodo3, calidad3) == ("fallback_basico", "minima")
    assert df3.count() == 15
