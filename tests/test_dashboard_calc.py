"""P14 dashboard multi-price calculator tests (smart-calculations.js parity)."""

from __future__ import annotations

import pytest

from facturas_spark.extraction.dashboard_calc import (
    detect_product_type,
    multiple_prices,
    parse_format,
)


@pytest.mark.parametrize(
    ("desc", "tipo"),
    [
        ("docena de huevos camperos", "huevos"),
        ("pollo entero fresco", "huevos"),  # quirk: 'pollo' is in the huevos set
        ("cerveza heineken pack", "bebida"),
        ("vino rioja crianza", "bebida"),
        ("chuleta de ternera", "carne"),
        ("merluza del cantábrico", "pescado"),
        ("queso manchego curado", "lacteo"),
        ("tomate de rama", "verdura"),
        ("croissant de mantequilla", "lacteo"),  # 'mantequilla' checked first
        ("croissant recién horneado", "panaderia"),
        ("destornillador philips", "general"),
        (None, "general"),
    ],
)
def test_detect_product_type(desc, tipo):
    assert detect_product_type(desc) == tipo


def test_parse_format_huevos_docena():
    f = parse_format(None, "2 docenas de huevos")
    assert f == {"tipo": "huevos", "unidades": 24, "formato_original": "2 docena"}


def test_parse_format_pack():
    f = parse_format("24x33cl", None)
    assert f["tipo"] == "bebida"
    assert f["unidades"] == 24
    assert f["volumen_por_unidad"] == pytest.approx(0.33)
    assert f["volumen_total"] == pytest.approx(7.92)
    f2 = parse_format("6x1l", None)
    assert f2["volumen_total"] == pytest.approx(6.0)
    f3 = parse_format("12x330ml", None)
    assert f3["volumen_total"] == pytest.approx(3.96)


def test_parse_format_peso_and_liquido():
    assert parse_format("2,5kg", None) == {
        "tipo": "peso", "peso": 2.5, "formato_original": "2,5kg",
    }
    assert parse_format("500 g", None)["peso"] == pytest.approx(0.5)
    liq = parse_format("75 cl", None)
    assert liq["tipo"] == "liquido"
    assert liq["volumen"] == pytest.approx(0.75)


def test_parse_format_wine_fallback():
    f = parse_format(None, "vino tempranillo reserva")
    assert f["tipo"] == "bebida"
    assert f["volumen_total"] == 0.75
    assert f["formato_original"] == "botella estándar 75cl"


def test_parse_format_none():
    assert parse_format(None, None) is None
    assert parse_format("", "cosa sin numeros ni tipo") is None


def test_multiple_prices_huevos():
    p = multiple_prices("huevos camperos", "30u", 6.0)
    assert p["precio_por_huevo"] == pytest.approx(0.2)
    assert p["precio_por_litro"] is None


def test_multiple_prices_pack_bebida():
    p = multiple_prices("cerveza cruzcampo", "24x33cl", 12.0)
    assert p["precio_por_unidad"] == pytest.approx(0.5)
    assert p["precio_por_litro"] == pytest.approx(12.0 / 7.92)


def test_multiple_prices_wine_by_units():
    # faithful quirk: the huevos pattern includes 'ud|u|unidades', so any
    # "N ud" format parses as tipo huevos and the bebida switch yields no
    # prices; only 'pcs'/'piezas' reach the JS unidades branch
    p_ud = multiple_prices("vino rioja", "6 ud", 30.0)
    assert p_ud["precio_por_unidad"] is None
    p = multiple_prices("vino rioja", "6 piezas", 30.0)
    assert p["precio_por_unidad"] == pytest.approx(5.0)
    assert p["precio_por_litro"] == pytest.approx(30.0 / 4.5)


def test_multiple_prices_carne_peso():
    p = multiple_prices("chuleta de ternera", "2kg", 24.0)
    assert p["precio_por_kg"] == pytest.approx(12.0)


def test_multiple_prices_lacteo_liquido():
    p = multiple_prices("leche entera", "1l", 0.9)
    assert p["precio_por_litro"] == pytest.approx(0.9)


def test_multiple_prices_no_formato():
    p = multiple_prices("cosa rara", None, 10.0)
    assert all(
        p[k] is None
        for k in (
            "precio_por_unidad", "precio_por_litro", "precio_por_kg",
            "precio_por_pieza", "precio_por_huevo",
        )
    )

def test_p14_columnar_matches_kernel(spark):
    """p14_multi_price's columnar cascades must equal the Python kernel
    multiple_prices per row — type detection (pollo -> huevos quirk),
    format parsing (docena x12, pack syntax, g->kg, cl->l, wine 75cl
    fallback, formato_comercial override) and the per-type fan-out."""
    from facturas_spark.analytics.queries import p14_multi_price
    from facturas_spark.extraction.dashboard_calc import multiple_prices

    sf = "/root/testdata/sf0.001"
    part = {
        r["p_partkey"]: r["p_retailprice"]
        for r in spark.read.parquet(f"{sf}/part.parquet")
        .filter("p_partkey <= 400")
        .collect()
    }
    rows = p14_multi_price(spark, sf).collect()
    assert rows
    seen_tipos = set()
    for r in rows:
        exp = multiple_prices(
            r["descripcion"], r["formato_comercial"], part[r["p_partkey"]]
        )
        assert r["tipo"] == exp["tipo"], r["descripcion"]
        exp_ft = exp["formato"]["tipo"] if exp["formato"] else None
        assert r["formato_tipo"] == exp_ft, r["descripcion"]
        for col in (
            "precio_por_huevo", "precio_por_unidad", "precio_por_litro",
            "precio_por_kg", "precio_por_pieza",
        ):
            assert r[col] == exp[col], (r["descripcion"], col, r[col], exp[col])
        seen_tipos.add((r["tipo"], r["formato_tipo"]))
    # the synthesis must exercise a broad (tipo, formato) cross-section
    assert len(seen_tipos) >= 12
