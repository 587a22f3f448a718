"""P14 — dashboard multi-price calculator (smart-calculations.js).

Faithful reimplementation of the browser-side JS at
/root/reference/dashboard-facturas-claude/smart-calculations.js:13-273:

- :func:`detect_product_type` — 8-category regex cascade (:13-52), exact
  rule order (huevos beats bebida beats carne ...; note 'pollo' appears in
  BOTH the huevos and carne sets — huevos wins, a preserved quirk).
- :func:`parse_format`        — format parser (:55-169): egg counts
  (docena x12), pack syntax ``24x33cl``, weights, unit counts, liquids,
  wine fallback (standard 75cl bottle).
- :func:`multiple_prices`     — per-type price fan-out (:172-273):
  €/huevo, €/unidad, €/litro (wine-by-units assumes 0.75 l/bottle),
  €/kg, €/pieza.

Pure Python kernels (used inside Arrow UDFs / tests); no Spark deps here.
"""

from __future__ import annotations

import re

__all__ = ["detect_product_type", "parse_format", "multiple_prices"]

_I = re.IGNORECASE

_TYPE_RULES: list[tuple[str, re.Pattern[str]]] = [
    ("huevos", re.compile(r"(huevo|huevos|egg|eggs|clara|yema|gallina|pollo)", _I)),
    (
        "bebida",
        re.compile(
            r"(cerveza|vino|refresco|agua|zumo|bebida|heineken|cruzcampo|estella|"
            r"mahou|san miguel|estrella|damm|amstel|corona|budweiser|guinness|"
            r"paulaner|franziskaner|klein|radler|sin alcohol|0\.0|0,0|amontillado|"
            r"fino|oloroso|pedro ximenez|manzanilla|palo cortado|verdejo|albariño|"
            r"godello|mencía|garnacha|tempranillo|rioja|ribera|chardonnay|"
            r"sauvignon blanc|pinot noir|merlot|cabernet|syrah|shiraz|malbec)",
            _I,
        ),
    ),
    (
        "carne",
        re.compile(
            r"(chuleta|pollo|ternera|cerdo|carne|filete|lomo|solomillo|entrecot|"
            r"costilla|panceta|jamón|salchicha|hamburguesa|albóndiga|salchichón|"
            r"chorizo|morcilla|butifarra)",
            _I,
        ),
    ),
    (
        "pescado",
        re.compile(
            r"(pescado|merluza|salmón|atún|gambas|langostinos|calamares|pulpo|"
            r"sepia|bacalao|lubina|dorada|rodaballo|rape|pescadilla|boquerones|"
            r"sardinas|anchoas)",
            _I,
        ),
    ),
    (
        "lacteo",
        re.compile(
            r"(leche|queso|yogur|mantequilla|nata|crema|helado|cuajada|requesón|"
            r"ricotta|mozzarella|gouda|cheddar|parmesano|manchego|roquefort|brie|"
            r"camembert)",
            _I,
        ),
    ),
    (
        "verdura",
        re.compile(
            r"(lechuga|tomate|cebolla|patata|zanahoria|manzana|naranja|plátano|"
            r"fresa|uva|melón|sandía|pimiento|berenjena|calabacín|pepino|"
            r"espinaca|acelga)",
            _I,
        ),
    ),
    (
        "panaderia",
        re.compile(
            r"(pan|bollo|croissant|donut|magdalena|galleta|pastel|tarta|bizcocho|"
            r"rosquilla|churro|ensaimada|brioche)",
            _I,
        ),
    ),
]


def detect_product_type(descripcion: str | None) -> str:
    if not descripcion:
        return "general"
    d = descripcion.lower()
    for tipo, pat in _TYPE_RULES:
        if pat.search(d):
            return tipo
    return "general"


_HUEVOS = re.compile(r"(\d+)\s*(ud|u|huevos?|unidades?|docena|docenas)", _I)
_PACK = re.compile(r"(\d+)x(\d+(?:[.,]\d+)?)\s*(cl|ml|l|litro|litros)", _I)
_PESO = re.compile(r"(\d+(?:[.,]\d+)?)\s*(kg|g|gramos|kilos)", _I)
_UNIDADES = re.compile(r"(\d+)\s*(ud|unidades|pcs|piezas|unidad)", _I)
_LIQUIDO = re.compile(r"(\d+(?:[.,]\d+)?)\s*(l|ml|cl|litro|litros)", _I)
_VINO = re.compile(
    r"(vino|amontillado|fino|oloroso|pedro ximenez|manzanilla|palo cortado|"
    r"verdejo|albariño|godello|mencía|garnacha|tempranillo|rioja|ribera|"
    r"chardonnay|sauvignon blanc|pinot noir|merlot|cabernet|syrah|shiraz|malbec)",
    _I,
)


def parse_format(formato: str | None, descripcion: str | None) -> dict | None:
    """JS parseFormat: first-match cascade over (formato or descripcion)."""
    if not formato and not descripcion:
        return None
    text = (formato or descripcion or "").lower()

    m = _HUEVOS.search(text)
    if m:
        unidades = int(m.group(1))
        unidad = m.group(2).lower()
        if unidad in ("docena", "docenas"):
            unidades *= 12
        return {"tipo": "huevos", "unidades": unidades, "formato_original": m.group(0)}

    m = _PACK.search(text)
    if m:
        unidades = int(m.group(1))
        vol = float(m.group(2).replace(",", "."))
        unidad = m.group(3).lower()
        vol_l = vol / 100 if unidad == "cl" else vol / 1000 if unidad == "ml" else vol
        return {
            "tipo": "bebida",
            "unidades": unidades,
            "volumen_por_unidad": vol_l,
            "volumen_total": unidades * vol_l,
            "formato_original": m.group(0),
        }

    m = _PESO.search(text)
    if m:
        peso = float(m.group(1).replace(",", "."))
        unidad = m.group(2).lower()
        if unidad in ("g", "gramos"):
            peso /= 1000
        return {"tipo": "peso", "peso": peso, "formato_original": m.group(0)}

    m = _UNIDADES.search(text)
    if m:
        return {
            "tipo": "unidades",
            "unidades": int(m.group(1)),
            "formato_original": m.group(0),
        }

    m = _LIQUIDO.search(text)
    if m:
        vol = float(m.group(1).replace(",", "."))
        unidad = m.group(2).lower()
        vol_l = vol / 100 if unidad == "cl" else vol / 1000 if unidad == "ml" else vol
        return {"tipo": "liquido", "volumen": vol_l, "formato_original": m.group(0)}

    if _VINO.search(text):
        return {
            "tipo": "bebida",
            "unidades": 1,
            "volumen_por_unidad": 0.75,
            "volumen_total": 0.75,
            "formato_original": "botella estándar 75cl",
        }
    return None


def multiple_prices(
    descripcion: str | None,
    formato_comercial: str | None,
    precio_unitario_sin_iva: float | None,
    cantidad: float | None = 1.0,
) -> dict:
    """JS calculateMultiplePrices: per-type price fan-out."""
    tipo = detect_product_type(descripcion)
    formato = parse_format(formato_comercial, descripcion)
    precio = precio_unitario_sin_iva or 0.0
    out = {
        "tipo": tipo,
        "formato": formato,
        "precio_unitario": precio,
        "precio_por_unidad": None,
        "precio_por_litro": None,
        "precio_por_kg": None,
        "precio_por_pieza": None,
        "precio_por_huevo": None,
    }
    if not formato:
        return out
    ft = formato["tipo"]
    if tipo == "huevos":
        if ft == "huevos":
            out["precio_por_huevo"] = precio / formato["unidades"]
    elif tipo == "bebida":
        if ft == "bebida":
            out["precio_por_unidad"] = precio / formato["unidades"]
            out["precio_por_litro"] = precio / formato["volumen_total"]
        elif ft == "unidades":
            out["precio_por_unidad"] = precio / formato["unidades"]
            out["precio_por_litro"] = precio / (formato["unidades"] * 0.75)
    elif tipo in ("carne", "pescado"):
        if ft == "peso":
            out["precio_por_kg"] = precio / formato["peso"]
        elif ft == "unidades":
            out["precio_por_pieza"] = precio / formato["unidades"]
    elif tipo == "lacteo":
        if ft == "liquido":
            out["precio_por_litro"] = precio / formato["volumen"]
        elif ft == "peso":
            out["precio_por_kg"] = precio / formato["peso"]
    elif tipo in ("verdura", "panaderia"):
        if ft == "peso":
            out["precio_por_kg"] = precio / formato["peso"]
        elif ft == "unidades":
            out["precio_por_pieza"] = precio / formato["unidades"]
    return out
