"""Google Document-AI JSON -> ``ocr_doc`` converter (SURVEY §1.1 row 2).

The reference consumes raw Document-AI responses (parsed at
process-invoice/index.ts:1084-1170; shape documented by the shipped
fixture dashboard-facturas-claude/JSON_MUESTRA). This module maps that
JSON into the engine's ``OCR_DOC_DDL`` row shape so real OCR payloads
flow through the same T1/T3/P1/F13 kernels as the synthetic corpus.

Document-AI proto conventions handled here:
- ``textSegments`` indices are strings; ``startIndex`` is omitted when 0
  (proto3 default elision — index.ts:1110 applies the same ``|| 0``).
- Multi-segment anchors are rare; the struct span keeps the first
  segment (identical to the reference's ``textSegments[0]`` reads at
  index.ts:1105-1120) — ``text_from_segments`` still validates bounds.
- Boxes come from ``normalize_box`` (T2's 5-encoding cascade) scaled by
  the page's pixel dimensions.

No code copied from the reference — semantics re-derived from the cited
lines and the public Document-AI schema.
"""

from __future__ import annotations

from typing import Any

from facturas_spark.extraction.spans import normalize_box

__all__ = [
    "docai_to_ocr_doc",
    "docai_form_fields",
    "docai_entities",
    "docai_walk_coordinates",
]


def _seg(layout: dict[str, Any] | None) -> tuple[int | None, int | None]:
    """First textSegment of a layout's textAnchor as (start, end) ints."""
    segs = ((layout or {}).get("textAnchor") or {}).get("textSegments") or []
    if not segs:
        return (None, None)
    s = segs[0]
    try:
        return (int(s.get("startIndex", 0)), int(s["endIndex"]))
    except (KeyError, TypeError, ValueError):
        return (None, None)


def _span(layout: dict[str, Any] | None, page_w: float, page_h: float) -> dict:
    start, end = _seg(layout)
    box = normalize_box(layout, page_w, page_h) or {}
    return {
        "start": start,
        "end": end,
        "x": box.get("x"),
        "y": box.get("y"),
        "w": box.get("width"),
        "h": box.get("height"),
        "conf": float((layout or {}).get("confidence") or 0.0),
    }


def docai_to_ocr_doc(doc: dict[str, Any], url: str = "docai://fixture") -> dict:
    """Map a Document-AI response dict to the OCR_DOC_DDL row shape."""
    text = doc.get("text") or ""
    pages_out = []
    for p_no, page in enumerate(doc.get("pages") or [], start=1):
        dim = page.get("dimension") or {}
        w = float(dim.get("width") or 595.0)
        h = float(dim.get("height") or 842.0)

        def spans(kind: str) -> list[dict]:
            return [_span(el.get("layout"), w, h) for el in (page.get(kind) or [])]

        tables_out = []
        for table in page.get("tables") or []:
            header_rows = table.get("headerRows") or []
            header_cells = [
                {"start": _seg(c.get("layout"))[0], "end": _seg(c.get("layout"))[1]}
                for c in (header_rows[0].get("cells") if header_rows else []) or []
            ]
            body_rows = [
                [
                    {"start": _seg(c.get("layout"))[0], "end": _seg(c.get("layout"))[1]}
                    for c in (row.get("cells") or [])
                ]
                for row in (table.get("bodyRows") or [])
            ]
            tables_out.append({"header_cells": header_cells, "body_rows": body_rows})

        pages_out.append(
            {
                "page_no": int(page.get("pageNumber") or p_no),
                "width": w,
                "height": h,
                "tokens": spans("tokens"),
                "lines": spans("lines"),
                "blocks": spans("blocks"),
                "paragraphs": spans("paragraphs"),
                "tables": tables_out,
            }
        )
    return {"url": url, "text": text, "pages": pages_out}


# the full-walk variant's containers, reference order + priors
# (process-invoice/index.ts:3923-3932): the first four mirror the T3 walk,
# the last four are the form-parser additions at a flat 0.8 prior
_WALK_CONTAINERS = (
    ("blocks", "block", 0.7),
    ("paragraphs", "paragraph", 0.75),
    ("lines", "line", 0.85),
    ("tokens", "token", 0.9),
    ("formFields", "formField", 0.8),
    ("tables", "table", 0.8),
    ("tableRows", "tableRow", 0.8),
    ("tableCells", "tableCell", 0.8),
)


def _anchor_text(text: str, layout: dict[str, Any] | None) -> str:
    """getTextFromAnchor over ALL textSegments (index.ts:3902-3918):
    concatenate every valid [start,end) slice, then trim."""
    from facturas_spark.extraction.spans import text_from_segments

    segs = ((layout or {}).get("textAnchor") or {}).get("textSegments") or []
    pairs = []
    for s in segs:
        try:
            pairs.append((int(s.get("startIndex", 0)), int(s["endIndex"])))
        except (KeyError, TypeError, ValueError):
            continue
    return text_from_segments(text, pairs)


def docai_walk_coordinates(doc: dict[str, Any]) -> dict[str, dict]:
    """T3 full-walk variant (process-invoice/index.ts:3894-3977): walk all
    EIGHT container kinds of a raw Document-AI response — blocks,
    paragraphs, lines, tokens at the layout priors plus formFields,
    tables, tableRows, tableCells at 0.8 — and emit the reference's
    ``coordenadasCampos`` map keyed ``pagina_{p}_{kind}_{i}`` (1-based).

    Text resolution follows the reference's fallback chain
    (index.ts:3941-3955): item.layout anchor, then fieldName anchor, then
    fieldValue anchor, then a 'Tabla: h1 | h2; ...' render of headerRows,
    then a 'Filas: ...' render of bodyRows; an element whose chain yields
    nothing gets the placeholder ``Elemento {kind} {i}``. Elements
    without resolvable coordinates are dropped (extractCoordinates
    returns null — index.ts:375-379)."""
    text = doc.get("text") or ""
    out: dict[str, dict] = {}
    for p_idx, page in enumerate(doc.get("pages") or []):
        dim = page.get("dimension") or {}
        w = float(dim.get("width") or 595.0)
        h = float(dim.get("height") or 842.0)
        for field, key, conf in _WALK_CONTAINERS:
            for i, item in enumerate(page.get(field) or []):
                item_text = ""
                if (item.get("layout") or {}).get("textAnchor"):
                    item_text = _anchor_text(text, item.get("layout"))
                elif (item.get("fieldName") or {}).get("textAnchor"):
                    item_text = _anchor_text(text, item.get("fieldName"))
                elif (item.get("fieldValue") or {}).get("textAnchor"):
                    item_text = _anchor_text(text, item.get("fieldValue"))
                elif item.get("headerRows"):
                    item_text = "Tabla: " + "; ".join(
                        " | ".join(
                            _anchor_text(text, c.get("layout"))
                            for c in (row.get("cells") or [])
                        )
                        for row in item["headerRows"]
                    )
                elif item.get("bodyRows"):
                    item_text = "Filas: " + "; ".join(
                        " | ".join(
                            _anchor_text(text, c.get("layout"))
                            for c in (row.get("cells") or [])
                        )
                        for row in item["bodyRows"]
                    )
                # coordinate precedence as in extractCoordinates: the
                # item's layout encodings first, then item-level boxes
                box = normalize_box(item.get("layout"), w, h) or normalize_box(
                    item, w, h
                )
                if box is None:
                    continue
                out[f"pagina_{p_idx + 1}_{key}_{i + 1}"] = {
                    **box,
                    "confidence": conf,
                    "texto": item_text or f"Elemento {key} {i + 1}",
                    "pagina": p_idx + 1,
                    "tipo": key,
                }
    return out


def docai_form_fields(doc: dict[str, Any]) -> list[tuple[str, str, float]]:
    """Flatten formFields to (name, value, confidence) tuples for F13.
    Text is reconstructed byte-identically from the anchor segments (T1),
    not read from the denormalized ``content`` copies."""
    from facturas_spark.extraction.spans import text_from_segments

    text = doc.get("text") or ""
    out: list[tuple[str, str, float]] = []
    for page in doc.get("pages") or []:
        for ff in page.get("formFields") or []:
            name_layout = ff.get("fieldName") or {}
            value_layout = ff.get("fieldValue") or {}
            name = text_from_segments(text, [_seg(name_layout)])
            value = text_from_segments(text, [_seg(value_layout)])
            conf = float(value_layout.get("confidence") or 0.0)
            out.append((name, value, conf))
    return out


def docai_entities(doc: dict[str, Any]) -> list[tuple[str, str, float]]:
    """Flatten entities to (type, mentionText, confidence) tuples for F14."""
    out: list[tuple[str, str, float]] = []
    for e in doc.get("entities") or []:
        out.append(
            (
                e.get("type") or "",
                e.get("mentionText") or "",
                float(e.get("confidence") or 0.0),
            )
        )
    return out
