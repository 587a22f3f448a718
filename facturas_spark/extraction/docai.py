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
                "tables": tables_out,
            }
        )
    return {"url": url, "text": text, "pages": pages_out}


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
