"""Span-anchored text reconstruction + layout geometry (T1-T3, P1 rows).

Pure-Python per-document kernels, batched via Arrow pandas UDFs:

- :func:`text_from_segments`  — T1 ``getTextFromAnchor``
  (process-invoice/index.ts:1738-1809): concatenate [start,end) substrings of
  the flat document text, dropping invalid segments; trim the result. This is
  the byte-identical north-rule anchor.
- :func:`normalize_box`       — T2 ``extractCoordinates``
  (process-invoice/index.ts:344-431): unify 5 bounding-box encodings and
  scale normalized 0-1 coords by page dims (default 595x842).
- :func:`cluster_rows`        — P1 generalization: segment layout tokens into
  visual rows by y-coordinate clustering (tokens whose vertical centers fall
  within eps of the running row mean join the row; rows then sort by y, and
  tokens within a row by x). The reference gets rows for free from Document
  AI's table structure (process-invoice/index.ts:2043-2130); over raw token
  boxes we must rebuild them.
"""

from __future__ import annotations

from typing import Any, Sequence

__all__ = ["text_from_segments", "normalize_box", "cluster_rows", "DEFAULT_PAGE_W", "DEFAULT_PAGE_H"]

DEFAULT_PAGE_W = 595.0
DEFAULT_PAGE_H = 842.0


def text_from_segments(
    full_text: str | None,
    segments: Sequence[tuple[int | None, int | None]] | None,
) -> str:
    """Concatenate valid ``full_text[start:end)`` segments, then trim.

    Validity per the reference: both indices present, integers, 0 <= start,
    end <= len(text), start < end. Invalid segments are skipped (not an
    error). Missing startIndex defaults are handled by the caller feeding 0
    (Document AI omits startIndex=0; see index.ts:1110).
    """
    if not full_text or not segments:
        return ""
    n = len(full_text)
    out: list[str] = []
    for seg in segments:
        if seg is None:
            continue
        start, end = seg
        if start is None or end is None:
            continue
        try:
            s, e = int(start), int(end)
        except (TypeError, ValueError):
            continue
        if 0 <= s < e <= n:
            out.append(full_text[s:e])
    return "".join(out).strip()


def normalize_box(
    layout: dict[str, Any] | None,
    page_w: float = DEFAULT_PAGE_W,
    page_h: float = DEFAULT_PAGE_H,
) -> dict[str, float] | None:
    """Unify bounding-box encodings to pixel {x, y, width, height}.

    Encodings tried in the reference's order (index.ts:344-431):
    layout.boundingPoly.normalizedVertices, layout.boundingPoly.vertices,
    boundingBox.vertices, boundingPoly.normalizedVertices/vertices at top
    level. Coordinates where all values are <= 1 are treated as normalized
    and scaled by the page dims.
    """
    if not layout:
        return None
    candidates: list[list[dict[str, float]]] = []
    bp = layout.get("boundingPoly") or {}
    bb = layout.get("boundingBox") or {}
    for verts in (
        bp.get("normalizedVertices"),
        bp.get("vertices"),
        bb.get("vertices"),
        layout.get("normalizedVertices"),
        layout.get("vertices"),
    ):
        if verts:
            candidates.append(verts)
    for verts in candidates:
        xs = [float(v.get("x", 0.0) or 0.0) for v in verts]
        ys = [float(v.get("y", 0.0) or 0.0) for v in verts]
        if not xs or not ys:
            continue
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        if x1 <= 1.0 and y1 <= 1.0:  # normalized
            x0, x1 = x0 * page_w, x1 * page_w
            y0, y1 = y0 * page_h, y1 * page_h
        return {"x": x0, "y": y0, "width": x1 - x0, "height": y1 - y0}
    return None


def cluster_rows(
    tokens: Sequence[dict[str, Any]],
    eps: float = 6.0,
) -> list[list[dict[str, Any]]]:
    """Group layout tokens into visual rows by y-center proximity.

    Deterministic single-pass: sort tokens by (y_center, x), open a new row
    whenever a token's y-center is more than ``eps`` below the current row's
    running mean; within each row, tokens sort by x. Returns rows top-to-
    bottom. ``eps`` defaults to 6px (≈ half a text line at 842px page
    height); callers scale it with page height.
    """
    if tokens is None or len(tokens) == 0:  # len(): ndarray-safe truthiness
        return []

    def y_center(t: dict[str, Any]) -> float:
        return float(t.get("y", 0.0)) + float(t.get("h", t.get("height", 0.0))) / 2.0

    ordered = sorted(tokens, key=lambda t: (y_center(t), float(t.get("x", 0.0))))
    rows: list[list[dict[str, Any]]] = []
    row_sum = 0.0
    for tok in ordered:
        yc = y_center(tok)
        if rows and abs(yc - row_sum / len(rows[-1])) <= eps:
            rows[-1].append(tok)
            row_sum += yc
        else:
            rows.append([tok])
            row_sum = yc
    for row in rows:
        row.sort(key=lambda t: float(t.get("x", 0.0)))
    return rows
