"""Minimal pure-stdlib PDF text source (writer + extractor).

The reference's primary input is invoice PDFs, which it ships to Google
Document AI for text+layout (process-invoice/index.ts). The engine's
deterministic-extraction north rule replaces the OCR call, but the
SOURCE format itself is fully public: a PDF content stream is PostScript
-like operators, and the text-bearing subset (BT/ET blocks, Tj/TJ/'/"
show operators, Td/TD/T* line moves, literal/hex strings, FlateDecode)
needs nothing beyond ``zlib`` + ``re``.

- :func:`encode_pdf`       — single-page Helvetica PDF from text lines
  (Flate-compressed content stream, correct xref) — the deterministic
  fixture generator.
- :func:`pdf_extract_text` — stream-object walk (by /Length when
  parseable, lazy ``endstream`` fallback), FlateDecode, then a linear
  tokenizer over the text operators: strings buffer onto the current
  line, Td/TD/T*/' start a new one. Escapes (\\( \\) \\\\ \\n octal)
  and nested parens handled; hex strings decoded; cp1252 byte text
  (the Helvetica/WinAnsi world of invoice PDFs).

The extraction pipeline picks this up automatically:
``boilerplate.extract_main_text`` routes payloads sniffing ``%PDF``
through :func:`pdf_extract_text` before its normal line normalization,
so PDF invoices flow through the SAME fused UDF as html/text pages.
Real-world PDFs beyond this subset (CID fonts, object streams,
encryption) need a real PDF library — documented gap, not faked.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf", "pdf_extract_text"]


def _esc(line: str) -> bytes:
    b = line.encode("cp1252", errors="replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def encode_pdf(lines: list[str]) -> bytes:
    """Deterministic single-page PDF carrying ``lines`` as Tj rows."""
    parts = [b"BT /F1 11 Tf 50 790 Td"]
    for i, line in enumerate(lines):
        if i:
            parts.append(b"0 -14 Td")
        parts.append(b"(" + _esc(line) + b") Tj")
    parts.append(b"ET")
    content = zlib.compress(b" ".join(parts))

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length "
        + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


_STREAM_DICT = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH = re.compile(rb"/Length\s+(\d+)")


def _content_streams(data: bytes) -> list[bytes]:
    streams = []
    for m in _STREAM_DICT.finditer(data):
        d, start = m.group(1), m.end()
        ln = _LENGTH.search(d)
        if ln:
            body = data[start : start + int(ln.group(1))]
        else:
            end = data.find(b"endstream", start)
            body = data[start : end if end >= 0 else len(data)]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        streams.append(body)
    return streams


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ( ... ) literal starting at s[i] == '('; returns (bytes,
    index past the closing paren). Handles escapes, octal, nesting."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                for _ in range(3):
                    if i < n and 0x30 <= s[i] <= 0x37:
                        val = val * 8 + (s[i] - 0x30)
                        i += 1
                    else:
                        break
                out.append(val & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


_OP = re.compile(rb"[A-Za-z'\"*]+")


def pdf_extract_text(payload: bytes) -> str:
    """Text of all content streams, one extracted line per Td/TD/T*/'
    text-position advance. Unknown constructs are skipped, never fatal."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for stream in _content_streams(bytes(payload)):
        i, n = 0, len(stream)
        in_text = False
        while i < n:
            c = stream[i]
            if c == 0x28:  # (
                raw, i = _parse_literal(stream, i)
                pending.append(raw.decode("cp1252", errors="replace"))
                continue
            if c == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # <hex>
                j = stream.find(b">", i)
                if j < 0:
                    break
                hx = re.sub(rb"\s", b"", stream[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                try:
                    pending.append(bytes.fromhex(hx.decode()).decode("cp1252", "replace"))
                except ValueError:
                    pass
                i = j + 1
                continue
            m = _OP.match(stream, i)
            if m:
                op = m.group(0)
                if op == b"BT":
                    in_text = True
                elif op == b"ET":
                    in_text = False
                    newline()
                elif in_text:
                    if op == b"Tj":
                        cur.extend(pending)
                    elif op == b"TJ":
                        cur.extend(pending)
                    elif op in (b"'", b'"'):
                        newline()
                        cur.extend(pending)
                    elif op in (b"Td", b"TD", b"T*"):
                        newline()
                pending.clear() if op in (b"Tj", b"TJ", b"'", b'"') else None
                i = m.end()
                continue
            i += 1
        newline()
        pending.clear()
    return "\n".join(lines)
