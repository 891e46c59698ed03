"""PDF text extraction (ISO 32000, pure stdlib) — the second-largest
text carrier in a real web crawl after HTML.  A corpus engine that
cannot open PDFs silently drops a double-digit percentage of crawl
text; this module extracts what a no-dependency parser can extract
honestly and names what it cannot.

Scope (honest coverage, like the other ``*_codec`` modules):

- **Object / xref layer**: tolerant linear object scan (``N G obj`` …
  ``endobj``) rather than xref-driven random access — real crawl PDFs
  have broken xref tables more often than broken object syntax, and a
  linear scan is also the right shape for a one-pass stream parse.
- **Streams**: raw and ``FlateDecode`` content streams (zlib —
  stdlib).  That covers the overwhelming majority of text content
  streams; LZW/DCT/JBIG2 streams are image data and are skipped by
  construction (no ``BT`` text block after decode fails).
- **Text operators**: ``BT``/``ET`` blocks with ``Tj``, ``'``, ``"``
  and ``TJ`` shows; literal strings with the full escape set
  (``\\\\ \\( \\) \\n \\r \\t \\b \\f``, octal, line continuations)
  and hex strings; ``Td``/``TD``/``T*``/``Tm`` treated as line breaks.
- **Encoding**: single-byte text assumed Latin-1/StandardEncoding-ish
  (exact for the ASCII range).  CID/Type0 fonts with multi-byte CMaps
  (most CJK PDFs) need the font's ToUnicode table — named in the
  result as ``has_cid_font`` so a 100 TB triage can route those
  documents instead of silently garbling them.

Scale shape: extraction is a pure per-document function run as an
Arrow ``mapInPandas`` stage (map-only, no shuffle), exactly like the
image/audio codecs.

Reference parity: /root/reference has no document-format surface —
§7.5 extension scope.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CID_RE = re.compile(rb"/Subtype\s*/Type0\b")

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _parse_literal(b: bytes, pos: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at ``b[pos] == '('``; returns
    (decoded text, index just past the closing paren).  Handles the
    escape set, octal escapes, balanced unescaped parens, and
    backslash-newline continuations."""
    assert b[pos : pos + 1] == b"("
    out = []
    depth = 1
    i = pos + 1
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= b[j] <= 0x37:
                    j += 1
                out.append(chr(int(b[i:j], 8) & 0xFF))
                i = j
                continue
            if e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
                continue
            out.append(_ESCAPES.get(e, chr(e)))
            i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        out.append(chr(c))
        i += 1
    raise ValueError("malformed PDF payload: unterminated literal string")


def _parse_hex_string(b: bytes, pos: int) -> tuple[str, int]:
    """Parse ``<hex>`` starting at ``b[pos] == '<'`` (single-byte
    interpretation; odd final digit padded with 0 per spec)."""
    end = b.find(b">", pos)
    if end < 0:
        raise ValueError("malformed PDF payload: unterminated hex string")
    digits = re.sub(rb"\s+", b"", b[pos + 1 : end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), end + 1


_TJ_NUM_RE = re.compile(rb"[-+]?\d+(?:\.\d+)?")


def _stream_text(data: bytes) -> str:
    """Extract show-text strings from one decoded content stream, in
    operator order; text-positioning ops become newlines (deduped).
    Returns '' when the stream carries no BT/ET text block."""
    if b"BT" not in data:
        return ""
    out: list[str] = []
    pending: list[str] = []  # strings seen since the last operator

    def flush_show():
        if pending:
            out.append("".join(pending))
            pending.clear()

    def newline():
        pending.clear()
        if out and out[-1] != "\n":
            out.append("\n")

    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            pending.append(s)
            continue
        if c == 0x3C and data[i : i + 2] != b"<<":  # <hex>
            try:
                s, i = _parse_hex_string(data, i)
                pending.append(s)
            except ValueError:
                i += 1  # `<` inside non-string syntax (inline dict/image)
            continue
        if c == 0x5B:  # [ ... ] TJ array: strings already captured
            i += 1
            continue
        if data.startswith(b"TJ", i) or data.startswith(b"Tj", i):
            flush_show()
            i += 2
            continue
        if data.startswith(b"T*", i):
            newline()
            i += 2
            continue
        if data.startswith(b"Td", i) or data.startswith(b"TD", i):
            newline()
            i += 2
            continue
        if data.startswith(b"Tm", i):
            newline()
            i += 2
            continue
        if c in (0x27, 0x22):  # ' and ": move to next line, THEN show
            s = "".join(pending)
            pending.clear()
            if out and out[-1] != "\n":
                out.append("\n")
            if s:
                out.append(s)
            i += 1
            continue
        i += 1
    flush_show()
    text = "".join(out)
    return text.strip("\n")


def extract_pdf_text(payload: bytes) -> dict:
    """Parse a PDF and return ``n_pages``, ``pages`` (per-content-stream
    text, document order), ``text`` (pages joined with ``\\n``),
    ``title`` / ``author`` / ``producer`` (from the Info dictionary's
    literal strings, '' when absent), ``has_cid_font`` (True when a
    Type0/CID font is present — multi-byte text this parser does NOT
    decode), and ``version``.  Named ValueError on structural damage
    (bad header, unterminated strings)."""
    b = bytes(payload)
    if not b.startswith(b"%PDF-"):
        raise ValueError("malformed PDF payload: missing %PDF header")
    version = b[5 : b.find(b"\n", 5)].split(b"\r")[0].decode(
        "latin-1", "replace"
    )
    n_pages = 0
    pages: list[str] = []
    title = author = producer = ""
    has_cid = False
    for mobj in _OBJ_RE.finditer(b):
        body = mobj.group(3)
        head = body.split(b"stream", 1)[0]
        if _PAGE_RE.search(head):
            n_pages += 1
        if _CID_RE.search(head):
            has_cid = True
        for key, setter in (
            (b"/Title", "title"),
            (b"/Author", "author"),
            (b"/Producer", "producer"),
        ):
            kpos = head.find(key + b" (")
            if kpos < 0:
                kpos = head.find(key + b"(")
            if kpos >= 0:
                lpos = head.find(b"(", kpos)
                try:
                    val, _ = _parse_literal(head, lpos)
                except ValueError:
                    continue
                if setter == "title":
                    title = val
                elif setter == "author":
                    author = val
                else:
                    producer = val
        mstart = re.search(rb"stream\r?\n", body)
        if mstart is None:
            continue
        # Honor the declared /Length (direct form): the regex fallback
        # mis-frames streams whose LAST data byte is \r or \n (the
        # optional \r?\n before `endstream` eats it — real bug caught
        # by the oracle).  Indirect /Length (N 0 R) falls through.
        raw = None
        mlen = re.search(rb"/Length\s+(\d+)(?![\s\d]*R)", body[: mstart.start()])
        if mlen:
            start = mstart.end()
            length = int(mlen.group(1))
            tail = body[start + length : start + length + 16]
            if tail.lstrip(b"\r\n").startswith(b"endstream") or (
                not tail and body[start:].endswith(b"endstream")
            ):
                raw = body[start : start + length]
        if raw is None:
            ms = _STREAM_RE.search(body)
            if ms is None:
                continue
            raw = ms.group(1)
        data = raw
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(raw)
            except zlib.error:
                continue  # image or damaged stream: not text
        t = _stream_text(data)
        if t:
            pages.append(t)
    return {
        "version": version,
        "n_pages": n_pages,
        "pages": pages,
        "text": "\n".join(pages),
        "title": title,
        "author": author,
        "producer": producer,
        "has_cid_font": has_cid,
    }


# ---------------------------------------------------------------------------
# builder (fixtures + export sink capability)
# ---------------------------------------------------------------------------


def _escape_literal(s: str) -> bytes:
    out = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    return out.encode("latin-1", "replace")


def build_pdf(
    pages: list[list[str]],
    *,
    compress: bool = True,
    title: str = "",
    author: str = "",
    producer: str = "ebw-spark",
) -> bytes:
    """Serialize a spec-correct single-font PDF 1.4: one page object +
    one content stream per entry of ``pages`` (each a list of text
    lines shown with ``Tj``/``T*``), valid xref table and trailer, and
    an Info dictionary.  Deterministic bytes — fixture for
    :func:`extract_pdf_text` and a minimal report-export capability."""
    objs: list[bytes] = []  # 1-indexed object bodies (without N 0 obj)
    n_pg = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pg))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pg} >>".encode()
    )  # 2
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, ln in enumerate(lines):
            if j:
                content += b"T*\n"
            content += b"(" + _escape_literal(ln) + b") Tj\n"
        content += b"ET"
        data = bytes(content)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )  # 4 + 2i
        objs.append(
            b"<< "
            + filt
            + f"/Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )  # 5 + 2i
    info = (
        b"<< /Title ("
        + _escape_literal(title)
        + b") /Author ("
        + _escape_literal(author)
        + b") /Producer ("
        + _escape_literal(producer)
        + b") >>"
    )
    objs.append(info)
    info_num = len(objs)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R "
        f"/Info {info_num} 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def extract_pdf_text_batch(payloads):
    """Arrow-batch helper for ``mapInPandas``: Series of PDF payloads →
    DataFrame ``(version, n_pages, n_streams, n_chars, title,
    has_cid_font, text)``; per-row parse errors surface as
    ``version='invalid'`` rows (corruption is data at corpus scale)."""
    import pandas as pd

    rows = []
    for p in payloads:
        try:
            m = extract_pdf_text(bytes(p))
            rows.append(
                (
                    m["version"],
                    m["n_pages"],
                    len(m["pages"]),
                    sum(len(t) for t in m["pages"]),
                    m["title"],
                    m["has_cid_font"],
                    m["text"],
                )
            )
        except ValueError:
            rows.append(("invalid", 0, 0, 0, "", False, ""))
    return pd.DataFrame(
        rows,
        columns=[
            "version",
            "n_pages",
            "n_streams",
            "n_chars",
            "title",
            "has_cid_font",
            "text",
        ],
    )
