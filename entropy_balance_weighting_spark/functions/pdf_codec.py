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
  (exact for the ASCII range).  CID/Type0 fonts (most CJK PDFs) decode
  through their ``/ToUnicode`` CMap when one is embedded (bfchar +
  both bfrange forms, UTF-16BE destinations incl. multi-code-unit
  ligatures; 2-byte Identity-H CID convention): the extractor maps
  font NAMES to CMaps via each PAGE's ``/Font`` resource dictionary
  (inline or one ``/Resources N 0 R`` hop; same-named fonts on
  different pages route to their own CMaps — r13 closed the old
  document-wide-merge collision; a document-wide merged map remains
  the fallback for content streams no parsed page claims),
  tracks the active font across ``Tf`` operators, and decodes show
  strings pairwise through the active font's CMap (unmapped CIDs →
  U+FFFD).  ``has_cid_font`` still reports Type0 presence;
  ``cid_decoded`` reports whether a usable ToUnicode map was found —
  Type0 WITHOUT ToUnicode keeps the flagged-row routing path.

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
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTREF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_RESREF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_OBJREF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+[\d.]+\s+Tf\b")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_BFCHAR_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BFRANGE_ENTRY_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)"
)

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


def _parse_hex_string(b: bytes, pos: int) -> tuple[bytes, int]:
    """Parse ``<hex>`` starting at ``b[pos] == '<'`` into RAW bytes
    (odd final digit padded with 0 per spec); the caller decodes via
    the active font's convention (latin-1 or a ToUnicode CMap)."""
    end = b.find(b">", pos)
    if end < 0:
        raise ValueError("malformed PDF payload: unterminated hex string")
    digits = re.sub(rb"\s+", b"", b[pos + 1 : end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), end + 1


def _stream_bytes(body: bytes) -> bytes | None:
    """Frame one object's stream payload: honor the direct ``/Length``
    when its endpoint lands on ``endstream`` (the regex fallback strips
    a final ``\\r``/``\\n`` DATA byte — fatal for compressed streams
    whose last byte happens to be 0x0A; the content-stream path learned
    this from the oracle, and the ToUnicode path inherits the fix);
    fall back to regex framing otherwise (indirect /Length N 0 R,
    corrupted declarations)."""
    mstart = re.search(rb"stream\r?\n", body)
    if mstart is None:
        return None
    mlen = re.search(rb"/Length\s+(\d+)(?![\s\d]*R)", body[: mstart.start()])
    if mlen:
        start = mstart.end()
        length = int(mlen.group(1))
        tail = body[start + length : start + length + 16]
        if tail.lstrip(b"\r\n").startswith(b"endstream") or (
            not tail and body[start:].endswith(b"endstream")
        ):
            return body[start : start + length]
    ms = _STREAM_RE.search(body)
    return None if ms is None else ms.group(1)


def _decode_shown(raw: bytes, cmap: dict[int, str] | None) -> str:
    """Bytes of one show string → text: latin-1 for simple fonts,
    pairwise 2-byte CIDs through the ToUnicode CMap for CID fonts
    (Identity-H convention; unmapped CIDs and an odd trailing byte
    become U+FFFD — visible, never silently dropped)."""
    if cmap is None:
        return raw.decode("latin-1")
    out = []
    n = len(raw) - 1
    i = 0
    while i < n:
        out.append(cmap.get((raw[i] << 8) | raw[i + 1], "�"))
        i += 2
    if len(raw) % 2:
        out.append("�")
    return "".join(out)


def _parse_tounicode(body: bytes | None) -> dict[int, str] | None:
    """Parse a ``/ToUnicode`` CMap stream object into {CID: text}:
    ``bfchar`` pairs plus BOTH ``bfrange`` forms (incrementing
    destination ``<lo> <hi> <dst>`` — the LAST UTF-16 code unit
    increments per spec — and the explicit array form).  Destinations
    are UTF-16BE, possibly multi-code-unit (ligatures).  Returns None
    when no stream or no mappings parse (the caller keeps the
    flagged-undecoded path)."""
    if body is None:
        return None
    head = body.split(b"stream", 1)[0]
    data = _stream_bytes(body)
    if data is None:
        return None
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None

    def utf16(hexdigits: bytes) -> str:
        raw = bytes.fromhex(hexdigits.decode("ascii"))
        return raw.decode("utf-16-be", "replace")

    cmap: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(data):
        for src, dst in _BFCHAR_PAIR_RE.findall(block):
            cmap.setdefault(int(src, 16), utf16(dst))
    for block in _BFRANGE_RE.findall(data):
        for lo, hi, dst in _BFRANGE_ENTRY_RE.findall(block):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i < lo_i or hi_i - lo_i > 0xFFFF:
                continue  # malformed / absurd range: skip, stay tolerant
            if dst.startswith(b"["):
                # array form: one <hex> destination per code in the range
                items = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for k, item in enumerate(items):
                    if lo_i + k > hi_i:
                        break
                    cmap.setdefault(lo_i + k, utf16(item))
            else:
                base = bytes.fromhex(dst[1:-1].decode("ascii"))
                if len(base) < 2:
                    base = b"\x00" + base
                prefix, last = base[:-2], int.from_bytes(base[-2:], "big")
                for k in range(hi_i - lo_i + 1):
                    unit = (last + k) & 0xFFFF
                    cmap.setdefault(
                        lo_i + k,
                        (prefix + unit.to_bytes(2, "big")).decode(
                            "utf-16-be", "replace"
                        ),
                    )
    return cmap or None


_TJ_NUM_RE = re.compile(rb"[-+]?\d+(?:\.\d+)?")


def _stream_text(
    data: bytes, font_cmaps: dict[str, dict[int, str]] | None = None
) -> str:
    """Extract show-text strings from one decoded content stream, in
    operator order; text-positioning ops become newlines (deduped).
    ``font_cmaps`` maps font resource NAMES (the ``/F1`` of ``Tf``) to
    ToUnicode CMaps: show strings under a mapped font decode as 2-byte
    CIDs through it, everything else stays latin-1.  Returns '' when
    the stream carries no BT/ET text block."""
    if b"BT" not in data:
        return ""
    out: list[str] = []
    pending: list[str] = []  # strings seen since the last operator

    # active-font tracking: all Tf operators up front, consumed as the
    # scan passes them (cheap, and keeps the byte loop branch-free)
    tf_events: list[tuple[int, str]] = []
    if font_cmaps:
        tf_events = [
            (m.start(), m.group(1).decode("latin-1"))
            for m in _TF_RE.finditer(data)
        ]
    tf_idx = 0
    cmap: dict[int, str] | None = None

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
        while tf_idx < len(tf_events) and tf_events[tf_idx][0] <= i:
            cmap = (font_cmaps or {}).get(tf_events[tf_idx][1])
            tf_idx += 1
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            pending.append(
                _decode_shown(s.encode("latin-1"), cmap) if cmap else s
            )
            continue
        if c == 0x3C and data[i : i + 2] != b"<<":  # <hex>
            try:
                raw, i = _parse_hex_string(data, i)
                pending.append(_decode_shown(raw, cmap))
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
    Type0/CID font is present), ``cid_decoded`` (True when at least one
    font carried a parseable ``/ToUnicode`` CMap — multi-byte show
    strings under those fonts decode to real text; Type0 WITHOUT
    ToUnicode stays flagged-undecoded), and ``version``.  Named
    ValueError on structural damage (bad header, unterminated
    strings)."""
    b = bytes(payload)
    if not b.startswith(b"%PDF-"):
        raise ValueError("malformed PDF payload: missing %PDF header")
    version = b[5 : b.find(b"\n", 5)].split(b"\r")[0].decode(
        "latin-1", "replace"
    )
    objects = [(int(m.group(1)), m.group(3)) for m in _OBJ_RE.finditer(b)]
    by_num = dict(objects)  # last definition wins, like real readers

    # ToUnicode CMaps: font OBJECT → CMap, then a document-wide merged
    # font-NAME → CMap map (fallback only — per-page tables below take
    # precedence for content streams a parsed Page object claims)
    obj_cmap: dict[int, dict[int, str]] = {}
    for num, body in objects:
        head = body.split(b"stream", 1)[0]
        mt = _TOUNI_RE.search(head)
        if mt is not None:
            cm = _parse_tounicode(by_num.get(int(mt.group(1))))
            if cm:
                obj_cmap[num] = cm
    font_cmaps: dict[str, dict[int, str]] = {}
    if obj_cmap:
        for _num, body in objects:
            head = body.split(b"stream", 1)[0]
            for fm in _FONTDICT_RE.finditer(head):
                for name, fnum in _FONTREF_RE.findall(fm.group(1)):
                    fn = int(fnum)
                    if fn in obj_cmap:
                        font_cmaps.setdefault(
                            name.decode("latin-1"), obj_cmap[fn]
                        )

    # PER-PAGE routing (r13): each Page object's /Contents stream(s)
    # decode through THAT page's own /Font → CMap table (inline
    # resources or a /Resources N 0 R indirection), so two different
    # CID fonts that share a resource name on different pages no
    # longer route through one document-wide merged map.  Pages whose
    # font dictionary the tolerant scan cannot locate fall back to the
    # merged map (old behavior); pages whose fonts carry no parseable
    # ToUnicode get an EMPTY table — flagged-undecoded, never
    # mis-decoded through another page's same-named font.
    stream_fontmaps: dict[int, dict[str, dict[int, str]]] = {}
    if obj_cmap:
        for _num, body in objects:
            head = body.split(b"stream", 1)[0]
            if not _PAGE_RE.search(head):
                continue
            fonts_src = head
            if _FONTDICT_RE.search(fonts_src) is None:
                mres = _RESREF_RE.search(head)
                if mres is None:
                    continue  # no locatable resources: merged-map fallback
                ref_body = by_num.get(int(mres.group(1)))
                if ref_body is None:
                    continue
                fonts_src = ref_body.split(b"stream", 1)[0]
                if _FONTDICT_RE.search(fonts_src) is None:
                    continue
            pagemap: dict[str, dict[int, str]] = {}
            for fm in _FONTDICT_RE.finditer(fonts_src):
                for name, fnum in _FONTREF_RE.findall(fm.group(1)):
                    fn = int(fnum)
                    if fn in obj_cmap:
                        pagemap.setdefault(
                            name.decode("latin-1"), obj_cmap[fn]
                        )
            marr = _CONTENTS_ARR_RE.search(head)
            refs = (
                _OBJREF_RE.findall(marr.group(1))
                if marr is not None
                else [
                    m.group(1) for m in _CONTENTS_REF_RE.finditer(head)
                ]
            )
            for ref in refs:
                stream_fontmaps[int(ref)] = pagemap

    n_pages = 0
    pages: list[str] = []
    title = author = producer = ""
    has_cid = False
    for _num, body in objects:
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
        raw = _stream_bytes(body)  # /Length-honoring framing (see helper)
        if raw is None:
            continue
        data = raw
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(raw)
            except zlib.error:
                continue  # image or damaged stream: not text
        if b"beginbfchar" in data or b"beginbfrange" in data:
            continue  # a ToUnicode CMap stream is metadata, not page text
        fm = stream_fontmaps.get(_num, font_cmaps)
        t = _stream_text(data, fm or None)
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
        "cid_decoded": bool(font_cmaps),
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


def _utf16_hex(c: str) -> str:
    """UTF-16BE hex of one character — 4 hex digits for BMP, 8 (a
    surrogate pair) for supplementary-plane characters; exactly what a
    spec-correct ``/ToUnicode`` bfchar destination carries."""
    return c.encode("utf-16-be").hex().upper()


def _cid_cmap_data(chars: list[str], cid_of: dict[str, int], use_bfrange: bool) -> bytes:
    """The ToUnicode CMap stream body for a char→CID assignment."""
    if use_bfrange:
        # contiguous CID runs whose chars are ALSO codepoint-contiguous;
        # the incrementing form bumps the LAST UTF-16 code unit, so runs
        # only chain within the BMP — a supplementary-plane char becomes
        # its own 1-length range with a surrogate-pair destination
        # (prefix + last-unit arithmetic is exact at k=0)
        entries: list[bytes] = []
        i = 0
        while i < len(chars):
            j = i
            while (
                j + 1 < len(chars)
                and ord(chars[j]) < 0xFFFF
                and ord(chars[j + 1]) == ord(chars[j]) + 1
            ):
                j += 1
            entries.append(
                f"<{cid_of[chars[i]]:04X}> <{cid_of[chars[j]]:04X}> "
                f"<{_utf16_hex(chars[i])}>".encode()
            )
            i = j + 1
        body_lines = (
            [f"{len(entries)} beginbfrange".encode()]
            + entries
            + [b"endbfrange"]
        )
    else:
        entries = [
            f"<{cid_of[c]:04X}> <{_utf16_hex(c)}>".encode() for c in chars
        ]
        body_lines = (
            [f"{len(entries)} beginbfchar".encode()]
            + entries
            + [b"endbfchar"]
        )
    return b"\n".join(
        [
            b"/CIDInit /ProcSet findresource begin",
            b"begincmap",
            b"1 begincodespacerange",
            b"<0000> <FFFF>",
            b"endcodespacerange",
        ]
        + body_lines
        + [b"endcmap", b"end"]
    )


def build_pdf_cid(
    pages: list[list[str]],
    *,
    compress: bool = True,
    title: str = "",
    author: str = "",
    producer: str = "ebw-spark",
    with_tounicode: bool = True,
    use_bfrange: bool = False,
    per_page_fonts: bool = False,
) -> bytes:
    """Serialize a PDF whose text uses a Type0 (CID) font with
    Identity-H 2-byte show strings and an embedded ``/ToUnicode`` CMap —
    the fixture for the CID decode path (and a minimal CJK-capable
    report export).  Each distinct character gets CID = 1 + its index
    in sorted order; the CMap carries the inverse mapping as ``bfchar``
    pairs (or, with ``use_bfrange=True``, one incrementing ``bfrange``
    per contiguous codepoint run — both forms the extractor must
    parse).  Supplementary-plane characters encode as UTF-16BE
    surrogate-pair destinations (spec-correct; no BMP restriction).
    ``with_tounicode=False`` omits the CMap: the document still flags
    ``has_cid_font`` but stays undecodable — the flagged-row routing
    fixture.  ``per_page_fonts=True`` gives EVERY page its own Type0
    font object + CMap with CIDs assigned per page, all under the SAME
    resource name ``/F1`` — the cross-page name-collision fixture the
    extractor's per-page routing exists for (a document-wide merged
    map decodes at most one of the pages correctly)."""
    if per_page_fonts:
        return _build_pdf_cid_per_page(
            pages,
            compress=compress,
            title=title,
            author=author,
            producer=producer,
            with_tounicode=with_tounicode,
            use_bfrange=use_bfrange,
        )
    chars = sorted({c for lines in pages for ln in lines for c in ln})
    cid_of = {c: i + 1 for i, c in enumerate(chars)}
    cmap_data = _cid_cmap_data(chars, cid_of, use_bfrange)

    objs: list[bytes] = []
    n_pg = len(pages)
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n_pg))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pg} >>".encode()
    )  # 2
    touni = b"/ToUnicode 4 0 R " if with_tounicode else b""
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
        b"/Encoding /Identity-H " + touni + b">>"
    )  # 3
    cm = cmap_data
    cm_filt = b""
    if compress:
        cm = zlib.compress(cmap_data)
        cm_filt = b"/Filter /FlateDecode "
    objs.append(
        b"<< "
        + cm_filt
        + f"/Length {len(cm)} >>\nstream\n".encode()
        + cm
        + b"\nendstream"
    )  # 4 (present but unreferenced when with_tounicode=False)
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, ln in enumerate(lines):
            if j:
                content += b"T*\n"
            hexs = "".join(f"{cid_of[c]:04X}" for c in ln)
            content += b"<" + hexs.encode() + b"> Tj\n"
        content += b"ET"
        data = bytes(content)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {6 + 2 * i} 0 R >>".encode()
        )  # 5 + 2i
        objs.append(
            b"<< "
            + filt
            + f"/Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )  # 6 + 2i
    objs.append(
        b"<< /Title ("
        + _escape_literal(title)
        + b") /Author ("
        + _escape_literal(author)
        + b") /Producer ("
        + _escape_literal(producer)
        + b") >>"
    )
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


def _build_pdf_cid_per_page(
    pages: list[list[str]],
    *,
    compress: bool,
    title: str,
    author: str,
    producer: str,
    with_tounicode: bool,
    use_bfrange: bool,
) -> bytes:
    """``build_pdf_cid(per_page_fonts=True)`` body: one Type0 font +
    ToUnicode CMap PER PAGE, CIDs assigned per page's own sorted char
    set, every page's resource dictionary naming its font ``/F1`` —
    so the same (name, CID) pair means different characters on
    different pages unless the extractor routes per page."""
    n_pg = len(pages)
    objs: list[bytes] = []
    kids = " ".join(f"{5 + 4 * i} 0 R" for i in range(n_pg))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pg} >>".encode()
    )  # 2
    for i, lines in enumerate(pages):
        font_num, cmap_num = 3 + 4 * i, 4 + 4 * i
        page_num, content_num = 5 + 4 * i, 6 + 4 * i
        chars = sorted({c for ln in lines for c in ln})
        cid_of = {c: k + 1 for k, c in enumerate(chars)}
        touni = (
            f"/ToUnicode {cmap_num} 0 R ".encode()
            if with_tounicode
            else b""
        )
        objs.append(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth{i} "
            f"/Encoding /Identity-H ".encode() + touni + b">>"
        )  # font_num
        cm = _cid_cmap_data(chars, cid_of, use_bfrange)
        cm_filt = b""
        if compress:
            cm = zlib.compress(cm)
            cm_filt = b"/Filter /FlateDecode "
        objs.append(
            b"<< "
            + cm_filt
            + f"/Length {len(cm)} >>\nstream\n".encode()
            + cm
            + b"\nendstream"
        )  # cmap_num
        content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, ln in enumerate(lines):
            if j:
                content += b"T*\n"
            hexs = "".join(f"{cid_of[c]:04X}" for c in ln)
            content += b"<" + hexs.encode() + b"> Tj\n"
        content += b"ET"
        data = bytes(content)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>".encode()
        )  # page_num
        objs.append(
            b"<< "
            + filt
            + f"/Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )  # content_num
    objs.append(
        b"<< /Title ("
        + _escape_literal(title)
        + b") /Author ("
        + _escape_literal(author)
        + b") /Producer ("
        + _escape_literal(producer)
        + b") >>"
    )
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
    has_cid_font, cid_decoded, text)``; per-row parse errors surface as
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
                    m["cid_decoded"],
                    m["text"],
                )
            )
        except ValueError:
            rows.append(("invalid", 0, 0, 0, "", False, False, ""))
    return pd.DataFrame(
        rows,
        columns=[
            "version",
            "n_pages",
            "n_streams",
            "n_chars",
            "title",
            "has_cid_font",
            "cid_decoded",
            "text",
        ],
    )
