"""PDF text extraction (functions/pdf_codec.py): build→extract round
trip (compressed + raw streams), string escape set, hex strings, show
operators, Info dictionary, CID-font flagging, damage tolerance, and
the Arrow batch helper."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from entropy_balance_weighting_spark.functions import pdf_codec as pdf


def test_roundtrip_basic():
    doc = pdf.build_pdf(
        [["Hello world", "second line"], ["page two text"]],
        title="A Title",
        author="An Author",
    )
    m = pdf.extract_pdf_text(doc)
    assert m["version"] == "1.4"
    assert m["n_pages"] == 2
    assert m["pages"] == ["Hello world\nsecond line", "page two text"]
    assert m["text"] == "Hello world\nsecond line\npage two text"
    assert m["title"] == "A Title"
    assert m["author"] == "An Author"
    assert m["producer"] == "ebw-spark"
    assert m["has_cid_font"] is False


def test_roundtrip_uncompressed_and_escapes():
    tricky = "parens () and \\ backslash (nested (deep))"
    doc = pdf.build_pdf([[tricky]], compress=False)
    m = pdf.extract_pdf_text(doc)
    assert m["pages"] == [tricky]
    assert b"FlateDecode" not in doc


def test_literal_string_escape_set():
    # octal, control escapes, line continuation, unknown escape
    raw = b"(a\\101b\\n\\t\\\nc\\q)"
    s, end = pdf._parse_literal(raw, 0)
    assert s == "aAb\n\tcq"
    assert end == len(raw)
    with pytest.raises(ValueError, match="unterminated literal"):
        pdf._parse_literal(b"(never closed", 0)


def test_hex_strings_and_quote_operators():
    content = b"BT (first) Tj <48 65 78> Tj T* (after-star) ' ET"
    assert pdf._stream_text(content) == "firstHex\nafter-star"


def test_tj_array_show():
    content = b"BT [(kerned) -120 ( parts)] TJ ET"
    assert pdf._stream_text(content) == "kerned parts"


def test_cid_font_flagged_not_garbled():
    doc = pdf.build_pdf([["ascii text"]])
    # splice a Type0 font object in (parser must flag, not crash)
    doc = doc.replace(
        b"1 0 obj",
        b"9 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X >>\n"
        b"endobj\n1 0 obj",
        1,
    )
    m = pdf.extract_pdf_text(doc)
    assert m["has_cid_font"] is True
    assert m["pages"] == ["ascii text"]


def test_damage_tolerance():
    with pytest.raises(ValueError, match="missing %PDF header"):
        pdf.extract_pdf_text(b"not a pdf")
    # a corrupted Flate stream is skipped, the good page survives
    doc = bytearray(pdf.build_pdf([["good page"], ["will corrupt"]]))
    streams = [i for i in range(len(doc)) if doc[i : i + 7] == b"stream\n"]
    doc[streams[-1] + 8] ^= 0xFF
    m = pdf.extract_pdf_text(bytes(doc))
    assert m["n_pages"] == 2
    assert "good page" in m["pages"]


def test_batch_helper_surfaces_invalid_rows():
    good = pdf.build_pdf([["alpha"], ["beta gamma"]], title="T")
    out = pdf.extract_pdf_text_batch([good, b"garbage bytes"])
    assert list(out["version"]) == ["1.4", "invalid"]
    assert out["n_pages"].tolist() == [2, 0]
    assert out["n_chars"].tolist() == [len("alpha") + len("beta gamma"), 0]
    assert out["title"].tolist() == ["T", ""]


@settings(max_examples=30, deadline=None)
@given(
    pages=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1,
                max_size=60,
            ).filter(lambda s: s.strip()),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
    compress=st.booleans(),
)
def test_roundtrip_fuzz(pages, compress):
    """Printable-ASCII lines (including parens/backslashes, which the
    escape path must round-trip) survive build→extract exactly."""
    doc = pdf.build_pdf(pages, compress=compress)
    m = pdf.extract_pdf_text(doc)
    assert m["n_pages"] == len(pages)
    assert m["pages"] == ["\n".join(lines) for lines in pages]


def test_cid_tounicode_roundtrip_bfchar_and_bfrange():
    """Type0/Identity-H text with an embedded ToUnicode CMap decodes to
    real text — both CMap forms, both compressions (r11 verdict task:
    CID text recovered, not just flagged)."""
    pages = [["Héllo 世界", "第二 line"], ["π and ΣΔ"]]
    for use_bfrange in (False, True):
        for compress in (True, False):
            b = pdf.build_pdf_cid(
                pages, title="CID doc", use_bfrange=use_bfrange,
                compress=compress,
            )
            m = pdf.extract_pdf_text(b)
            assert m["has_cid_font"] is True
            assert m["cid_decoded"] is True
            assert m["pages"] == ["Héllo 世界\n第二 line", "π and ΣΔ"], (
                use_bfrange, compress,
            )
            assert m["title"] == "CID doc"
            assert m["n_pages"] == 2


def test_cid_without_tounicode_stays_flagged_undecoded():
    b = pdf.build_pdf_cid([["没有映射"]], with_tounicode=False)
    m = pdf.extract_pdf_text(b)
    assert m["has_cid_font"] is True
    assert m["cid_decoded"] is False
    # hex shows fall back to latin-1 bytes — garble, but never a crash
    assert m["n_pages"] == 1


def test_cid_unmapped_cid_becomes_replacement_char():
    b = pdf.build_pdf_cid([["ab"]])
    # CID 0x7FFF is not in the CMap: splice an extra show into the page
    # content is complex; instead exercise the decode helper directly
    cmap = {1: "a", 2: "b"}
    assert pdf._decode_shown(b"\x00\x01\x7f\xff\x00\x02", cmap) == "a�b"
    assert pdf._decode_shown(b"\x00\x01\x00", cmap) == "a�"  # odd tail
    assert pdf._decode_shown(b"\x00\x01", None) == "\x00\x01"  # latin-1 path


def test_bfrange_array_form_and_increment_carry():
    """The explicit-array bfrange form and the incrementing form both
    parse; the incrementing form bumps the LAST UTF-16 code unit."""
    cm = (
        b"begincmap\n"
        b"2 beginbfrange\n"
        b"<0001> <0003> [<0041> <00420043> <0044>]\n"
        b"<0010> <0012> <4E00>\n"
        b"endbfrange\nendcmap"
    )
    body = (
        b"<< /Length " + str(len(cm)).encode() + b" >>\nstream\n"
        + cm + b"\nendstream"
    )
    m = pdf._parse_tounicode(body)
    assert m[1] == "A" and m[2] == "BC" and m[3] == "D"
    assert m[0x10] == "一" and m[0x12] == "丂"


def test_mixed_simple_and_cid_fonts_route_by_tf():
    """Two fonts in one document: the CID font's shows decode via its
    CMap, the simple font's shows stay latin-1 — routing follows the
    Tf operator, not a document-global guess."""
    cid_doc = pdf.build_pdf_cid([["一二"]], compress=False)
    m = pdf.extract_pdf_text(cid_doc)
    assert m["pages"] == ["一二"]
    # splice a second, simple-font show AFTER switching fonts
    content_marker = b"ET"
    patched = cid_doc.replace(
        content_marker,
        b"/F9 12 Tf (plain) Tj ET",
        1,
    )
    # /F9 has no CMap entry -> latin-1 path; stream /Length is now wrong
    # but the tolerant regex fallback still frames the stream
    m2 = pdf.extract_pdf_text(patched)
    assert m2["pages"] == ["一二plain"]


def test_batch_helper_carries_cid_decoded_column():
    good = pdf.build_pdf([["alpha"]], title="T")
    cid = pdf.build_pdf_cid([["中文"]], title="C")
    out = pdf.extract_pdf_text_batch([good, cid, b"junk"])
    assert out["has_cid_font"].tolist() == [False, True, False]
    assert out["cid_decoded"].tolist() == [False, True, False]
    assert out["n_chars"].tolist() == [5, 2, 0]
    assert out["text"].tolist()[1] == "中文"


def test_build_pdf_cid_astral_chars_roundtrip():
    """r12 ADVICE: the builder used to reject supplementary-plane
    characters (and mm_pdf_text called it outside per-row error
    handling — one astral char in a corpus text would have failed the
    whole query).  Now they encode as spec-correct UTF-16BE
    surrogate-pair CMap destinations and round-trip, in BOTH CMap
    forms (a non-BMP char never chains into an incrementing bfrange —
    it gets its own 1-length range)."""
    text = "ok \U0001F600\U00010000 end"
    for bf in (False, True):
        m = pdf.extract_pdf_text(
            pdf.build_pdf_cid([[text]], use_bfrange=bf)
        )
        assert m["text"] == text, (bf, m["text"])
        assert m["cid_decoded"]


def test_cid_per_page_fonts_no_cross_page_collision():
    """r12 verdict task: two DIFFERENT CID fonts sharing the resource
    name /F1 on different pages must each decode through their own
    CMap.  per_page_fonts=True assigns CIDs per page, so page 2's CID
    1 is a different character than page 1's — a document-wide merged
    font map (the pre-r13 behavior) decodes page 2 through page 1's
    CMap and garbles it."""
    pages = [["zebra"], ["apple"]]  # page-local CID 1 = 'a' vs 'a'?
    # ensure genuinely colliding assignments: distinct sorted char sets
    assert sorted(set("zebra")) != sorted(set("apple"))
    m = pdf.extract_pdf_text(
        pdf.build_pdf_cid(pages, per_page_fonts=True)
    )
    assert m["pages"] == ["zebra", "apple"], m["pages"]
    assert m["n_pages"] == 2 and m["cid_decoded"]
    # bfrange form routes per page too
    m2 = pdf.extract_pdf_text(
        pdf.build_pdf_cid(
            [["abc xyz"], ["mnop qrs"]],
            per_page_fonts=True,
            use_bfrange=True,
        )
    )
    assert m2["pages"] == ["abc xyz", "mnop qrs"], m2["pages"]


def test_cid_per_page_without_tounicode_stays_flagged():
    m = pdf.extract_pdf_text(
        pdf.build_pdf_cid(
            [["aa"], ["bb"]], per_page_fonts=True, with_tounicode=False
        )
    )
    assert m["has_cid_font"] and not m["cid_decoded"]
    assert m["n_pages"] == 2


def test_tounicode_cmap_survives_newline_final_zlib_byte():
    """A compressed CMap whose zlib bytes END in 0x0A must still parse:
    regex stream framing strips that byte (fatal to decompression); the
    /Length-honoring framing keeps it.  Search a few payload variants
    until one compresses to a trailing-newline byte, then roundtrip."""
    import zlib as _z

    found = None
    for pad in range(400):
        pages = [[f"界世 pad{pad}"]]
        doc = pdf.build_pdf_cid(pages, compress=True)
        # locate the CMap stream's compressed bytes (object 4)
        m = pdf._OBJ_RE.search(doc[doc.find(b"4 0 obj") :])
        raw = pdf._stream_bytes(m.group(3))
        if raw is not None and raw.endswith((b"\n", b"\r")):
            found = (pages, doc)
            break
    assert found is not None, "no trailing-newline zlib variant in 400 tries"
    pages, doc = found
    m = pdf.extract_pdf_text(doc)
    assert m["cid_decoded"] is True
    assert m["pages"] == ["\n".join(pages[0])]
