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
