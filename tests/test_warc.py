"""WARC source/sink (sources/warc.py): spec-shaped record round-trip,
gzip member-per-record streaming, HTTP payload split, malformed-record
tolerance, and the write→read→aggregate identity the registered query
relies on."""

from __future__ import annotations

import gzip
import os

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.sources import warc


def _fixture_records():
    recs = []
    for i in range(5):
        body = f"<html><body>doc {i} body text</body></html>".encode()
        recs.append(
            warc.build_warc_record(
                "response",
                record_id=f"id-{i}",
                date="2026-01-01T00:00:00Z",
                target_uri=f"http://ex.com/{i}",
                content=warc.build_http_response(body),
                content_type="application/http; msgtype=response",
            )
        )
    recs.append(
        warc.build_warc_record(
            "warcinfo",
            record_id="info-0",
            date="2026-01-01T00:00:00Z",
            content=b"software: test\r\n",
            content_type="application/warc-fields",
        )
    )
    return recs


def test_parse_roundtrip_plain():
    data = b"".join(_fixture_records())
    out = list(warc.parse_warc_records(data))
    assert len(out) == 6
    types = [h["warc-type"] for _, h, _ in out]
    assert types == ["response"] * 5 + ["warcinfo"]
    # content blocks are exact: the HTTP split recovers each body
    for i, (_, h, block) in enumerate(out[:5]):
        status, ctype, body, err = warc._parse_http_block(block)
        assert status == 200 and ctype == "text/html" and err is None
        assert body == f"<html><body>doc {i} body text</body></html>".encode()
        assert h["warc-target-uri"] == f"http://ex.com/{i}"


def test_gzip_member_per_record_splits():
    recs = _fixture_records()
    data = b"".join(warc.gzip_member(r) for r in recs)
    members = list(warc._split_members(data))
    assert len(members) == 6
    assert [m for _, m in members] == recs
    # offsets are strictly increasing file positions
    offs = [o for o, _ in members]
    assert offs == sorted(offs) and offs[0] == 0


def test_read_warc_plain_and_gz(spark, tmp_path):
    recs = _fixture_records()
    plain = tmp_path / "a.warc"
    plain.write_bytes(b"".join(recs))
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(b"".join(warc.gzip_member(r) for r in recs))

    df = warc.read_warc(spark, str(tmp_path / "*")).cache()
    try:
        assert df.count() == 12
        resp = df.filter(F.col("warc_type") == "response")
        assert resp.count() == 10
        row = (
            resp.filter(F.col("target_uri") == "http://ex.com/3")
            .orderBy("warc_file")
            .first()
        )
        assert row["http_status"] == 200
        assert row["http_content_type"] == "text/html"
        assert bytes(row["payload"]) == (
            b"<html><body>doc 3 body text</body></html>"
        )
        assert row["record_id"] == "urn:uuid:id-3"
        assert df.filter(F.col("warc_type") == "invalid").count() == 0
    finally:
        df.unpersist()


def test_read_warc_surfaces_corruption_as_rows(spark, tmp_path):
    recs = _fixture_records()
    # file 1: one good member, one member whose record has no
    # Content-Length, one truncated gzip member at the tail
    bad_rec = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n\r\nbody\r\n\r\n"
    )
    data = (
        warc.gzip_member(recs[0])
        + warc.gzip_member(bad_rec)
        + warc.gzip_member(recs[1])[:20]
    )
    (tmp_path / "c.warc.gz").write_bytes(data)
    df = warc.read_warc(spark, str(tmp_path / "c.warc.gz")).cache()
    try:
        by_type = dict(
            df.groupBy("warc_type").count().collect()
        )
        assert by_type.get("response") == 1
        assert by_type.get("invalid", 0) == 2
        errs = [
            r["error"]
            for r in df.filter(F.col("warc_type") == "invalid").collect()
        ]
        assert any("Content-Length" in e for e in errs)
        assert any("truncated gzip member" in e for e in errs)
    finally:
        df.unpersist()


def test_write_warc_roundtrip_and_crash_safety(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"http://ex.com/{i}", f"body {i} " * (i + 1)) for i in range(20)],
        "url string, body string",
    )
    dest = str(tmp_path / "out")
    manifest = warc.write_warc(docs, dest, n_files=3)
    m = {r["file_no"]: r for r in manifest.collect()}
    assert sum(r["n_records"] for r in m.values()) == 20
    files = sorted(os.listdir(dest))
    assert files == [f"part-{i:05d}.warc.gz" for i in sorted(m)]
    assert not any(f.endswith(".tmp") for f in files)

    back = warc.read_warc(spark, os.path.join(dest, "*.warc.gz"))
    got = {
        r["target_uri"]: bytes(r["payload"]).decode()
        for r in back.collect()
    }
    assert len(got) == 20
    for i in range(20):
        assert got[f"http://ex.com/{i}"] == f"body {i} " * (i + 1)

    # determinism: a re-export writes byte-identical files
    before = {f: (tmp_path / "out" / f).read_bytes() for f in files}
    warc.write_warc(docs, dest, n_files=3)
    after = {f: (tmp_path / "out" / f).read_bytes() for f in files}
    assert before == after

    # a re-export with fewer rows drops stale part files
    warc.write_warc(docs.limit(1), dest, n_files=3)
    remaining = sorted(os.listdir(dest))
    assert len(remaining) == 1 and remaining[0].startswith("part-")


@settings(max_examples=25, deadline=None)
@given(
    bodies=st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=8
    ),
    compress=st.booleans(),
)
def test_record_roundtrip_fuzz(bodies, compress):
    """Arbitrary binary bodies survive the record→parse round trip
    bit-exactly, compressed or not (bodies may contain CRLF CRLF and
    fake WARC version lines — Content-Length framing must win)."""
    recs = [
        warc.build_warc_record(
            "resource",
            record_id=f"r{i}",
            date="2026-01-01T00:00:00Z",
            target_uri=f"http://f.com/{i}",
            content=b,
        )
        for i, b in enumerate(bodies)
    ]
    if compress:
        data = b"".join(warc.gzip_member(r) for r in recs)
        parsed = []
        for _, member in warc._split_members(data):
            parsed.extend(warc.parse_warc_records(member))
    else:
        parsed = list(warc.parse_warc_records(b"".join(recs)))
    assert [blk for _, _, blk in parsed] == bodies
    assert [h["warc-target-uri"] for _, h, _ in parsed] == [
        f"http://f.com/{i}" for i in range(len(bodies))
    ]


def test_whole_file_gzip_also_reads(spark, tmp_path):
    """A .warc.gz written as ONE gzip member (not member-per-record —
    some tools do this) still parses: the member walk yields one big
    member and the record walk inside it finds every record."""
    recs = _fixture_records()
    (tmp_path / "w.warc.gz").write_bytes(gzip.compress(b"".join(recs)))
    df = warc.read_warc(spark, str(tmp_path / "w.warc.gz"))
    assert df.filter(F.col("warc_type") == "response").count() == 5


def _http_resp(raw_headers: str, body: bytes) -> bytes:
    return (f"HTTP/1.1 200 OK\r\n{raw_headers}\r\n\r\n").encode() + body


def test_http_chunked_and_content_encoding():
    body = b"hello chunked world " * 10
    chunked = (
        b"c8;ext=1\r\n" + body[:200] + b"\r\n"
        b"0\r\n\r\n"
    )
    s, ct, out, err = warc._parse_http_block(
        _http_resp("Transfer-Encoding: chunked\r\nContent-Type: text/plain", chunked)
    )
    assert (s, ct, err) == (200, "text/plain", None)
    assert out == body[:200]

    import gzip as _gz
    import zlib as _zl

    gz = _gz.compress(body)
    s, ct, out, err = warc._parse_http_block(
        _http_resp("Content-Encoding: gzip", gz)
    )
    assert err is None and out == body

    # zlib-wrapped deflate AND raw deflate both decode
    co = _zl.compressobj(wbits=-15)
    raw = co.compress(body) + co.flush()
    for blob in (_zl.compress(body), raw):
        s, ct, out, err = warc._parse_http_block(
            _http_resp("Content-Encoding: deflate", blob)
        )
        assert err is None and out == body

    # chunked THEN gzip (Transfer-Encoding applies outermost)
    inner = _gz.compress(body)
    chunked_gz = (
        hex(len(inner))[2:].encode() + b"\r\n" + inner + b"\r\n0\r\n\r\n"
    )
    s, ct, out, err = warc._parse_http_block(
        _http_resp(
            "Transfer-Encoding: chunked\r\nContent-Encoding: gzip", chunked_gz
        )
    )
    assert err is None and out == body


def test_http_decode_failure_keeps_raw_body():
    bad_chunked = b"zz\r\nnot hex\r\n0\r\n\r\n"
    s, ct, out, err = warc._parse_http_block(
        _http_resp("Transfer-Encoding: chunked", bad_chunked)
    )
    assert s == 200 and out == bad_chunked
    assert "bad size line" in err

    s, ct, out, err = warc._parse_http_block(
        _http_resp("Content-Encoding: gzip", b"\x00not gzip")
    )
    assert s == 200 and out == b"\x00not gzip"
    assert "gzip" in err


def test_http_unsupported_content_encoding_is_queryable():
    """br / zstd bodies (common in real crawls) stay raw but carry an
    error, so downstream extraction can route instead of consuming
    compressed bytes as text."""
    for enc in ("br", "zstd"):
        s, ct, out, err = warc._parse_http_block(
            _http_resp(f"Content-Encoding: {enc}", b"\x8b\x02\x80compressed")
        )
        assert s == 200 and out == b"\x8b\x02\x80compressed"
        assert err is not None and f"unsupported encoding {enc}" in err
    # identity / absent header: no error
    for hdrs in ("Content-Encoding: identity", "X-Other: 1"):
        _, _, _, err = warc._parse_http_block(_http_resp(hdrs, b"plain"))
        assert err is None


def test_corrupt_gzip_member_data_is_one_invalid_row(spark, tmp_path):
    """A valid member followed by non-gzip garbage (or a corrupted
    member payload) must yield an invalid ROW, not crash the task —
    zlib.error from decompress is mapped to the same queryable path
    as truncation."""
    recs = _fixture_records()
    good = warc.gzip_member(recs[0])
    # case 1: valid member + garbage trailing bytes (bad magic)
    (tmp_path / "g1.warc.gz").write_bytes(good + b"\x1f\x8bGARBAGE-NOT-GZIP")
    # case 2: valid member + member with corrupted deflate payload
    broken = bytearray(warc.gzip_member(recs[1]))
    broken[15] ^= 0xFF  # flip a byte inside the deflate stream
    (tmp_path / "g2.warc.gz").write_bytes(good + bytes(broken))
    for name in ("g1.warc.gz", "g2.warc.gz"):
        df = warc.read_warc(spark, str(tmp_path / name))
        by_type = dict(df.groupBy("warc_type").count().collect())
        assert by_type.get("response") == 1, name
        assert by_type.get("invalid", 0) == 1, name
        errs = [
            r["error"]
            for r in df.filter(F.col("warc_type") == "invalid").collect()
        ]
        assert all("gzip member" in e for e in errs), (name, errs)


def test_write_warc_compress_toggle_sweeps_other_extension(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"http://ex.com/{i}", f"body {i}") for i in range(6)],
        "url string, body string",
    )
    dest = str(tmp_path / "out")
    warc.write_warc(docs, dest, n_files=2, compress=False)
    assert all(f.endswith(".warc") for f in os.listdir(dest))
    warc.write_warc(docs, dest, n_files=2, compress=True)
    files = sorted(os.listdir(dest))
    assert files and all(f.endswith(".warc.gz") for f in files)
    # the directory reads back exactly one export's records
    assert warc.read_warc(spark, dest).count() == 6


def test_read_warc_decodes_chunked_gzip_records(spark, tmp_path):
    import gzip as _gz

    body = b"<html>compressed page</html>"
    inner = _gz.compress(body)
    chunked = hex(len(inner))[2:].encode() + b"\r\n" + inner + b"\r\n0\r\n\r\n"
    rec = warc.build_warc_record(
        "response",
        record_id="gz-1",
        date="2026-01-01T00:00:00Z",
        target_uri="http://ex.com/gz",
        content=_http_resp(
            "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n"
            "Content-Type: text/html",
            chunked,
        ),
        content_type="application/http; msgtype=response",
    )
    (tmp_path / "gz.warc.gz").write_bytes(warc.gzip_member(rec))
    row = warc.read_warc(spark, str(tmp_path / "gz.warc.gz")).first()
    assert row["error"] is None
    assert bytes(row["payload"]) == body
    assert row["http_content_type"] == "text/html"


def test_read_warc_stream_tails_new_files(spark, tmp_path):
    """Streaming ingest: files landing across micro-batches all arrive,
    with the same parse/corruption contract as the batch reader."""
    src = tmp_path / "crawl"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    recs = _fixture_records()
    (src / "a.warc.gz").write_bytes(
        b"".join(warc.gzip_member(r) for r in recs[:3])
    )

    def drain():
        stream = warc.read_warc_stream(
            spark, str(src), glob="*.warc.gz", max_files_per_trigger=1
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = spark.read.parquet(str(out))
    assert got1.count() == 3

    # a second file lands; only ITS records are new in the next drain
    (src / "b.warc.gz").write_bytes(
        b"".join(warc.gzip_member(r) for r in recs[3:])
    )
    drain()
    got2 = spark.read.parquet(str(out))
    assert got2.count() == 6
    assert (
        got2.filter(F.col("warc_type") == "response").count() == 5
    )
    uris = {
        r["target_uri"]
        for r in got2.filter(F.col("warc_type") == "response").collect()
    }
    assert uris == {f"http://ex.com/{i}" for i in range(5)}


def test_wet_conversion_records_read(spark, tmp_path):
    """Common Crawl WET files are WARC with 'conversion' records whose
    block is plain extracted text — the reader must surface them
    verbatim (no HTTP split) alongside the warcinfo header."""
    recs = [
        warc.build_warc_record(
            "warcinfo",
            record_id="winfo",
            date="2026-01-01T00:00:00Z",
            content=b"software: wet-test\r\n",
            content_type="application/warc-fields",
        )
    ]
    for i in range(4):
        recs.append(
            warc.build_warc_record(
                "conversion",
                record_id=f"c{i}",
                date="2026-01-01T00:00:00Z",
                target_uri=f"http://ex.com/{i}",
                content=f"extracted text of page {i}\nsecond line".encode(),
                content_type="text/plain",
            )
        )
    (tmp_path / "f.warc.wet.gz").write_bytes(
        b"".join(warc.gzip_member(r) for r in recs)
    )
    df = warc.read_warc(spark, str(tmp_path), glob="*.wet.gz")
    conv = df.filter(F.col("warc_type") == "conversion").orderBy(
        "target_uri"
    )
    rows = conv.collect()
    assert len(rows) == 4
    assert bytes(rows[2]["payload"]).decode() == (
        "extracted text of page 2\nsecond line"
    )
    assert rows[0]["content_type"] == "text/plain"
    assert rows[0]["http_status"] is None


def test_write_wet_roundtrip_through_read_warc(spark, tmp_path):
    """WET export (conversion records, text/plain) reads back through
    read_warc with the text as payload — the acquisition->extraction
    interchange roundtrip."""
    docs = spark.createDataFrame(
        [
            (f"http://ex.com/{i}", f"extracted text {i} — naïve café\nline2")
            for i in range(12)
        ],
        "url string, text string",
    )
    dest = str(tmp_path / "wet")
    manifest = warc.write_wet(docs, dest, n_files=3)
    assert sum(r["n_records"] for r in manifest.collect()) == 12

    back = warc.read_warc(spark, os.path.join(dest, "*.warc.gz")).cache()
    try:
        assert back.count() == 12
        rows = {r["target_uri"]: r for r in back.collect()}
        for i in range(12):
            r = rows[f"http://ex.com/{i}"]
            assert r["warc_type"] == "conversion"
            assert r["content_type"] == "text/plain"
            assert r["http_status"] is None  # no HTTP envelope in WET
            assert bytes(r["payload"]).decode("utf-8") == (
                f"extracted text {i} — naïve café\nline2"
            )
            assert r["error"] is None
    finally:
        back.unpersist()

    # determinism: re-export writes byte-identical files
    files = sorted(os.listdir(dest))
    before = {f: (tmp_path / "wet" / f).read_bytes() for f in files}
    warc.write_wet(docs, dest, n_files=3)
    after = {f: (tmp_path / "wet" / f).read_bytes() for f in files}
    assert before == after
