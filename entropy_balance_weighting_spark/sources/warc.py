"""WARC (Web ARChive, ISO 28500) source + sink — the Common Crawl
interchange format, i.e. THE on-disk shape of a 100 TB web-text corpus.
A crawl-curation pipeline that cannot read WARC starts with an external
conversion step; this module removes that step: raw ``.warc`` /
``.warc.gz`` files in, a relational records DataFrame out, feeding
directly into :mod:`..functions.web` (HTML→text) and the dedup stack.

Format facts the implementation is built around (public spec,
ISO 28500 / WARC 1.1; identical structure in Common Crawl's WARC 1.0):

- A WARC file is a concatenation of records.  Each record is a version
  line (``WARC/1.1``), CRLF-separated named headers, ``CRLF CRLF``, a
  content block of exactly ``Content-Length`` bytes, then ``CRLF CRLF``.
  ``Content-Length`` is mandatory, so parsing is a linear walk with no
  scanning heuristics.
- ``response`` records wrap a full HTTP response (status line + headers
  + body) as the content block; the corpus payload is the HTTP body,
  so the reader splits it off and surfaces status / Content-Type as
  columns.
- The Common Crawl ``.warc.gz`` convention is **gzip member per
  record**: each record is its own gzip member and members are
  concatenated.  That makes the file streamable record-at-a-time
  (``zlib`` with ``wbits=31`` stops at each member boundary) without
  decompressing the whole file — the reader exploits exactly this.

Scale design (the 100 TB lens):

- **File = task.**  gzip is not splittable, and Common Crawl already
  shards crawls into ~1 GB WARC files (tens of thousands per crawl) —
  file-level parallelism IS the production parallelism unit.  The
  reader is ``binaryFile`` scan → ``mapInPandas``: one task per file,
  a pure map stage, no shuffle.  At 100 TB that is ~100k tasks, the
  right granularity for a 1000-executor cluster.
- **Bounded batches.**  The per-file generator yields Arrow batches of
  ``batch_records`` records, so executor memory holds one file's bytes
  (binaryFile's unit) plus one bounded batch — never the whole file's
  decoded row set.
- **Malformed records are data, not crashes.**  Real crawls contain
  truncated members and garbage; a 100k-task job must not die on file
  99,999.  Records that fail to parse are surfaced as
  ``warc_type='invalid'`` rows carrying the error text, so corruption
  is queryable (count it, sample it) instead of fatal.

Reference parity: /root/reference has no web-archive surface — §7.5
extension scope (crawl ingestion for LLM-corpus curation).
"""

from __future__ import annotations

import gzip
import io
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_offset", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# record building (sink + test fixtures)
# ---------------------------------------------------------------------------


def build_warc_record(
    warc_type: str,
    *,
    record_id: str,
    date: str,
    content: bytes,
    target_uri: str | None = None,
    content_type: str = "application/octet-stream",
    version: str = "1.1",
) -> bytes:
    """Serialize ONE spec-shaped WARC record (version line, named
    headers, CRLF CRLF, content block, CRLF CRLF)."""
    lines = [
        f"WARC/{version}".encode(),
        f"WARC-Type: {warc_type}".encode(),
        f"WARC-Record-ID: <urn:uuid:{record_id}>".encode(),
        f"WARC-Date: {date}".encode(),
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}".encode())
    lines.append(f"Content-Type: {content_type}".encode())
    lines.append(f"Content-Length: {len(content)}".encode())
    head = _CRLF.join(lines) + _CRLF + _CRLF
    return head + content + _CRLF + _CRLF


def build_http_response(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html",
) -> bytes:
    """Serialize the HTTP response block a ``response`` record wraps."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def gzip_member(record: bytes) -> bytes:
    """One record → one gzip member (the Common Crawl ``.warc.gz``
    convention; concatenated members form the file).  mtime is pinned
    so shard bytes are deterministic across runs."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# parsing (source)
# ---------------------------------------------------------------------------


def _split_members(data: bytes):
    """Yield decompressed gzip members from concatenated-member data
    (``wbits=31`` stops at each member boundary).  All decode damage —
    truncation, non-gzip trailing bytes, corrupted member payload —
    surfaces as ValueError so callers can record one invalid row and
    keep the rest of the file."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"bad gzip member at offset {pos}: {e}")
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, out
        pos += consumed


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer coding body (hex size line,
    chunk, CRLF, ..., 0-size terminator).  Raises ValueError on frame
    damage — callers keep the raw body and record the error."""
    out = []
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()  # drop chunk exts
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"chunked body: bad size line {size_tok[:16]!r}")
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are not payload
        if pos + size > len(body):
            raise ValueError("chunked body: truncated chunk")
        out.append(body[pos : pos + size])
        pos += size
        if body[pos : pos + 2] != _CRLF:
            raise ValueError("chunked body: missing chunk terminator")
        pos += 2


def _parse_http_block(block: bytes):
    """Split an HTTP response block into (status, content_type, body,
    decode_error).  Chunked transfer coding is reassembled and
    gzip/deflate content coding decompressed — the shapes real crawls
    actually contain; when either decode fails the RAW body is kept
    and the error surfaced, so one damaged record never costs the rest
    of the file.  Returns (None, None, block, None) when the block is
    not HTTP."""
    if not block.startswith(b"HTTP/"):
        return None, None, block, None
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block, None
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, block, None
    hdrs: dict[bytes, bytes] = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            hdrs[k.strip().lower()] = v.strip()
    ctype = hdrs.get(b"content-type")
    ctype = ctype.decode("latin-1") if ctype is not None else None
    err = None
    if b"chunked" in hdrs.get(b"transfer-encoding", b"").lower():
        try:
            body = _dechunk(body)
        except ValueError as e:
            err = f"http body decode: {e}"
    enc = hdrs.get(b"content-encoding", b"").lower().strip()
    if err is None and enc in (b"gzip", b"x-gzip", b"deflate"):
        try:
            if enc == b"deflate":
                # zlib-wrapped per RFC 9110; raw-deflate servers exist,
                # so fall back to wbits=-15
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    body = zlib.decompress(body, wbits=-15)
            else:
                body = zlib.decompress(body, wbits=31)
        except zlib.error as e:
            err = f"http body decode: {enc.decode()}: {e}"
    elif err is None and enc not in (b"", b"identity"):
        # br / zstd / … — keep the raw body but make the undecoded state
        # queryable, so downstream extraction can route these records
        # instead of consuming compressed bytes as text.
        err = f"http body decode: unsupported encoding {enc.decode('latin-1')}"
    return status, ctype, body, err


def parse_warc_records(data: bytes):
    """Linear walk over uncompressed WARC bytes; yields
    ``(offset, headers_dict, content_block)`` per record.  Raises a
    named ValueError on structural damage (missing Content-Length,
    bad version line) — callers decide whether that is fatal."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra record separators / trailing newlines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        head = data[pos:head_end]
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line at offset {pos}: {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if b":" in ln:
                k, v = ln.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at offset {pos}")
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError(f"truncated content block at offset {pos}")
        yield pos, headers, data[body_start : body_start + clen]
        pos = body_start + clen


def _records_of_file(path: str, data: bytes, batch_records: int):
    """Per-file generator: parse (gzip-member or plain) WARC bytes into
    row dicts, yielding bounded lists of ``batch_records`` rows."""
    rows: list[dict] = []

    def flush():
        nonlocal rows
        if rows:
            out, rows = rows, []
            return [out]
        return []

    def row_of(offset: int, headers: dict, block: bytes) -> dict:
        wtype = headers.get("warc-type", "unknown")
        status = ctype = err = None
        payload = block
        if wtype in ("response", "revisit"):
            status, ctype, payload, err = _parse_http_block(block)
        rid = headers.get("warc-record-id", "")
        return {
            "warc_file": path,
            "record_offset": offset,
            "warc_type": wtype,
            "record_id": rid.strip("<>"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": len(block),
            "http_status": status,
            "http_content_type": ctype,
            "payload": payload,
            "error": err,
        }

    def invalid(offset: int, err: Exception) -> dict:
        return {
            "warc_file": path,
            "record_offset": offset,
            "warc_type": "invalid",
            "record_id": None,
            "target_uri": None,
            "warc_date": None,
            "content_type": None,
            "content_length": 0,
            "http_status": None,
            "http_content_type": None,
            "payload": None,
            "error": str(err),
        }

    if data[:2] == b"\x1f\x8b":  # gzip: member-per-record convention
        try:
            for off, member in _split_members(data):
                try:
                    for _, headers, block in parse_warc_records(member):
                        rows.append(row_of(off, headers, block))
                        if len(rows) >= batch_records:
                            yield from flush()
                except ValueError as e:
                    rows.append(invalid(off, e))
        except (ValueError, zlib.error) as e:  # damaged member stream:
            rows.append(invalid(len(data), e))  # keep what we have
    else:
        try:
            for off, headers, block in parse_warc_records(data):
                rows.append(row_of(off, headers, block))
                if len(rows) >= batch_records:
                    yield from flush()
        except ValueError as e:
            rows.append(invalid(0, e))
    yield from flush()


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    batch_records: int = 1024,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files under ``path`` (glob ok, or
    pass ``glob`` as a ``pathGlobFilter`` for a directory path) into a
    records DataFrame (:data:`WARC_RECORD_SCHEMA`).

    Plan shape: ``binaryFile`` scan → ``mapInPandas`` — a pure map
    stage, one task per file (gzip is not splittable; WARC corpora are
    sharded into many ~1 GB files upstream, so file-parallelism is the
    real unit).  Response records surface ``http_status`` /
    ``http_content_type`` and the HTTP **body** as ``payload``;
    unparseable records/members become ``warc_type='invalid'`` rows
    carrying the error, so corruption is queryable instead of fatal.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_parse_gen(batch_records), WARC_RECORD_SCHEMA)


def _parse_gen(batch_records: int):
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for path_, data in zip(pdf["path"], pdf["content"]):
                for rows in _records_of_file(
                    path_, bytes(data), batch_records
                ):
                    yield pd.DataFrame(rows)

    return gen


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    batch_records: int = 1024,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming variant of :func:`read_warc`: new WARC
    files landing under ``path`` become record micro-batches — the
    live-crawl ingest shape (crawler writes files, the pipeline tails
    the directory; checkpointing gives exactly-once file accounting).
    Same parse, same schema, same corruption-as-rows contract; pace a
    backfill with ``max_files_per_trigger``."""
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    bf_schema = (
        "path string, modificationTime timestamp, length long, "
        "content binary"
    )
    reader = spark.readStream.format("binaryFile").schema(bf_schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_parse_gen(batch_records), WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------


def write_warc(
    df: DataFrame,
    dest: str,
    *,
    url_col: str = "url",
    body_col: str = "body",
    date_col: str | None = None,
    id_col: str | None = None,
    content_type_col: str | None = None,
    n_files: int = 4,
    compress: bool = True,
    salt: str = "warc",
) -> DataFrame:
    """Export documents as spec-shaped WARC ``response`` records across
    ``n_files`` files under ``dest`` and return the manifest DataFrame
    ``(file_no, n_records, n_bytes)``.

    Same sink discipline as :mod:`.shards` (write_token_shards): rows
    hash to files via the engine-portable salt hash, ONE
    ``groupBy(file).applyInPandas`` exchange assembles and writes each
    file in a single task (records sorted by URL → deterministic
    bytes), tasks write ``.tmp`` names and the driver swaps them in
    only after the job succeeds, so a failed export leaves the previous
    one intact.  With ``compress=True`` files use the gzip
    member-per-record convention (mtime pinned to 0), so the export is
    byte-stable and re-readable record-at-a-time by :func:`read_warc`.
    """
    sel_ctype = (
        F.col(content_type_col) if content_type_col else F.lit("text/html")
    )
    return _write_record_sink(
        df,
        dest,
        url_col=url_col,
        payload_expr=F.col(body_col).cast("binary"),
        date_col=date_col,
        id_col=id_col,
        ctype_expr=sel_ctype,
        n_files=n_files,
        compress=compress,
        salt=salt,
        conversion=False,
    )


def write_wet(
    df: DataFrame,
    dest: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    id_col: str | None = None,
    n_files: int = 4,
    compress: bool = True,
    salt: str = "warc",
) -> DataFrame:
    """Export extracted text as WET — WARC ``conversion`` records whose
    block is the plain UTF-8 text (``Content-Type: text/plain``), the
    interchange format downstream corpus tools consume (Common Crawl's
    WET convention).  Closes the acquisition→extraction roundtrip:
    :func:`read_warc` → ``strip_html`` → ``write_wet`` → re-readable by
    :func:`read_warc` (conversion records surface the text as
    ``payload``).  Same sink discipline and manifest as
    :func:`write_warc` (salt-hash sharding, one applyInPandas exchange,
    ``.tmp`` + swap-after-success, deterministic bytes)."""
    return _write_record_sink(
        df,
        dest,
        url_col=url_col,
        payload_expr=F.encode(F.col(text_col), "UTF-8"),
        date_col=date_col,
        id_col=id_col,
        ctype_expr=F.lit("text/plain"),
        n_files=n_files,
        compress=compress,
        salt=salt,
        conversion=True,
    )


def _write_record_sink(
    df: DataFrame,
    dest: str,
    *,
    url_col: str,
    payload_expr,
    date_col: str | None,
    id_col: str | None,
    ctype_expr,
    n_files: int,
    compress: bool,
    salt: str,
    conversion: bool,
) -> DataFrame:
    """Shared WARC/WET sink machinery (see :func:`write_warc` for the
    discipline).  ``conversion=True`` writes bare ``conversion``
    records (block = payload, WET); otherwise ``response`` records
    wrapping the payload in an HTTP/1.1 response."""
    import glob
    import os

    import pandas as pd

    from entropy_balance_weighting_spark.functions.packing import shard_of

    os.makedirs(dest, exist_ok=True)
    for old in glob.glob(os.path.join(dest, "part-*.tmp")):
        os.remove(old)

    base = ".warc"
    ext = base + (".gz" if compress else "")
    sel = [
        F.col(url_col).alias("url"),
        payload_expr.alias("body"),
        (
            F.col(date_col)
            if date_col
            else F.lit("2026-01-01T00:00:00Z")
        ).alias("date"),
        (
            F.col(id_col).cast("string")
            if id_col
            else F.md5(F.col(url_col))
        ).alias("rid"),
        ctype_expr.alias("ctype"),
        shard_of(url_col, n_files, salt).alias("file_no"),
    ]
    d = df.select(*sel)

    def write_file(pdf):
        file_no = int(pdf["file_no"].iloc[0])
        pdf = pdf.sort_values("url")
        chunks = []
        for url, body, date, rid, ctype in zip(
            pdf["url"], pdf["body"], pdf["date"], pdf["rid"], pdf["ctype"]
        ):
            if conversion:
                rec = build_warc_record(
                    "conversion",
                    record_id=str(rid),
                    date=str(date),
                    target_uri=str(url),
                    content=bytes(body),
                    content_type=str(ctype),
                )
            else:
                rec = build_warc_record(
                    "response",
                    record_id=str(rid),
                    date=str(date),
                    target_uri=str(url),
                    content=build_http_response(
                        bytes(body), content_type=str(ctype)
                    ),
                    content_type="application/http; msgtype=response",
                )
            chunks.append(gzip_member(rec) if compress else rec)
        data = b"".join(chunks)
        path = os.path.join(dest, f"part-{file_no:05d}{ext}.tmp")
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "file_no": [file_no],
                "n_records": [len(pdf)],
                "n_bytes": [len(data)],
            }
        )

    rows = (
        d.groupBy("file_no")
        .applyInPandas(write_file, "file_no int, n_records long, n_bytes long")
        .collect()
    )
    new_names = set()
    for tmp in sorted(glob.glob(os.path.join(dest, f"part-*{ext}.tmp"))):
        final = tmp[: -len(".tmp")]
        os.replace(tmp, final)
        new_names.add(os.path.basename(final))
    # Sweep stale outputs of BOTH compression modes: toggling `compress`
    # between exports must not leave the previous run's parts behind for
    # a later read_warc over the directory to pick up.
    for pat in ("part-*.warc", "part-*.warc.gz"):
        for old in glob.glob(os.path.join(dest, pat)):
            if os.path.basename(old) not in new_names:
                os.remove(old)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r["file_no"], r["n_records"], r["n_bytes"]) for r in rows],
        "file_no int, n_records long, n_bytes long",
    )
