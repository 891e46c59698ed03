"""Subtitle / caption parsing (SRT + WebVTT) — the text-bearing
sidecar of a video corpus.  At 100 TB of video, the captions are the
cheapest high-quality text signal available (they are small, already
aligned, and human-written); a curation pipeline extracts them into the
document stream long before it decodes a single frame.

Everything here is JVM-side column expressions — ``split`` /
``transform`` / ``filter`` / ``regexp_extract`` over arrays of cue
blocks — so parsing a billion caption files is one whole-stage-codegen
map over the corpus: no UDF, no Python in the hot path, and the
registered query's DuckDB oracle can replay the aggregate arithmetic.

Format facts the parsers are built around (public specs: SubRip's
de-facto grammar; W3C WebVTT):

- **SRT**: blank-line-separated blocks of ``index`` / ``HH:MM:SS,mmm
  --> HH:MM:SS,mmm`` / one-or-more text lines.  Hours may exceed two
  digits in long recordings, so the hour group is ``\\d+``.  Some
  emitters use ``.`` instead of ``,`` for the millisecond separator —
  both are accepted.
- **WebVTT**: a ``WEBVTT`` header block, then cue blocks where the
  timing line uses ``.`` separators and may be preceded by an OPTIONAL
  cue identifier line and followed by cue settings after the end time
  (``align:start position:0%``).  ``NOTE``/``STYLE``/``REGION`` blocks
  carry no cue timing line and are skipped structurally (no special
  casing needed: blocks without a timing line are filtered out).

Both parsers share one cue schema::

    array<struct<seq:int, start_ms:bigint, end_ms:bigint, text:string>>

``seq`` is the SRT index (null for VTT cues, whose identifiers are
free-form).  Malformed blocks are dropped, not fatal — subtitle files
in a crawl are exactly as dirty as the HTML next to them.

Reference parity: /root/reference has no media surface — §7.5
extension scope (multimodal corpus curation).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# one timestamp: variable-width hours, [,.] millisecond separator
_TS = r"(\d+):(\d{2}):(\d{2})[,.](\d{3})"
# full cue timing line (anchored loosely: VTT appends cue settings)
_TIMING = _TS + r"\s*-->\s*" + _TS

CUE_SCHEMA = (
    "array<struct<seq:int,start_ms:bigint,end_ms:bigint,text:string>>"
)


def _ms(line: Column, first_group: int) -> Column:
    """Milliseconds from the timing-line groups starting at
    ``first_group`` (1 for the start timestamp, 5 for the end)."""
    h = F.regexp_extract(line, _TIMING, first_group).cast("long")
    m = F.regexp_extract(line, _TIMING, first_group + 1).cast("long")
    s = F.regexp_extract(line, _TIMING, first_group + 2).cast("long")
    ms = F.regexp_extract(line, _TIMING, first_group + 3).cast("long")
    return ((h * 3600 + m * 60 + s) * 1000 + ms).cast("long")


def _blocks(col: Column | str) -> Column:
    """Blank-line-separated blocks, CRLF-normalized, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(c, r"\r\n?", "\n")
    # F.trim strips only spaces — blocks also carry stray newlines/tabs
    # at their edges (file-final newline, tab-padded separators)
    strip = lambda b: F.regexp_replace(
        F.regexp_replace(b, r"^\s+", ""), r"\s+$", ""
    )
    return F.filter(
        F.transform(F.split(norm, r"\n[ \t]*\n+"), strip),
        lambda b: b != "",
    )


def _cue_of_block(block: Column, *, srt: bool) -> Column:
    """One block → one cue struct (fields null when the block has no
    timing line; callers filter those out)."""
    lines = F.split(block, r"\n")
    timing = F.element_at(
        F.filter(lines, lambda ln: ln.rlike(_TIMING)), 1
    )
    pos = F.array_position(lines, timing)
    n = F.size(lines)
    text = F.array_join(
        F.slice(lines, (pos + 1).cast("int"), (n - pos).cast("int")), "\n"
    )
    seq = (
        # try_cast: a non-numeric index line is dirty data, not an error
        F.element_at(lines, 1).try_cast("int")
        if srt
        else F.lit(None).cast("int")
    )
    return F.struct(
        seq.alias("seq"),
        _ms(timing, 1).alias("start_ms"),
        _ms(timing, 5).alias("end_ms"),
        text.alias("text"),
    )


def srt_cues(col: Column | str) -> Column:
    """Parse an SRT document into the cue array (:data:`CUE_SCHEMA`).
    Blocks without a valid timing line are dropped."""
    cues = F.transform(
        F.filter(_blocks(col), lambda b: b.rlike(_TIMING)),
        lambda b: _cue_of_block(b, srt=True),
    )
    return cues.cast(CUE_SCHEMA)


def vtt_cues(col: Column | str) -> Column:
    """Parse a WebVTT document into the cue array (:data:`CUE_SCHEMA`,
    ``seq`` null).  The WEBVTT header, NOTE/STYLE/REGION blocks, and
    identifier lines are handled structurally: only blocks containing a
    timing line become cues, and cue text starts after that line."""
    cues = F.transform(
        F.filter(_blocks(col), lambda b: b.rlike(_TIMING)),
        lambda b: _cue_of_block(b, srt=False),
    )
    return cues.cast(CUE_SCHEMA)


def subtitle_cues(col: Column | str) -> Column:
    """Format-sniffing parse: WebVTT when the payload starts with the
    ``WEBVTT`` magic, SRT otherwise — one expression for a mixed
    caption corpus."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.ltrim(c).startswith(F.lit("WEBVTT")), vtt_cues(c)
    ).otherwise(srt_cues(c))


def subtitle_text(cues: Column, sep: str = "\n") -> Column:
    """Cue array → flat transcript text (the document the text pipeline
    ingests)."""
    return F.array_join(F.transform(cues, lambda c: c["text"]), sep)


def subtitle_span_ms(cues: Column) -> Column:
    """Total caption-on-screen milliseconds (Σ end−start) — the
    coverage signal a caption-quality filter thresholds on."""
    return F.aggregate(
        cues,
        F.lit(0).cast("long"),
        lambda acc, c: acc + (c["end_ms"] - c["start_ms"]),
    )


def format_srt_timestamp(ms: Column) -> Column:
    """Milliseconds → ``HH:MM:SS,mmm`` (builder half of the round-trip;
    used by tests and the registered query's deterministic fixture)."""
    h = F.floor(ms / 3600000).cast("long")
    m = F.floor((ms % 3600000) / 60000).cast("long")
    s = F.floor((ms % 60000) / 1000).cast("long")
    r = (ms % 1000).cast("long")
    # NOT lpad for hours: Spark lpad TRUNCATES strings longer than the
    # target width, which would corrupt 100+ hour recordings
    hours = F.when(h < 10, F.concat(F.lit("0"), h.cast("string"))).otherwise(
        h.cast("string")
    )
    return F.concat(
        hours,
        F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"),
        F.lit(","),
        F.lpad(r.cast("string"), 3, "0"),
    )
