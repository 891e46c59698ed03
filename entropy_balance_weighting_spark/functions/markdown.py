"""Markdown → text extraction — the OTHER markup that fills an LLM
training corpus (GitHub READMEs, docs sites, forum exports).  Same
design contract as :mod:`.web`: a chain of RE2-safe ``regexp_replace``
patterns (no backreferences, no lookaround) run entirely JVM-side, so
the registered query's DuckDB oracle replays the identical chain —
the only dialect difference is the replacement syntax (``$1`` in
Spark/Java, ``\\1`` in DuckDB/RE2), handled by :func:`sql_strip_chain`.

Coverage (the constructs that dominate real READMEs): fenced code
blocks (fence lines dropped, code text kept — code is content),
inline code, images (alt text kept), links (anchor text kept), ATX
headers, blockquote markers, bold/italic (both ``*`` and ``_``
families), list bullets and ordered-list numbers, horizontal rules,
and table pipes (cells joined by spaces, separator rows dropped).
Setext headers and reference-style links are rare enough in crawl
data to leave to the generic text path — named here, not half-done.

Reference parity: /root/reference has no document-markup surface —
§7.5 extension scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (pattern, spark_replacement) — order matters: fences before inline
# code, images before links, bold before italic.
STRIP_CHAIN: list[tuple[str, str]] = [
    (r"(?m)^```[^\n]*$", ""),  # fence lines (code text survives)
    (r"`([^`\n]*)`", "$1"),  # inline code
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),  # images -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),  # links -> anchor text
    (r"(?m)^#{1,6}[ \t]*", ""),  # ATX headers
    (r"(?m)^>[ \t]?", ""),  # blockquote markers
    (r"\*\*([^*\n]+)\*\*", "$1"),  # bold
    (r"\*([^*\n]+)\*", "$1"),  # italic
    (r"__([^_\n]+)__", "$1"),  # bold (underscore)
    (r"_([^_\n]+)_", "$1"),  # italic (underscore)
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),  # unordered list bullets
    (r"(?m)^[ \t]*\d{1,3}\.[ \t]+", ""),  # ordered list numbers
    (r"(?m)^[ \t]*[-_*][ \t]*[-_*][ \t]*[-_*][-_* \t]*$", ""),  # hrules
    (r"(?m)^[|: \t-]*\|[|: \t-]*$", ""),  # table separator rows
    (r"[ \t]*\|[ \t]*", " "),  # table cell pipes
]

# whitespace normalization identical to web._WS_CHAIN
_WS_CHAIN: list[tuple[str, str]] = [
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
]


def strip_markdown(col: Column | str) -> Column:
    """Visible text of a Markdown document as one JVM expression chain
    (:data:`STRIP_CHAIN` + whitespace normalization).  Plain text with
    no Markdown syntax passes through unchanged up to whitespace
    normalization — pinned by test."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in STRIP_CHAIN + _WS_CHAIN:
        c = F.regexp_replace(c, pat, rep)
    return c


def sql_strip_chain(expr: str) -> str:
    """Render the SAME chain as a nested DuckDB expression over
    ``expr`` (RE2 dialect: ``\\1`` replacements, ``'g'`` flag) — the
    oracle half of the extraction contract."""
    out = expr
    for pat, rep in STRIP_CHAIN + _WS_CHAIN:
        p = pat.replace("'", "''")
        r = rep.replace("$1", "\\1").replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def md_stats(
    df: DataFrame, md_col: str = "md", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Markdown profile in one scan: extracted ``text``,
    ``n_links``, ``n_images``, ``n_headers``, ``n_code_spans`` — the
    quality signals a corpus filter thresholds on (link farms and
    nav-only pages are link-dense in Markdown exactly as in HTML)."""
    c = F.col(md_col)
    # links = bracket-parens pairs minus images (RE2-safe: counting
    # with a lookbehind would break the oracle's regex dialect)
    n_all = F.regexp_count(c, F.lit(r"\[[^\]]*\]\([^)]*\)"))
    n_img = F.regexp_count(c, F.lit(r"!\[[^\]]*\]\([^)]*\)"))
    return df.select(
        F.col(id_col),
        strip_markdown(c).alias("text"),
        (n_all - n_img).alias("n_links"),
        n_img.alias("n_images"),
        F.regexp_count(c, F.lit(r"(?m)^#{1,6}[ \t]")).alias("n_headers"),
        F.regexp_count(c, F.lit(r"`[^`\n]+`")).alias("n_code_spans"),
    )
