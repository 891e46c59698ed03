"""HTML → text extraction for web corpora — the FIRST stage of an LLM
data pipeline (raw crawl HTML in, visible text out), expressed entirely
as JVM-side column expressions (chained ``regexp_replace`` /
``replace``): no UDF, whole-stage-codegen-friendly, linear single-scan
cost per document — the only shape that survives a 100 TB crawl.

Design notes (the scale lens):

- **Regex dialect discipline.**  Every pattern is RE2-safe (no
  backreferences, no lookaround) so the SAME pattern strings run under
  Spark's Java regex AND DuckDB's RE2 — the registered query's oracle
  replays the exact chain in SQL.
- **Entity decoding** covers the named entities that dominate real
  crawl text (``&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;``) AND all
  numeric character references (``&#960;`` decimal / ``&#x3C0;`` hex),
  still UDF-free: the arithmetic-to-codepoint step is
  ``conv``/``unhex``/``decode(…, 'UTF-32')`` — a pure expression that
  covers the full Unicode range including astral planes (Spark's
  ``char()`` is mod-256 and CANNOT do this).  The oracle replays with
  DuckDB ``chr()``.  Known single-pass quirk, same philosophy as
  ``&amp;`` ordering last: ``&#38;lt;`` decodes in two passes to ``<``
  where a spec parser yields ``&lt;`` — double-escaped AMPERSAND forms
  (``&amp;#960;``) are handled correctly because numeric decode runs
  before the named-entity chain.
- **Block structure** is preserved as newlines (block-level tags emit
  ``\\n`` before stripping) so paragraph-aware downstream stages
  (chunking, span dedup) see real boundaries instead of one soup line.

Reference parity: /root/reference has no web surface — §7.5 extension
scope (the reference's users curate tabular data; an LLM-corpus engine
must also curate crawl text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# block-level elements whose boundaries become newlines; inline tags
# (a, b, span, ...) are stripped without injecting whitespace
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|section|article"
    "|header|footer|blockquote|pre|hr"
)

# (pattern, replacement) chain — order matters: comments and
# script/style/noscript PAYLOADS go first (their text is not content),
# then block boundaries, then every remaining tag, then entities.
_STRIP_CHAIN: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<noscript[^>]*>.*?</noscript>", " "),
    # the whole <head> is metadata, not body text (title is surfaced
    # separately by html_title)
    (r"(?is)<head[^>]*>.*?</head>", " "),
    (r"(?i)</?(" + _BLOCK_TAGS + r")\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

# numeric character references — the SAME RE2-safe pattern string runs
# under Spark's Java regex and DuckDB (sql_decode_charrefs renders the
# oracle replay from this constant).  ONE combined alternation so both
# forms decode in a SINGLE leftmost-match pass: a decoded character can
# never splice with following text into a new ref (running decimal then
# hex as two passes made '&#38;#x3C0;' decode to 'π' where a spec parser
# yields the literal '&#x3C0;' — the r11 ADVICE finding).  Bounded
# repetition keeps the match well inside int range; longer digit runs
# simply don't match and stay literal in BOTH dialects.
_CHARREF = r"&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

# valid decode range: [1, 0x10FFFF] minus the UTF-16 surrogate block —
# outside it the ref is kept as literal text in both dialects (DuckDB
# chr() errors on surrogates; Java decode would emit U+FFFD — keeping
# the literal is the one behavior both engines can express identically)
_CP_MIN, _CP_MAX = 1, 0x10FFFF
_SURR_LO, _SURR_HI = 0xD800, 0xDFFF


def _cp_char(cp: Column) -> Column:
    """Codepoint (bigint column) → one-char string, full Unicode range,
    pure expression: decimal → hex → 4-byte big-endian binary →
    ``decode(…, 'UTF-32')``.  (Spark's ``char()`` is mod-256 and cannot
    reach beyond Latin-1.)"""
    return F.decode(
        F.unhex(F.lpad(F.conv(cp.cast("string"), 10, 16), 8, "0")),
        "UTF-32",
    )


def _decode_ref_form(c: Column, pat: str) -> Column:
    """Decode every numeric ref (both forms — the capture is either
    ``960`` or ``x3C0``) in ``c`` in ONE pass: split on the pattern,
    decode each captured ref, stitch back ``parts[0] + ch0 + parts[1]
    + ch1 + …`` with zip_with/aggregate — one scan, no UDF."""
    parts = F.split(c, pat)
    refs = F.regexp_extract_all(c, F.lit(pat), F.lit(1))

    def one(r: Column) -> Column:
        is_hex = F.substring(r, 1, 1).isin("x", "X")
        cp = F.when(is_hex, F.conv(F.substring(r, 2, 6), 16, 10)).otherwise(
            r
        ).cast("bigint")
        valid = (
            (cp >= _CP_MIN)
            & (cp <= _CP_MAX)
            & ((cp < _SURR_LO) | (cp > _SURR_HI))
        )
        # out-of-range refs stay literal, ORIGINAL spelling preserved
        # (the capture includes the x/X for hex form)
        literal = F.concat(F.lit("&#"), r, F.lit(";"))
        return F.when(valid, _cp_char(cp)).otherwise(literal)

    pieces = F.zip_with(
        F.transform(refs, one),
        F.slice(parts, 2, F.size(refs)),
        lambda ch, p: F.concat(ch, p),
    )
    return F.concat(
        F.element_at(parts, 1),
        F.aggregate(pieces, F.lit(""), lambda a, x: F.concat(a, x)),
    )


def decode_charrefs(col: Column | str) -> Column:
    """Decode HTML numeric character references (``&#960;`` and
    ``&#x3C0;`` / ``&#X3C0;``) to their Unicode characters — full
    codepoint range, expression-only.  Out-of-range / surrogate refs
    stay literal with their original spelling.  Both forms decode in a
    SINGLE leftmost-match pass over one combined pattern, so a decoded
    character can never splice with following text into a second ref
    (``&#38;#x3C0;`` yields the literal ``&#x3C0;``, matching a spec
    parser — the two-pass r11 rendering decoded it to ``π``)."""
    c = F.col(col) if isinstance(col, str) else col
    return _decode_ref_form(c, _CHARREF)


def _sql_decode_ref_form(expr: str, pat: str) -> str:
    """DuckDB rendering of :func:`_decode_ref_form` — same combined
    pattern string, same hex/decimal dispatch on the capture's first
    character, same validity guard, same literal-keep fallback."""
    cp = (
        "(CASE WHEN lower(r[1]) = 'x' THEN CAST('0x' || r[2:] AS BIGINT) "
        "ELSE CAST(r AS BIGINT) END)"
    )
    lit = "'&#' || r || ';'"
    dec = (
        f"list_transform(regexp_extract_all({expr}, '{pat}', 1), "
        f"r -> CASE WHEN {cp} BETWEEN {_CP_MIN} AND {_CP_MAX} "
        f"AND NOT ({cp} BETWEEN {_SURR_LO} AND {_SURR_HI}) "
        f"THEN chr(CAST({cp} AS INTEGER)) ELSE {lit} END)"
    )
    parts = f"string_split_regex({expr}, '{pat}')"
    return (
        f"array_to_string(list_prepend(({parts})[1], "
        f"list_transform(list_zip({dec}, ({parts})[2:]), "
        f"z -> z[1] || z[2])), '')"
    )


def sql_decode_charrefs(expr: str) -> str:
    """DuckDB SQL replay of :func:`decode_charrefs` over ``expr`` —
    rendered from the same pattern constant so the oracle and the
    engine cannot drift."""
    return _sql_decode_ref_form(expr, _CHARREF)


_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST, so "&amp;lt;" decodes to "&lt;" not "<"
]

# whitespace normalization: collapse runs of spaces/tabs, trim around
# newlines, collapse newline runs, trim the ends
_WS_CHAIN: list[tuple[str, str]] = [
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
]


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML document as a single JVM expression
    chain: comments/script/style payloads dropped, block tags →
    newlines, all tags stripped, common named entities decoded,
    whitespace normalized.  Plain text (no ``<``/``&``) passes through
    unchanged up to whitespace normalization — pinned by test."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_CHAIN:
        c = F.regexp_replace(c, pat, rep)
    # numeric refs BEFORE the named chain: '&amp;#960;' must yield the
    # literal '&#960;' (double-escaped), which only works if the
    # numeric pass no longer sees it after '&amp;' → '&'
    c = decode_charrefs(c)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, rep in _WS_CHAIN:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_title(col: Column | str) -> Column:
    """``<title>`` text ('' when absent), entity-decoded and trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1)
    t = decode_charrefs(t)
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_links(col: Column | str) -> Column:
    """``array<string>`` of href targets from anchor tags (both quote
    styles), document order preserved."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.regexp_extract_all(
            c, F.lit(r'(?is)<a\s[^>]*href="([^"]*)"'), F.lit(1)
        ),
        F.regexp_extract_all(
            c, F.lit(r"(?is)<a\s[^>]*href='([^']*)'"), F.lit(1)
        ),
    )


def link_density(col: Column | str) -> Column:
    """Fraction of the VISIBLE text that sits inside anchor tags — the
    classic boilerplate signal (nav bars / footers are link-dense,
    article bodies are not).  Computed as anchor-text length over total
    visible-text length; 0.0 for documents with no visible text."""
    c = F.col(col) if isinstance(col, str) else col
    anchor_text = strip_html(
        F.concat_ws(
            " ",
            F.regexp_extract_all(
                c, F.lit(r"(?is)<a\s[^>]*>(.*?)</a>"), F.lit(1)
            ),
        )
    )
    total = F.length(strip_html(c))
    return F.when(total > 0, F.length(anchor_text) / total).otherwise(
        F.lit(0.0)
    )


def html_stats(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document extraction profile in ONE scan: extracted ``text``,
    ``title``, ``n_links``, ``link_density``, ``text_ratio`` (visible
    chars over raw chars — near-zero flags markup-only/boilerplate
    shells worth dropping before tokenization)."""
    c = F.col(html_col)
    return df.select(
        F.col(id_col),
        strip_html(c).alias("text"),
        html_title(c).alias("title"),
        F.size(extract_links(c)).alias("n_links"),
        F.round(link_density(c), 6).alias("link_density"),
        F.round(
            F.when(
                F.length(c) > 0, F.length(strip_html(c)) / F.length(c)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("text_ratio"),
    )


def url_host(col: Column | str) -> Column:
    """Lower-cased host of a URL ('' when unparseable) — the grouping
    key for per-site corpus stats and crawl politeness accounting.
    Registrable-domain (PSL) grouping needs the public-suffix list — a
    lookup table join, not a string function — and is intentionally not
    faked here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.coalesce(F.try_parse_url(c, F.lit("HOST")), F.lit("")))


def url_path(col: Column | str) -> Column:
    """Path component of a URL ('' when absent/unparseable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit(""))


def url_normalize(col: Column | str) -> Column:
    """Canonical URL form for exact URL-level dedup of a crawl frontier:
    scheme and host lower-cased, default ports dropped (``:80`` http /
    ``:443`` https), fragment dropped, trailing ``/`` trimmed from
    non-root paths.  Query strings are KEPT (they are content-bearing
    for many sites); session-id stripping is site policy, not a default.
    Pure expression chain — dedup is then a plain hash groupBy."""
    c = F.col(col) if isinstance(col, str) else col
    # drop the fragment first so later regexes see a bounded string
    c = F.regexp_replace(c, r"#.*$", "")
    # lower-case scheme://host (authority ends at /, ?, or end)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([^/?#]*//[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[^/?#]*//[^/?#]*", ""),
    )
    # default-port strip only when the authority is well-formed
    # ([userinfo@] host-with-no-colon | [bracketed-ipv6]) — a lax
    # non-greedy form stripped ':80' twice from the malformed
    # 'http://:80:80' and broke idempotence (hypothesis-found) — and
    # only for the port that is ACTUALLY the scheme's default
    # (http://host:443 is a distinct resource and must survive)
    _AUTH = r"(?:[^/?#@]*@)?(?:\[[^\]/?#]*\]|[^/?#:]+)"
    c = F.regexp_replace(
        c, rf"^(http://{_AUTH}):80(?=[/?#]|$)", r"$1"
    )
    c = F.regexp_replace(
        c, rf"^(https://{_AUTH}):443(?=[/?#]|$)", r"$1"
    )
    # trim one trailing slash from a non-root path (keep "host/" root)
    c = F.regexp_replace(c, r"^([^?#]*[^/?#])/(\?|#|$)", r"$1$2")
    return c


# ---------------------------------------------------------------------------
# Content-type sniffing — magic-byte dispatch for crawl payloads
# ---------------------------------------------------------------------------

# (mime, [(offset, magic), ...]) — ALL (offset, magic) pairs must match;
# first matching entry wins, ordered so containers that embed other
# magics (RIFF variants, MP4's offset-4 ftyp) are decided before the
# generic fallbacks.  RIFF-family entries require BOTH the 'RIFF'
# prefix at 0 and the family tag at 8 (tag alone misclassifies
# unrelated payloads that happen to carry those bytes at offset 8);
# mp4 requires the ftyp box-size high bytes to be zero (the ftyp box
# is tens of bytes in every real file) next to the offset-4 tag.
# Public magic numbers only.
_MAGIC_TABLE: list[tuple[str, list[tuple[int, bytes]]]] = [
    ("application/pdf", [(0, b"%PDF")]),
    ("image/png", [(0, b"\x89PNG\r\n\x1a\n")]),
    ("image/jpeg", [(0, b"\xff\xd8\xff")]),
    ("image/gif", [(0, b"GIF8")]),
    ("image/bmp", [(0, b"BM")]),
    ("image/tiff", [(0, b"II*\x00")]),
    ("image/tiff", [(0, b"MM\x00*")]),
    ("image/webp", [(0, b"RIFF"), (8, b"WEBP")]),
    ("audio/wav", [(0, b"RIFF"), (8, b"WAVE")]),
    ("video/avi", [(0, b"RIFF"), (8, b"AVI ")]),
    ("audio/flac", [(0, b"fLaC")]),
    ("audio/ogg", [(0, b"OggS")]),
    ("audio/mpeg", [(0, b"ID3")]),
    ("audio/mpeg", [(0, b"\xff\xfb")]),
    ("video/mp4", [(0, b"\x00\x00"), (4, b"ftyp")]),
    ("video/x-matroska", [(0, b"\x1a\x45\xdf\xa3")]),
    ("application/zip", [(0, b"PK\x03\x04")]),
    ("application/gzip", [(0, b"\x1f\x8b")]),
]


def sniff_mime(col: Column | str) -> Column:
    """Magic-byte content-type sniff over a binary payload column — the
    triage step between crawl ingest (WARC bodies arrive with missing
    or lying ``Content-Type`` headers) and the typed decode pipelines.
    Pure JVM expression: a first-match ``when`` chain over binary
    ``substring`` prefix compares (no UDF, codegen-friendly, prefix
    reads only).  HTML is detected structurally (leading ``<!doctype``
    / ``<html`` after optional whitespace/BOM); everything unmatched is
    ``application/octet-stream``."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for mime, checks in _MAGIC_TABLE:
        cond = None
        for off, magic in checks:
            one = F.substring(c, off + 1, len(magic)) == F.lit(magic)
            cond = one if cond is None else cond & one
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    # HTML: decode a bounded prefix and match the document shell
    # a UTF-8 BOM decodes to one U+FEFF char after the string cast
    head = F.lower(F.substring(c, 1, 256).cast("string"))
    is_html = head.rlike("^\\s*\uFEFF?\\s*<(!doctype\\s+html|html)")
    return expr.when(is_html, "text/html").otherwise(
        "application/octet-stream"
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl politeness as expressions
# ---------------------------------------------------------------------------


def robots_rules(col: Column | str, agent: str) -> Column:
    """Parse a robots.txt payload into the rule array that APPLIES to
    ``agent``: ``array<struct<allow:boolean, path:string>>``.

    Pure expression-level stateful fold (``aggregate`` over lines — no
    UDF): a run of consecutive ``User-agent`` lines opens a group
    (blank lines are NOT group separators under RFC 9309 — two UA
    lines with only whitespace between them share one group, unlike
    the legacy 1994 REP); groups NAMING the agent (case-insensitive)
    win outright, and the ``*`` groups apply only when no group names
    the agent (§2.2.1).  Comments are stripped; unknown directives
    (Crawl-delay, Sitemap) end a user-agent run but contribute no
    rules.  Wildcard patterns (``*``/``$``) inside paths are NOT
    interpreted (they need regex translation — named out of scope);
    they still participate as literal prefixes."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(
        F.transform(
            F.split(F.regexp_replace(c, r"\r\n?", "\n"), r"\n"),
            lambda l: F.trim(F.regexp_replace(l, r"#.*$", "")),
        ),
        lambda l: l != "",
    )
    a = F.lit(agent.lower())
    rules_t = "array<struct<allow:boolean,path:string>>"
    acc0 = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(False).alias("ua_run"),
        F.array().cast(rules_t).alias("named"),
        F.array().cast(rules_t).alias("star"),
        F.lit(False).alias("named_seen"),
    )

    def step(acc, l):
        low = F.lower(l)
        val = F.trim(F.regexp_extract(l, r"^[^:]*:(.*)$", 1))
        is_ua = low.rlike(r"^user-agent[ \t]*:")
        is_dis = low.rlike(r"^disallow[ \t]*:")
        is_alw = low.rlike(r"^allow[ \t]*:")
        agents = F.when(
            is_ua & acc["ua_run"],
            F.array_append(acc["agents"], F.lower(val)),
        ).when(is_ua, F.array(F.lower(val))).otherwise(acc["agents"])
        in_named = F.array_contains(acc["agents"], a)
        in_star = F.array_contains(acc["agents"], "*")
        rule = F.struct(is_alw.alias("allow"), val.alias("path"))
        is_rule = (is_dis | is_alw) & (val != "")
        named = F.when(
            is_rule & in_named, F.array_append(acc["named"], rule)
        ).otherwise(acc["named"])
        star = F.when(
            is_rule & in_star, F.array_append(acc["star"], rule)
        ).otherwise(acc["star"])
        return F.struct(
            agents.alias("agents"),
            is_ua.alias("ua_run"),
            named.alias("named"),
            star.alias("star"),
            # an (even empty) group NAMING the agent makes * inapplicable
            (acc["named_seen"] | (is_ua & (F.lower(val) == a))).alias(
                "named_seen"
            ),
        )

    # RFC 9309 §2.2.1: use the group(s) naming the agent when any
    # exist; only otherwise fall back to the '*' group(s)
    return F.aggregate(
        lines,
        acc0,
        step,
        lambda acc: F.when(acc["named_seen"], acc["named"]).otherwise(
            acc["star"]
        ),
    )


def robots_allows(rules: Column, path: Column | str) -> Column:
    """RFC 9309 longest-match evaluation of a parsed rule array against
    a URL path: the most specific (longest) matching rule wins; an
    Allow beats a Disallow of equal length; no match ⇒ allowed.  Pure
    expressions — two folds over the (tiny) per-group rule array."""
    p = F.col(path) if isinstance(path, str) else path

    def best_len(allow: bool) -> Column:
        return F.aggregate(
            F.filter(
                rules,
                lambda r: (r["allow"] == F.lit(allow))
                & p.startswith(r["path"]),
            ),
            F.lit(-1),
            lambda acc, r: F.greatest(acc, F.length(r["path"])),
        )

    return best_len(True) >= best_len(False)


def sitemap_locs(col: Column | str) -> Column:
    """``array<struct<loc:string, lastmod:string>>`` from a sitemap XML
    payload (plain urlset or sitemapindex — both use ``<loc>``):
    frontier seeding without an XML library.  Entity-decoding of
    ``&amp;`` in URLs is applied (the one entity sitemaps commonly
    carry); ``lastmod`` is '' when absent."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.concat(
        F.regexp_extract_all(
            c, F.lit(r"(?is)<url>(.*?)</url>"), F.lit(1)
        ),
        F.regexp_extract_all(
            c, F.lit(r"(?is)<sitemap>(.*?)</sitemap>"), F.lit(1)
        ),
    )
    return F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                F.replace(
                    F.trim(
                        F.regexp_extract(
                            b, r"(?is)<loc>(.*?)</loc>", 1
                        )
                    ),
                    F.lit("&amp;"),
                    F.lit("&"),
                ).alias("loc"),
                F.trim(
                    F.regexp_extract(b, r"(?is)<lastmod>(.*?)</lastmod>", 1)
                ).alias("lastmod"),
            ),
        ),
        lambda s: s["loc"] != "",
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iters: int = 10,
    tol: float | None = 1e-6,
    checkpoint_every: int = 4,
    info: dict | None = None,
) -> DataFrame:
    """PageRank over the crawl link graph — the classic page-quality
    prior a corpus curator mixes into sampling weights.  Returns
    ``(id, rank)`` with Σrank = number of nodes (the standard
    unnormalized convention; mass conservation is pinned by test).

    Convergence: iterate until the per-node-normalized L¹ delta
    ``Σ|rank − prev| ≤ tol·n`` or ``n_iters``, whichever first; the
    residual is ONE extra scalar agg per iteration (same driver-sized
    shape as the dangling agg — never a vector collect).  Pass
    ``tol=None`` for exactly ``n_iters`` fixed iterations, or an empty
    dict as ``info`` to receive ``{'iterations', 'residual'}`` back.

    Plan shape (the 100 TB lens): per iteration ONE join of the rank
    vector against the out-degree-annotated edge list on ``src`` and
    ONE groupBy on ``dst`` — both shuffles hash-partition on the same
    keys every iteration, so AQE reuses the exchange layout; dangling
    mass (sink pages) is redistributed via a scalar agg (driver-sized,
    never a collect of the vector).  ``localCheckpoint`` every few
    iterations truncates the lineage — an iterative DataFrame loop
    otherwise re-plans a growing DAG (documented Spark failure mode).
    Damping/teleport follow Page et al. 1999."""
    src, dst = F.col(src_col), F.col(dst_col)
    # e feeds FOUR consumers at setup (both sides of the node union, the
    # out-degree aggregate, the link join) — persist so the upstream edge
    # derivation (often a full corpus link-extraction) runs once, not 4×;
    # dropped right after the links cache materializes (r13 optimization,
    # guide §2.4/§5.3, found via spikes/scan_multiplicity.py).
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    ).cache()
    n = nodes.count()
    if info is not None:
        info["iterations"] = 0
        info["residual"] = 0.0
    if n == 0:
        e.unpersist()
        return nodes.select("id", F.lit(0.0).alias("rank"))
    # out_deg is node-sized and read by the dangling-mass action EVERY
    # iteration — uncached it re-derived the whole edge list per
    # iteration (one corpus re-scan per PageRank step)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    links = e.join(out_deg, "src").cache()
    links.count()
    e.unpersist()
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    cached_prev = None
    try:
        for i in range(n_iters):
            contrib = (
                links.join(
                    ranks.withColumnRenamed("id", "src"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
            )
            # dangling pages (no outlinks) spread their mass uniformly:
            # a scalar, not a vector — one tiny agg per iteration
            dangling = (
                ranks.join(
                    out_deg.withColumnRenamed("src", "id"), "id", "left_anti"
                )
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            base = (1.0 - damping) + damping * dangling / n
            new_ranks = nodes.join(contrib, "id", "left").select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
                new_ranks = new_ranks.localCheckpoint()
            if tol is not None:
                # materialize the new vector once (cache), then the L¹
                # delta vs the previous vector is a scalar agg over one
                # same-key join — the early-stop signal
                new_ranks = new_ranks.cache()
                resid = (
                    new_ranks.join(
                        ranks.select(
                            "id", F.col("rank").alias("__prev")
                        ),
                        "id",
                    )
                    .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))))
                    .first()[0]
                )
                if cached_prev is not None:
                    cached_prev.unpersist()
                cached_prev = new_ranks
                ranks = new_ranks
                if info is not None:
                    info["iterations"] = i + 1
                    info["residual"] = float(resid)
                if resid <= tol * n:
                    break
            else:
                ranks = new_ranks
                if info is not None:
                    info["iterations"] = i + 1
        # Hand back a lineage-free result on BOTH paths: the finally below
        # releases the nodes/links caches, so an un-checkpointed return
        # (the old tol=None path) recomputed the ENTIRE iteration lineage —
        # including the edge derivation, corpus scans and all — when the
        # caller finally consumed it (r13 optimization; the final plan
        # carried 18 relation leaves at n_iters=4,
        # spikes/scan_multiplicity.py).  One eager materialization here
        # runs while every cache is still alive.
        ranks = ranks.localCheckpoint()
        if cached_prev is not None:
            cached_prev.unpersist()
        return ranks
    finally:
        nodes.unpersist()
        links.unpersist()
        out_deg.unpersist()
