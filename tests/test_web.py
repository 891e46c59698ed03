"""HTML -> text extraction (functions/web.py): strip chain, entity
decode, title/link recovery, boilerplate signals — all JVM expressions
(no UDF; the plan lint covers the registered query)."""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import web
from tests.conftest import SF_SMOKE


def _one(spark, html, col):
    return spark.createDataFrame([(html,)], "html string").select(
        col("html").alias("v")
    ).first()["v"]


def test_strip_html_drops_nonvisible_payloads(spark):
    html = (
        '<html><head><title>T</title><style>p{x}</style></head>'
        '<body><!-- c --><script a="b">var x = "<p>hidden</p>";</script>'
        "<h1>Head</h1><p>Body &lt;tag&gt; &amp;amp; rest</p>"
        "<noscript>enable js</noscript></body></html>"
    )
    out = _one(spark, html, web.strip_html)
    assert out == "Head\nBody <tag> &amp; rest"
    assert "hidden" not in out and "enable js" not in out
    assert "T" not in out.split("\n")[0][:1] or True  # head dropped


def test_strip_html_block_boundaries_become_newlines(spark):
    out = _one(
        spark,
        "<div>one</div><p>two</p><span>three</span> four<br>five",
        web.strip_html,
    )
    assert out == "one\ntwo\nthree four\nfive"


def test_strip_html_plain_text_passthrough(spark):
    assert _one(spark, "no markup  here", web.strip_html) == "no markup here"
    assert _one(spark, "", web.strip_html) == ""


def test_title_and_links(spark):
    html = (
        "<html><head><title> A &amp; B \n C </title></head><body>"
        '<a href="https://x/1">one</a><a id=q href=\'https://x/2\'>two</a>'
        "</body></html>"
    )
    assert _one(spark, html, web.html_title) == "A & B C"
    assert _one(spark, html, web.extract_links) == [
        "https://x/1", "https://x/2",
    ]
    assert _one(spark, "<p>no title</p>", web.html_title) == ""


def test_link_density_and_stats(spark):
    nav = '<body><a href="/a">aaaa</a><a href="/b">bbbb</a></body>'
    article = "<body><p>" + "w " * 50 + '</p><a href="/c">cc</a></body>'
    df = spark.createDataFrame(
        [(1, nav), (2, article), (3, "<p></p>")], "doc_id long, html string"
    )
    out = {r["doc_id"]: r for r in web.html_stats(df).collect()}
    assert out[1]["link_density"] > 0.8  # nav shell: almost all link text
    assert out[2]["link_density"] < 0.1  # article: link text is a sliver
    assert out[3]["link_density"] == 0.0 and out[3]["text"] == ""
    assert out[1]["n_links"] == 2 and out[2]["n_links"] == 1
    assert 0 < out[2]["text_ratio"] < 1


@settings(max_examples=20, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_strip_html_markup_free_fuzz(spark, words):
    """Markup-free text (no < > & and single-spaced) survives the full
    chain unchanged — the stripper never invents or eats content.
    (session-scoped spark fixture is hypothesis-safe)"""
    txt = " ".join(words)
    got = _one(spark, txt, web.strip_html)
    assert got == txt


def test_decode_charrefs_forms(spark):
    cases = [
        ("pi &#960; ok", "pi π ok"),
        ("hex &#x3C0; ok", "hex π ok"),
        ("upper &#X3C0; ok", "upper π ok"),
        ("astral &#x1F600;!", "astral \U0001F600!"),
        ("ascii &#65;&#66;", "ascii AB"),
        # out-of-range and surrogate refs stay literal
        ("bad &#1114112; x", "bad &#1114112; x"),
        ("surr &#xD800; x", "surr &#xD800; x"),
        ("zero &#0; x", "zero &#0; x"),
        # 8-digit run: pattern bounded at 7, stays literal
        ("long &#12345678; x", "long &#12345678; x"),
        # no semicolon: not a ref
        ("amp &#960 x", "amp &#960 x"),
        ("plain text", "plain text"),
        ("", ""),
        # single-pass: a decoded '&' must NOT splice into a second ref
        # (the r11 two-pass chain decoded both of these to 'π')
        ("splice &#38;#x3C0; x", "splice &#x3C0; x"),
        ("splice &#x26;#960; x", "splice &#960; x"),
        # literal keep preserves the original hex spelling (incl. case)
        ("surr &#XD800; x", "surr &#XD800; x"),
        # mixed forms interleaved decode in one leftmost pass
        ("&#65;&#x42;&#67;", "ABC"),
    ]
    for src, want in cases:
        assert _one(spark, src, web.decode_charrefs) == want, src


def test_strip_html_decodes_numeric_refs(spark):
    html = (
        "<p>pi &#960; grin &#x1F600;</p>"
        "<p>double &amp;#960; stays literal</p>"
    )
    out = _one(spark, html, web.strip_html)
    assert out == "pi π grin \U0001F600\ndouble &#960; stays literal"
    # title path decodes too
    t = "<head><title>x &#x41;&#66; &amp; y</title></head>"
    assert _one(spark, t, web.html_title) == "x AB & y"


@settings(max_examples=25, deadline=None)
@given(
    cps=st.lists(
        st.integers(min_value=1, max_value=0x10FFFF).filter(
            lambda c: not (0xD800 <= c <= 0xDFFF)
        ),
        min_size=1,
        max_size=10,
    ),
    hexform=st.booleans(),
)
def test_decode_charrefs_fuzz_matches_python(spark, cps, hexform):
    """Random valid codepoints, rendered as decimal or hex refs with
    plain-text separators, decode exactly to Python's chr()."""
    src = "s".join(
        (f"&#x{c:x};" if hexform else f"&#{c};") for c in cps
    )
    want = "s".join(chr(c) for c in cps)
    assert _one(spark, src, web.decode_charrefs) == want


def test_sql_decode_charrefs_matches_spark(spark, duck):
    """The DuckDB rendering replays the Spark expression exactly over
    a mixed fixture (the oracle-drift guard for the shared chain)."""
    fixtures = [
        "pi &#960; grin &#x1F600; bad &#1114112; surr &#xdfff;",
        "plain", "", "&#65;&#x42;&#67;", "edge &#960",
        "&#0;&#55296;&#9999999;",
    ]
    got_spark = [
        _one(spark, s, web.decode_charrefs) for s in fixtures
    ]
    got_duck = [
        duck.execute(
            "WITH x AS (SELECT ?::VARCHAR AS s) SELECT "
            + web.sql_decode_charrefs("s")
            + " FROM x",
            [s],
        ).fetchone()[0]
        for s in fixtures
    ]
    assert got_spark == got_duck


def test_html_stats_over_documents_table(spark):
    """Wrap the real documents table in HTML shells and verify the
    extracted text round-trips exactly (whitespace-normal input)."""
    from entropy_balance_weighting_spark.session import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    wrapped = docs.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("<body><p>"), F.col("text"), F.lit("</p></body>")
        ).alias("html"),
    )
    out = web.html_stats(wrapped).join(
        wrapped.select("doc_id", F.col("text").alias("orig")), "doc_id"
    )
    bad = out.filter(F.col("text") != F.col("orig")).count()
    assert bad == 0


def test_url_host_path_normalize(spark):
    cases = [
        ("HTTP://Example.COM:80/Path/?q=1#frag",
         "example.com", "/Path/", "http://example.com/Path?q=1"),
        ("https://a.example:443/x/", "a.example", "/x/",
         "https://a.example/x"),
        ("https://a.example", "a.example", "", "https://a.example"),
        # non-default port survives normalization
        ("http://b.example:8080/y", "b.example", "/y",
         "http://b.example:8080/y"),
        # the OTHER scheme's default port is NOT this scheme's default
        ("http://c.example:443/z", "c.example", "/z",
         "http://c.example:443/z"),
        ("https://d.example:80/z", "d.example", "/z",
         "https://d.example:80/z"),
        # junk input: host '' (try_parse_url), normalize passes through
        ("not a url", "", "", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "u string")
    got = {
        r["u"]: (r["h"], r["p"], r["n"])
        for r in df.select(
            "u",
            web.url_host("u").alias("h"),
            web.url_path("u").alias("p"),
            web.url_normalize("u").alias("n"),
        ).collect()
    }
    for u, h, p, n in cases:
        assert got[u] == (h, p, n), (u, got[u])


def test_url_normalize_enables_exact_dedup(spark):
    """Equivalent crawl-frontier spellings collapse to one canonical
    form, distinct resources stay distinct — URL dedup is then a plain
    groupBy on the normalized column."""
    urls = [
        "http://Site.example/a/",
        "http://site.example:80/a",
        "http://site.example/a#sec2",
        "http://site.example/b",
        "https://site.example/a",   # different scheme = different resource
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    n = df.select(web.url_normalize("u").alias("n")).distinct().count()
    assert n == 3  # {http .../a, http .../b, https .../a}


def test_sniff_mime_magic_table(spark):
    import gzip

    cases = [
        (b"%PDF-1.7 x", "application/pdf"),
        (b"\x89PNG\r\n\x1a\n00", "image/png"),
        (b"\xff\xd8\xff\xe0", "image/jpeg"),
        (b"GIF89a", "image/gif"),
        (b"RIFF1234WAVEfmt", "audio/wav"),
        (b"RIFF1234WEBPVP8", "image/webp"),
        (b"RIFF1234AVI LIST", "video/avi"),
        (b"\x00\x00\x00\x18ftypisom", "video/mp4"),
        (b"ID3\x04", "audio/mpeg"),
        (b"\xff\xfb\x90\x00", "audio/mpeg"),
        (b"OggS\x00", "audio/ogg"),
        (b"fLaC\x00", "audio/flac"),
        (b"\x1a\x45\xdf\xa3mkv", "video/x-matroska"),
        (b"II*\x00tiff", "image/tiff"),
        (b"MM\x00*tiff", "image/tiff"),
        (b"BMxx", "image/bmp"),
        (b"PK\x03\x04", "application/zip"),
        (gzip.compress(b"x"), "application/gzip"),
        (b"  <!DOCTYPE html><p>hi", "text/html"),
        (b"<html lang=en>", "text/html"),
        (b"\xef\xbb\xbf<html>", "text/html"),
        (b"plain words here", "application/octet-stream"),
        (b"", "application/octet-stream"),
        # family tag at offset 8 WITHOUT the RIFF prefix must not match
        (b"XXXX1234WAVEfmt", "application/octet-stream"),
        (b"notRIFFxWEBPVP8", "application/octet-stream"),
        (b"________AVI LIST", "application/octet-stream"),
        # 'ftyp' at offset 4 with an implausible box size is not mp4
        (b"ZZZZftypisom", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
        "id int, payload binary",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", web.sniff_mime("payload").alias("m")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


_ROBOTS = """# politeness file
User-agent: badbot
Disallow: /

User-agent: goodbot
User-agent: okbot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 3

User-agent: *
Disallow: /tmp/
"""


def _allowed(spark, agent, path):
    return (
        spark.createDataFrame([(_ROBOTS,)], "r string")
        .select(
            web.robots_allows(
                web.robots_rules("r", agent), F.lit(path)
            ).alias("a")
        )
        .first()["a"]
    )


def test_robots_longest_match_and_group_selection(spark):
    # named group: longest match wins, Allow beats equal Disallow
    assert _allowed(spark, "goodbot", "/public/x") is True
    assert _allowed(spark, "goodbot", "/private/x") is False
    assert _allowed(spark, "goodbot", "/private/ok/page") is True
    assert _allowed(spark, "okbot", "/private/x") is False
    # RFC 9309 2.2.1: a named group makes the * group inapplicable
    assert _allowed(spark, "goodbot", "/tmp/y") is True
    # blanket ban group
    assert _allowed(spark, "badbot", "/anything") is False
    # unnamed agents fall back to *
    assert _allowed(spark, "newbot", "/public") is True
    assert _allowed(spark, "newbot", "/tmp/z") is False


def test_robots_rfc_group_merging_and_edge_cases(spark):
    # consecutive UA lines merge across blank lines (RFC 9309, unlike
    # the legacy REP where a blank line ended the group)
    merged = "User-agent: a\n\nUser-agent: *\nDisallow: /x/\n"
    df = spark.createDataFrame([(merged,)], "r string")
    got = df.select(
        web.robots_allows(web.robots_rules("r", "a"), F.lit("/x/1")).alias("v")
    ).first()["v"]
    assert got is False
    # empty file / no matching group => everything allowed
    for payload in ("", "# only comments\n", "User-agent: other\nDisallow: /\n"):
        df = spark.createDataFrame([(payload,)], "r string")
        got = df.select(
            web.robots_allows(
                web.robots_rules("r", "me"), F.lit("/any")
            ).alias("v")
        ).first()["v"]
        assert got is True, payload
    # empty Disallow value is not a rule
    df = spark.createDataFrame([("User-agent: *\nDisallow:\n",)], "r string")
    assert (
        df.select(
            web.robots_allows(
                web.robots_rules("r", "me"), F.lit("/p")
            ).alias("v")
        ).first()["v"]
        is True
    )


def test_sitemap_locs(spark):
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://ex.com/a?x=1&amp;y=2</loc>
       <lastmod>2026-01-02</lastmod></url>
  <url><loc> http://ex.com/b </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""
    locs = (
        spark.createDataFrame([(xml,)], "x string")
        .select(web.sitemap_locs("x").alias("v"))
        .first()["v"]
    )
    assert [(s["loc"], s["lastmod"]) for s in locs] == [
        ("http://ex.com/a?x=1&y=2", "2026-01-02"),
        ("http://ex.com/b", ""),
    ]
    # sitemapindex files use <sitemap> blocks
    idx = "<sitemapindex><sitemap><loc>http://ex.com/s1.xml</loc></sitemap></sitemapindex>"
    locs = (
        spark.createDataFrame([(idx,)], "x string")
        .select(web.sitemap_locs("x").alias("v"))
        .first()["v"]
    )
    assert locs[0]["loc"] == "http://ex.com/s1.xml"


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (4, 0),
        # node 5 is dangling (no outlinks); node 6 links to it
        (6, 5), (2, 6),
    ]
    n = 7
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank"]
        for r in web.pagerank(df, n_iters=12, damping=0.85).collect()
    }
    assert len(got) == n

    # numpy reference: same dangling-redistribution convention
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.ones(n)
    for _ in range(12):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[d] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - 0.85) + 0.85 * (inflow + dangling / n)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # mass conservation and ordering sanity: the hub (2) outranks all
    assert abs(sum(got.values()) - n) < 1e-6
    assert got[2] == max(got.values())


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert web.pagerank(df).count() == 0


def test_pagerank_tol_early_stop_and_mass_invariant(spark):
    """With a tolerance the loop stops when the L1 delta drops under
    tol*n — fewer iterations than the cap — and the mass invariant
    sum(rank) == n holds at the stopping point."""
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (3, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    info: dict = {}
    ranks = web.pagerank(df, n_iters=200, tol=1e-10, info=info)
    rows = ranks.collect()
    n = len(rows)
    assert n == 8
    assert 0 < info["iterations"] < 200  # converged before the cap
    assert info["residual"] <= 1e-10 * n
    assert abs(sum(r["rank"] for r in rows) - n) < 1e-6

    # tol=None runs exactly n_iters and reports the residual-free path
    info2: dict = {}
    web.pagerank(df, n_iters=3, tol=None, info=info2).collect()
    assert info2["iterations"] == 3

    # converged answer agrees with a long fixed-iteration run
    fixed = {
        r["id"]: r["rank"]
        for r in web.pagerank(df, n_iters=120, tol=None).collect()
    }
    got = {r["id"]: r["rank"] for r in rows}
    for i in got:
        assert abs(got[i] - fixed[i]) < 1e-7, i


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["http://", "HTTPS://", "Ex.COM", ":80", ":443", ":8080",
             "/path", "/", "?q=1", "#frag", "a", "B", ".", "//"]
        ),
        min_size=1,
        max_size=8,
    ).map("".join)
)
@example("http://:80:80")
@example("http://u:p@Host.EX:80/a/")
@example("http://[::1]:443/x")
@example("http://foo:80:80/")
def test_url_normalize_is_idempotent(url):
    """normalize(normalize(x)) == normalize(x) — canonical forms must
    be fixed points, or frontier dedup keys drift across passes."""
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(
        app_name="ebw_tests", master="local[4]", shuffle_partitions=4
    )
    row = (
        spark.createDataFrame([(url,)], "u string")
        .select(
            web.url_normalize("u").alias("once"),
            web.url_normalize(web.url_normalize("u")).alias("twice"),
        )
        .first()
    )
    assert row["once"] == row["twice"], (url, row["once"], row["twice"])
