"""Crawl-frontier example — the ACQUISITION side of a web corpus,
chained the way a crawler's data plane would chain it (the curation
funnel in ``corpus_curation.py`` starts where this ends):

1. seed discovery: sitemap XML → ``web.sitemap_locs`` (urlset blocks,
   lastmod, entity decode);
2. politeness: RFC 9309 robots rules parsed ONCE PER HOST and
   broadcast-joined back to the frontier (never re-parsed per URL);
3. frontier dedup: ``web.url_normalize`` canonical forms → hash
   groupBy (messy variants collapse before any fetch is spent);
4. fetch: the allowed frontier round-trips through the WARC sink +
   source (gzip member-per-record — the bytes a real fetcher writes);
5. extraction: ``web.strip_html`` text + ``web.extract_links`` edges,
   ``web.sniff_mime`` payload gate;
6. quality prior: ``web.pagerank`` over the discovered link graph.

Run:  python examples/crawl_frontier.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import web
from entropy_balance_weighting_spark.session import get_spark, load_table
from entropy_balance_weighting_spark.sources import (
    read_warc,
    write_warc,
    write_wet,
)


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="crawl_frontier_example")

    docs = load_table(spark, sf_dir, "documents")

    # 1. seed discovery — one sitemap per source host.  Every doc is a
    #    <url> entry; ids ≡0 (mod 5) sit under /private/ (robots will
    #    wall them off), and ids ≡0 (mod 4) ALSO emit an upper-cased
    #    scheme/host duplicate (frontier dedup must collapse it).
    did = F.col("doc_id").cast("string")
    path = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit("/private/"), did)
    ).otherwise(F.concat(F.lit("/p/"), did))
    entry = F.concat(
        F.lit("<url><loc>http://"), F.col("source"),
        F.lit(".example.com"), path, F.lit("?a=1&amp;b=2</loc>"),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.lit("<lastmod>2026-01-05</lastmod>"),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
        F.when(
            (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 5 != 0),
            F.concat(
                F.lit("<url><loc>HTTP://"), F.upper("source"),
                F.lit(".EXAMPLE.COM/p/"), did,
                F.lit("?a=1&amp;b=2</loc></url>"),
            ),
        ).otherwise(F.lit("")),
    )
    sitemaps = docs.groupBy("source").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws("", F.collect_list(entry)),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    frontier = sitemaps.select(
        "source", F.explode(web.sitemap_locs("xml")).alias("s")
    ).select("source", F.col("s.loc").alias("url"))
    n_seeds = frontier.count()

    # 2. politeness — robots parsed once per HOST (tiny dim), the rule
    #    array broadcast-joined back to the frontier
    robots_txt = (
        "User-agent: corpusbot\nDisallow: /private/\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    hosts = frontier.select(
        web.url_host("url").alias("host")
    ).distinct().withColumn(
        "rules", web.robots_rules(F.lit(robots_txt), "corpusbot")
    )
    polite = frontier.withColumn("host", web.url_host("url")).join(
        F.broadcast(hosts), "host"
    ).filter(web.robots_allows(F.col("rules"), web.url_path("url")))
    n_polite = polite.count()

    # 3. frontier dedup — canonical form, first URL per canon
    canon = polite.select(
        "source", "url", web.url_normalize("url").alias("canon")
    )
    fetch_list = canon.groupBy("canon").agg(
        F.min("url").alias("url"), F.min("source").alias("source")
    )
    n_frontier = fetch_list.count()

    # 4. fetch — pages become WARC response records; each page links
    #    to the NEXT doc of its source (a ring), giving a real graph.
    #    The join key is the CANONICAL form (the frontier may have kept
    #    the upper-cased variant string; canon is the identity).
    pages = fetch_list.select("canon").join(
        docs.select(
            "doc_id", "text",
            web.url_normalize(
                F.concat(
                    F.lit("http://"), F.col("source"),
                    F.lit(".example.com/p/"), did, F.lit("?a=1&b=2"),
                )
            ).alias("canon"),
            F.col("source"),
        ),
        "canon",
    ).select(
        F.col("canon").alias("url"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"),
            F.lit('</p><a href="http://'), F.col("source"),
            F.lit(".example.com/p/"),
            ((F.col("doc_id") + 20) % 500).cast("string"),
            F.lit('?a=1&b=2">next</a></body></html>'),
        ).alias("body"),
    )
    warc_dir = os.path.join(
        str(Path(__file__).resolve().parents[1]), ".scratch",
        "example_frontier_warc",
    )
    shutil.rmtree(warc_dir, ignore_errors=True)
    write_warc(pages, warc_dir, n_files=4)
    fetched = read_warc(spark, warc_dir, glob="*.warc.gz").filter(
        F.col("warc_type") == "response"
    )
    n_fetched = fetched.count()

    # 5. extraction — gate on sniffed type, then text + link edges
    html_pages = fetched.filter(
        web.sniff_mime(F.col("payload")) == "text/html"
    ).select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"),
    )
    extracted = html_pages.select(
        "url",
        web.strip_html("html").alias("text"),
        F.explode(web.extract_links("html")).alias("out_url"),
    )
    n_edges = extracted.count()

    # 5b. interchange export — the extracted text as WET conversion
    #     records (what downstream corpus tools consume), re-readable
    #     by read_warc
    wet_dir = os.path.join(
        str(Path(__file__).resolve().parents[1]), ".scratch",
        "example_frontier_wet",
    )
    shutil.rmtree(wet_dir, ignore_errors=True)
    wet_docs = html_pages.select(
        "url", web.strip_html("html").alias("text")
    ).dropDuplicates(["url"])
    wet_manifest = write_wet(wet_docs, wet_dir, n_files=2)
    n_wet = int(wet_manifest.agg(F.sum("n_records")).first()[0] or 0)

    # 6. quality prior — PageRank over the discovered graph
    edges = extracted.select(
        web.url_normalize("url").alias("src"),
        web.url_normalize("out_url").alias("dst"),
    )
    pr_info: dict = {}
    ranks = web.pagerank(edges, n_iters=30, tol=1e-8, info=pr_info)
    top = ranks.orderBy(F.desc("rank"), "id").limit(5).collect()
    rank_mass = ranks.agg(F.sum("rank")).first()[0]

    out = {
        "n_seeds": n_seeds,
        "n_polite": n_polite,
        "n_frontier": n_frontier,
        "n_fetched": n_fetched,
        "n_edges": n_edges,
        "n_ranked": ranks.count(),
        "rank_mass": float(rank_mass),
        "n_wet_records": n_wet,
        "pr_iterations": pr_info["iterations"],
        "pr_residual": pr_info["residual"],
        "top_url": top[0]["id"],
    }
    print(out)
    if owns_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
