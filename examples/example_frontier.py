"""Crawl-frontier discovery loop (beyond-reference), the round-trip a
polite crawler runs per domain, every stage DataFrame-native:

    1. robots.txt          -> Sitemap: lines (RFC 9309 global fields)
    2. <sitemapindex>      -> child sitemap URLs   (recursion hop)
    3. <urlset>            -> (loc, lastmod, priority) entries
    4. canonicalize_url    -> one key per logical page
    5. anti-join seen set  -> the NEW frontier (broadcast, no shuffle
                              of the entry stream)
    6. surt_key ordering   -> the CDX-style fetch queue: range-
                              partitioned so one domain's work is one
                              contiguous partition span per worker

The XML parsing is pure JVM regex (sitemaps are machine-generated;
the same stripper-not-a-DOM bounds as html_to_text), so steps 2-6 are
one narrow map stage + one broadcast anti-join + one range exchange —
no Python anywhere on the URL stream.
"""

from pyspark.sql import functions as F

from kspp_spark.functions.robots import sitemap_urls
from kspp_spark.functions.web import (
    canonicalize_url,
    sitemap_entries,
    sitemap_index_locs,
    surt_key,
)
from kspp_spark.session import get_spark


ROBOTS = """User-agent: *
Disallow: /private
Sitemap: https://shop.example.com/sitemap-index.xml
"""

SITEMAP_INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex>
  <sitemap><loc>https://shop.example.com/sitemap-products.xml</loc></sitemap>
  <sitemap><loc><![CDATA[https://shop.example.com/sitemap-blog.xml]]></loc></sitemap>
</sitemapindex>
"""

SITEMAPS = {
    "https://shop.example.com/sitemap-products.xml": """<urlset>
      <url><loc>https://shop.example.com/p/1?ref=sitemap&amp;utm_source=s</loc>
           <lastmod>2026-03-01</lastmod><priority>0.9</priority></url>
      <url><loc>https://shop.example.com/p/2/</loc></url>
      <url><loc>https://WWW.shop.example.com:443/p/3</loc></url>
    </urlset>""",
    "https://shop.example.com/sitemap-blog.xml": """<urlset>
      <url><loc>https://shop.example.com/blog/a</loc>
           <lastmod>2026-02-15</lastmod></url>
      <url><lastmod>2026-02-16</lastmod></url>
    </urlset>""",
}


def main() -> None:
    spark = get_spark("example_frontier")

    # 1. robots: the sitemap seeds (driver-side — robots.txt is one
    #    small file per domain; the PARSE is the bounded part)
    seeds = sitemap_urls(ROBOTS)
    print(f"robots sitemap seeds : {seeds}")
    assert seeds == ["https://shop.example.com/sitemap-index.xml"]

    # 2. index hop: fetchers return (url, xml) rows; the recursion
    #    step extracts child sitemap locs
    fetched_index = spark.createDataFrame(
        [(seeds[0], SITEMAP_INDEX)], "url string, xml string"
    )
    children = fetched_index.select(
        F.explode(sitemap_index_locs("xml")).alias("sitemap_url")
    )
    child_urls = [r.sitemap_url for r in children.collect()]
    print(f"child sitemaps       : {len(child_urls)}")
    assert sorted(child_urls) == sorted(SITEMAPS)

    # 3-4. leaf entries -> canonical page keys
    leaves = spark.createDataFrame(
        [(u, SITEMAPS[u]) for u in child_urls], "sitemap_url string, xml string"
    )
    entries = (
        leaves.select(F.explode(sitemap_entries("xml")).alias("e"))
        .where(F.col("e.loc").isNotNull())
        .select(
            canonicalize_url(F.col("e.loc")).alias("canon_url"),
            F.col("e.lastmod").alias("lastmod"),
            F.col("e.priority").alias("priority"),
        )
    )

    # 5. the already-crawled set: broadcast anti-join
    seen = spark.createDataFrame(
        [("https://shop.example.com/p/2",)], "canon_url string"
    )
    frontier = entries.join(F.broadcast(seen), "canon_url", "left_anti")

    # 6. the fetch queue in SURT order (domain-contiguous ranges)
    queue = frontier.select(
        surt_key("canon_url").alias("surt"), "canon_url", "lastmod", "priority"
    ).orderBy("surt")
    rows = queue.collect()
    print("fetch queue          :")
    for r in rows:
        print(f"  {r.surt}  lastmod={r.lastmod} priority={r.priority}")
    keys = [r.canon_url for r in rows]
    # tracking param stripped + sorted; trailing slash + www + :443
    # folded; the seen page and the loc-less entry are gone
    assert keys == [
        "https://shop.example.com/blog/a",
        "https://shop.example.com/p/1?ref=sitemap",
        "https://shop.example.com/p/3",
    ], keys
    assert all(r.surt.startswith("com,example,shop)") for r in rows)
    print(f"new frontier         : {len(keys)} pages (1 seen, 1 loc-less dropped)")
    spark.stop()


if __name__ == "__main__":
    main()
