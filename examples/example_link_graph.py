"""Crawl link-graph analytics end-to-end: HTML pages -> outlink
table (functions/web.page_links: JVM regex anchors + RFC 3986
resolution) -> registrable-domain collapse (public-suffix list) ->
weighted domain graph -> integer-scaled PageRank
(functions/graph.pagerank). The rank signal a curation pipeline uses
as a per-domain quality prior.

The synthetic mini-web: every site links to hub.com (so the hub must
rank first), a.co.uk and b.com link to each other, c.org links out
but nothing links to it (rank floor), and intra-site navigation
self-edges are dropped by the domain collapse."""

from pyspark.sql import functions as F

from kspp_spark.functions.graph import domain_edges, pagerank
from kspp_spark.functions.web import page_links, url_registrable_domain
from kspp_spark.session import get_spark


def _page(*hrefs: str) -> str:
    body = "".join(f'<a href="{h}">link</a>' for h in hrefs)
    return f"<html><body><div>nav</div>{body}</body></html>"


def main() -> None:
    spark = get_spark("example_link_graph")
    pages = spark.createDataFrame(
        [
            (1, "https://www.a.co.uk/x/p.html",
             _page("https://hub.com/t", "https://b.com/", "/x/self.html")),
            (2, "https://b.com/index.html",
             _page("https://hub.com/t2", "https://sub.a.co.uk/y")),
            (3, "https://c.org/p",
             _page("https://hub.com/", "https://b.com/q", "../up.html")),
            (4, "https://hub.com/about",
             _page("/jobs.html")),  # only intra-domain: hub is dangling
        ],
        "doc_id long, url string, html string",
    )

    links = page_links(pages)
    resolved = links.select(
        "doc_id",
        "link_url",
        url_registrable_domain("link_url").alias("link_domain"),
    )
    print("outlinks:")
    for r in resolved.orderBy("doc_id", "link_url").collect():
        print(f"  {r.doc_id} -> {r.link_url}  [{r.link_domain}]")

    page_dom = pages.select(
        "doc_id", url_registrable_domain("url").alias("page_domain")
    )
    dedges = domain_edges(resolved.join(page_dom, "doc_id"))
    print("domain graph:")
    for r in dedges.orderBy("src", "dst").collect():
        print(f"  {r.src} -> {r.dst}  (weight {r.n_links})")
    # intra-site navigation never became an edge
    assert dedges.filter("src = dst").count() == 0

    ranks = pagerank(dedges, iterations=3).orderBy(F.desc("rank"))
    rows = ranks.collect()
    print("domain ranks (parts-per-1e12 of total rank mass):")
    for r in rows:
        print(f"  {r.node:10s} {r.rank}")
    assert rows[0].node == "hub.com", "every site endorses the hub"
    by = {r.node: r.rank for r in rows}
    # nothing links to c.org: it holds the teleport floor, strictly
    # below the mutually-linked pair
    assert by["c.org"] < by["b.com"] and by["c.org"] < by["a.co.uk"]
    spark.stop()


if __name__ == "__main__":
    main()
