"""URL-level web-corpus curation — canonicalization, host/domain
extraction, latest-capture dedup. The step between WARC ingestion
(sources/warc.py) and the text tiers: crawls re-visit pages under
trivially-different URLs (fragments, default ports, tracking params,
parameter order, trailing slashes), so URL-level dedup before
text-level dedup removes the cheapest duplicates first.

Everything is JVM Column expressions (RFC 3986-style regex splits +
array ops) — no Python per row, engine-replayable for oracles, and
map-only (zero shuffle; `latest_capture_per_url` is the one
aggregation, on the canonical key). Beyond-reference capability (kspp
has no web surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# query parameters that identify a CLICK, not a page — the common
# tracking families stripped by every crawl canonicalizer
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref_src)="

_AUTH = r"^[^:/?#]+://([^/?#]*)"


def url_scheme(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, r"^([^:/?#]+):", 1))


def url_host(url: Column | str) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(u, _AUTH, 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]+$", ""))


def url_domain(url: Column | str) -> Column:
    """Registrable-domain APPROXIMATION: the last two host labels
    (example.com from www.a.example.com). Correct for generic TLDs;
    two-level public suffixes (co.uk) need a public-suffix list —
    documented approximation, not silently wrong: the column is named
    for what it is."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonicalize_url(
    url: Column | str,
    strip_www: bool = True,
    strip_tracking: bool = True,
) -> Column:
    """Canonical form for URL-level dedup:

    - scheme and host lowercased (path/query case preserved — RFC
      3986 §6.2.2.1 says only scheme/host are case-insensitive)
    - fragment dropped; userinfo dropped
    - default ports removed (http:80, https:443); others kept
    - path: runs of trailing '/' stripped, empty path -> '/'
    - query: tracking params out (TRACKING_PARAM_RE), remaining
      params SORTED (param order is almost never semantic; sorting
      collapses permuted duplicates), empty query -> no '?'
    - optional leading 'www.' strip (crawl-dedup convention)

    Deterministic, engine-portable string algebra — the SQL oracle
    replays it exactly.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = url_scheme(u)
    auth = F.regexp_extract(u, _AUTH, 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(no_user, r":[0-9]+$", ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(no_user, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    if strip_tracking:
        params = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAM_RE))
    qcanon = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


# the HTML named entities decoded by html_to_text (the handful that
# dominate real pages; numeric entities beyond these stay literal —
# a documented bound, not silent corruption)
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
]

# tags whose CLOSE (or self) marks a block boundary -> newline
_BLOCK_TAG_RE = (
    r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|"
    r"/blockquote|/section|/article|/header|/footer|/pre)\s*>"
)


def html_to_text(html: Column | str) -> Column:
    """Plain text from an HTML page — the step between WARC HTTP
    bodies and the text-curation tiers, as a PURE JVM regexp chain
    (no parser library, no Python per row, engine-replayable):

    1. script/style/noscript/template elements removed WITH content
    2. comments removed
    3. block-closing tags become newlines (so paragraphs/list items
       stay separate lines for the boilerplate-line tier)
    4. every remaining tag stripped
    5. the dominant named entities decoded (HTML_ENTITIES; &amp;
       last so entity-references-of-entities don't double-decode)
    6. whitespace normalized: runs of spaces/tabs collapse, >2 blank
       lines collapse to one, edges trimmed

    This is a tag STRIPPER, not a DOM parser: malformed nesting
    degrades to extra/missing line breaks, never to dropped text —
    the right failure mode for corpus building. (RE2/Java regex
    compatible: (?is) flags + non-greedy spans only.)"""
    c = F.col(html) if isinstance(html, str) else html
    for pat in (
        r"(?is)<script[\s>].*?</script\s*>",
        r"(?is)<script/?>.*?</script\s*>",
        r"(?is)<style[\s>].*?</style\s*>",
        r"(?is)<style/?>.*?</style\s*>",
        r"(?is)<noscript[\s>]?.*?</noscript\s*>",
        r"(?is)<template[\s>]?.*?</template\s*>",
        r"(?s)<!--.*?-->",
    ):
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, _BLOCK_TAG_RE, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, repl in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # trim() strips spaces only — edges must lose newlines too
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def latest_capture_per_url(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """URL-level dedup for a crawl frame: one row per CANONICAL url,
    the newest capture winning (LWW by `date_col`, optional
    deterministic tiebreak for equal dates — pass the record id). One
    hash aggregation on the canonical key; payloads ride the max_by
    struct, so nothing joins back."""
    payload = [c for c in df.columns]
    order = (
        F.struct(F.col(date_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(date_col)
    )
    return (
        df.withColumn("canon_url", canonicalize_url(url_col))
        .groupBy("canon_url")
        .agg(
            F.max_by(F.struct(*payload), order).alias("_r"),
            F.count(F.lit(1)).alias("n_captures"),
        )
        .select("canon_url", "_r.*", "n_captures")
    )


def crawl_dedup_stream(
    stream_df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
):
    """The STREAMING face of latest-capture dedup: a crawl stream
    keyed by canonical URL with LWW by capture date — exactly the
    ktable changelog materialization (streaming/core.ktable_stream),
    so re-crawls of the same logical page supersede in state and each
    micro-batch emits the updated winners (update output mode).
    Returns the aggregated streaming DataFrame; attach your sink.
    State is one row per canonical URL (Spark state store — RocksDB
    provider for crawl-scale key counts)."""
    from kspp_spark.streaming.core import ktable_stream

    value_cols = [c for c in stream_df.columns if c != date_col]
    keyed = stream_df.withColumn("canon_url", canonicalize_url(url_col))
    return ktable_stream(
        keyed, key="canon_url", value_cols=value_cols, event_time=date_col
    )
