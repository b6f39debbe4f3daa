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

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window, functions as F

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
    use registrable_domain()/url_registrable_domain() for the
    PSL-correct form; this 2-label fallback stays for list-free
    contexts."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


# --- public-suffix-list registrable domains ---------------------------

# rule-kind bitmask in the PSL lookup map (a suffix can carry several:
# the real list contains e.g. both 'platform.sh' and '*.platform.sh')
_PSL_NORMAL, _PSL_WILDCARD, _PSL_EXCEPTION = 1, 2, 4

_PSL_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


@lru_cache(maxsize=4)
def load_psl(path: str | None = None) -> dict[str, int]:
    """Parse a PSL-format file (publicsuffix.org — the bundled file is
    a documented SUBSET snapshot; drop in the full list for
    production) into {suffix: kind_bitmask}: '*.foo' stores its BASE
    'foo' with the WILDCARD bit (one extra label is part of the
    public suffix), '!foo' stores 'foo' with the EXCEPTION bit
    (overrides a covering wildcard), plain rules set NORMAL."""
    rules: dict[str, int] = {}
    with open(path or _PSL_DEFAULT_PATH, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            line = line.split()[0].lower()  # spec: stop at whitespace
            if line.startswith("!"):
                rules[line[1:]] = rules.get(line[1:], 0) | _PSL_EXCEPTION
            elif line.startswith("*."):
                rules[line[2:]] = rules.get(line[2:], 0) | _PSL_WILDCARD
            else:
                rules[line] = rules.get(line, 0) | _PSL_NORMAL
    return rules


def registrable_domain(
    host: Column | str, psl_path: str | None = None
) -> Column:
    """PSL-correct registrable domain (publicsuffix.org algorithm) as
    a PURE JVM Column expression — no join, no shuffle, no Python per
    row: the rule table folds into ONE literal map in the plan, and
    the host side does label-slice lookups against it. Every step
    lives inside higher-order-function lambdas so the (hundreds-of-
    entries) map literal appears EXACTLY ONCE in the expression tree
    — lambda variables are shared references, whereas a plain
    when-chain would re-embed the map per reference and blow the
    tree up exponentially (measured 8s of driver-side analysis for a
    390-rule snapshot before this shape; ~0.2s after).

    Algorithm (https://publicsuffix.org/list/): among rules matching
    the host, an exception rule prevails (public suffix = the rule
    minus its leftmost label); otherwise the longest match does, a
    wildcard '*' consuming exactly one host label; no match -> the
    default rule '*' (public suffix = the last label). The
    registrable domain is the public suffix plus one more label —
    NULL when the host IS a public suffix (nothing is registered
    'under' it) or has no dot at all.

    Per-row cost: maxl (snapshot: 3) lookups against the folded map
    literal (array-backed, O(rules) UTF8 equality scan each) — ~1e3
    short-string compares per host, ~1M hosts/s/core; the full
    ~10k-rule production list would make a broadcast-join form
    competitive, but the column form keeps callers shuffle-free."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    rules = load_psl(psl_path)
    maxl = max(k.count(".") + 1 for k in rules)
    # two array literals, not create_map(*780 lits): one F.lit per
    # ARRAY keeps plan construction at 2 py4j calls (measured 0.8s
    # of driver time for per-entry lits), and map_from_arrays of
    # foldable arrays constant-folds to the same map literal
    items = sorted(rules.items())
    m = F.map_from_arrays(
        F.lit([k for k, _ in items]), F.lit([v for _, v in items])
    )
    labels = F.split(h, r"\.")
    n = F.size(labels)
    # kind bitmask per suffix length 1..maxl — the ONE place m occurs
    kinds = F.transform(
        F.sequence(F.lit(1), F.lit(maxl)),
        lambda i: F.when(
            n >= i,
            F.coalesce(m[F.array_join(F.slice(labels, -i, i), ".")], F.lit(0)),
        ).otherwise(F.lit(0)),
    )
    return _psl_fold(labels, n, kinds, maxl)


def _psl_fold(labels: Column, n: Column, kinds: Column, maxl: int) -> Column:
    """The publicsuffix.org rule fold, shared by both physical forms
    (map-literal Column and broadcast-join DataFrame): `kinds` is the
    array of rule-kind bitmasks for suffix lengths 1..maxl. Expressed
    as ONE F.aggregate so every intermediate (pub/exc/pubk) is a
    lambda-variable reference — a plain when-chain over columns
    re-embeds subtrees per reference and blows past janino's method
    limit at maxl=5 (measured: codegen compile failure on the full
    list before this shape)."""
    # (kind, level) pairs; acc / x are lambda vars, so nothing below
    # duplicates subtrees
    lvl = F.zip_with(
        kinds,
        F.sequence(F.lit(1), F.lit(maxl)),
        lambda k, i: F.struct(k.alias("k"), i.cast("int").alias("i")),
    )

    def _step(acc: Column, x: Column) -> Column:
        normal = x["k"].bitwiseAND(F.lit(_PSL_NORMAL)) != 0
        wild = x["k"].bitwiseAND(F.lit(_PSL_WILDCARD)) != 0
        exc = x["k"].bitwiseAND(F.lit(_PSL_EXCEPTION)) != 0
        pub = F.when(normal, F.greatest(acc["pub"], x["i"])).otherwise(
            acc["pub"]
        )
        # a wildcard consumes one more label, which must actually exist
        pub = F.when(
            wild & (n > x["i"]), F.greatest(pub, x["i"] + 1)
        ).otherwise(pub)
        return F.struct(
            pub.cast("int").alias("pub"),
            F.when(exc, x["i"] - 1)
            .otherwise(acc["exc"])
            .cast("int")
            .alias("exc"),
        )

    def _finish(acc: Column) -> Column:
        pubk = F.coalesce(acc["exc"], acc["pub"])
        return F.when(
            n > pubk,
            F.array_join(F.slice(labels, -(pubk + 1), pubk + 1), "."),
        )

    return F.aggregate(
        lvl,
        F.struct(
            F.lit(1).cast("int").alias("pub"),
            F.lit(None).cast("int").alias("exc"),
        ),
        _step,
        _finish,
    )


def url_registrable_domain(
    url: Column | str, psl_path: str | None = None
) -> Column:
    """registrable_domain over a URL column's host."""
    return registrable_domain(url_host(url), psl_path)


_PSL_FULL_PATH = os.path.join(
    os.path.dirname(_PSL_DEFAULT_PATH), "public_suffix_list_full.dat"
)

# measured crossover (1M hosts, local[32]): the map-literal Column
# form is 25s exec + 10s plan-build at the full 9,506-rule list vs
# <1s at the 431-rule subset — GetMapValue scans the literal map
# (O(rules) per lookup), so cost is rules x maxl per host. Above this
# bound with_registrable_domain switches to broadcast hash joins
# (O(1) probe per candidate suffix).
_PSL_MAP_LITERAL_MAX_RULES = 1500


def with_registrable_domain(
    df: DataFrame,
    host_col: str,
    out_col: str = "registrable_domain",
    psl_path: str | None = None,
) -> DataFrame:
    """registrable_domain as a DataFrame transform that scales to the
    FULL production Public Suffix List (bundled:
    data/public_suffix_list_full.dat, 9,506 rules — the default
    here). Same publicsuffix.org algorithm and same results as the
    pure-Column registrable_domain(); different physical form:

    - small rule set (<= ~1.5k rules): delegates to the map-literal
      Column form — zero joins, the cheapest plan.
    - production rule set: one candidate column per suffix length
      (maxl = 5 for the full list), each BROADCAST-hash-joined
      against the tiny rules table — O(1) hash probe per candidate
      instead of GetMapValue's O(rules) literal-map scan. Still zero
      shuffles on the host stream (broadcast joins only), still pure
      JVM; Spark reuses the single broadcast exchange across the
      maxl probes (ReusedExchange).

    Measured at the crossover note above: 1M hosts / full list went
    from 25s (map literal) to sub-second per probe with this form.
    """
    rules = load_psl(psl_path or _PSL_FULL_PATH)
    if len(rules) <= _PSL_MAP_LITERAL_MAX_RULES:
        return df.withColumn(
            out_col,
            registrable_domain(host_col, psl_path or _PSL_FULL_PATH),
        )
    maxl = max(k.count(".") + 1 for k in rules)
    spark = df.sparkSession
    # the rules side as ONE packed string literal split JVM-side:
    # - NOT createDataFrame: python rows scan as ExistingRDD, which
    #   re-runs a pickled-RDD pipeline per broadcast build (5x here —
    #   measured 13.7s vs 2.3s for a 1M-host job)
    # - NOT F.lit(list-of-9.5k-strings): array literals cross py4j
    #   per element (measured 7.9s of driver time at the full list)
    # one literal = one py4j call; the split/explode runs in the JVM
    items = sorted(rules.items())
    assert not any("," in k or ";" in k for k, _ in items)
    packed = ";".join(f"{k},{v}" for k, v in items)
    rules_df = (
        spark.range(1)
        .select(F.explode(F.split(F.lit(packed), ";")).alias("kv"))
        .select(
            F.substring_index("kv", ",", 1).alias("suffix"),
            F.substring_index("kv", ",", -1).cast("int").alias("kind"),
        )
    )
    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    # the join probes materialize temp columns on the caller's frame;
    # a caller column with one of these names would be silently
    # clobbered — refuse loudly (same style as the packed-literal
    # assert above)
    temp = {"_psl_labels", "_psl_n"} | {
        c for i in range(1, maxl + 1) for c in (f"_psl_c{i}", f"_psl_k{i}")
    }
    clash = temp & set(df.columns)
    assert not clash, f"input columns collide with PSL temps: {sorted(clash)}"
    work = df.withColumn("_psl_labels", labels).withColumn("_psl_n", n)
    for i in range(1, maxl + 1):
        cand = F.when(
            F.col("_psl_n") >= i,
            F.array_join(F.slice("_psl_labels", -i, i), "."),
        )
        work = work.withColumn(f"_psl_c{i}", cand).join(
            F.broadcast(
                rules_df.select(
                    F.col("suffix").alias(f"_psl_c{i}"),
                    F.col("kind").alias(f"_psl_k{i}"),
                )
            ),
            on=f"_psl_c{i}",
            how="left",
        )
    # the same rule fold as the Column form, over the joined kind
    # columns packed into one array (lambda-shared subtrees — see
    # _psl_fold's codegen note)
    kinds = F.array(
        *[
            F.coalesce(F.col(f"_psl_k{i}"), F.lit(0))
            for i in range(1, maxl + 1)
        ]
    )
    out = _psl_fold(F.col("_psl_labels"), F.col("_psl_n"), kinds, maxl)
    drop = ["_psl_labels", "_psl_n"] + [
        c for i in range(1, maxl + 1) for c in (f"_psl_c{i}", f"_psl_k{i}")
    ]
    return work.withColumn(out_col, out).drop(*drop)


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


def surt_key(url: Column | str, strip_www: bool = True) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the
    web-archive canonical index key (CDX files; public spec:
    the webarchive-commons / pywb SURT documentation): scheme
    dropped, host lowercased and its labels REVERSED joined by
    commas, non-default port kept as ':port', then ')' and the
    canonical path + sorted query. 'uk,co,example)/a/b?q=1' for
    'https://www.Example.co.uk/a/b?q=1#f'. Label reversal makes a
    plain string sort cluster every host under its domain — the
    property CDX indexes rely on for prefix range-scans, and in
    Spark the property that makes a sort/range-partition by key
    co-locate a domain's captures in one partition span.

    Shares canonicalize_url's rules (fragment/userinfo dropped,
    default ports removed, trailing-slash fold, tracking params out,
    params sorted) so one URL has ONE surt key. Pure JVM regex —
    map-only, engine-replayable."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = url_scheme(u)
    auth = F.regexp_extract(u, _AUTH, 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(no_user, r":[0-9]+$", ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
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
    params = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAM_RE))
    qcanon = F.array_join(F.sort_array(params), "&")
    return F.concat(
        rev_host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
            F.lit("")
        ),
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


# --- link extraction (WAT-style outlink records) ----------------------

# <a ...> elements with a double-quoted href; group 1 = href, group 2 =
# element body (the anchor text, possibly with nested inline tags)
_HREF_A_RE = r'(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'


def extract_links(html: Column | str) -> Column:
    """All `<a href="...">anchor</a>` elements of a page as an
    `array<struct<href,anchor>>` — the WAT-style outlink record, as a
    PURE JVM expression (no parser, no Python per row): two
    `regexp_extract_all` passes over the same pattern (group 1 =
    href, group 2 = element body) zip positionally, and each body is
    tag-stripped + whitespace-collapsed into the anchor TEXT.

    Documented bounds (like html_to_text, a stripper not a DOM):
    single-quoted / unquoted href values are skipped, nested `<a>`
    elements don't occur in valid HTML and degrade to the outer
    match. Combine with resolve_url(href, base) for absolute URLs.

    Cost shape: ONE regex pass over the page (group 0 = whole
    element); href/body split re-applies the pattern only to each
    ~100-byte match string, never to the page again — on real
    50-100 KB pages the page scan dominates, so halving it halves
    the operator."""
    c = F.col(html) if isinstance(html, str) else html
    matches = F.regexp_extract_all(c, F.lit(_HREF_A_RE), F.lit(0))
    clean = lambda b: F.trim(  # noqa: E731 — inline for the transform
        F.regexp_replace(
            F.regexp_replace(b, r"(?s)<[^>]*>", " "), r"\s+", " "
        )
    )
    return F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, _HREF_A_RE, 1).alias("href"),
            clean(F.regexp_extract(m, _HREF_A_RE, 2)).alias("anchor"),
        ),
    )


def resolve_url(href: Column | str, base: Column | str) -> Column:
    """RFC 3986 §5.2 reference resolution as engine-portable string
    algebra — href shapes against an ABSOLUTE base URL:

    - absolute (`scheme:...`) -> unchanged (mailto:/javascript:
      pass through with their scheme; filter on url_scheme after)
    - protocol-relative `//authority/...` -> base scheme + `:` + href
    - root-relative `/path` -> base origin + href
    - relative `seg...` / `./seg` / `../seg` -> merged onto the base
      path's directory
    - empty or fragment-only `#frag` -> the base itself (RFC: a
      same-document reference)

    then dot-segment removal on the merged path (`/./` and
    `seg/../` folded, excess `/../` at the root dropped) to a
    BOUNDED depth of 8 — deeper `../` chains than any real page
    nests — and the fragment stripped (crawl links are fetch
    targets; fragments never reach the wire)."""
    h = F.col(href) if isinstance(href, str) else href
    b = F.col(base) if isinstance(base, str) else base
    h = F.regexp_replace(h, r"#.*$", "")  # fragment never survives
    b_origin = F.regexp_extract(b, r"^([^:/?#]+://[^/?#]*)", 1)
    base_dir = F.regexp_extract(b, r"^[^:/?#]+://[^/?#]*([^?#]*/)", 1)
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)
    merged = (
        F.when(h == "", F.regexp_replace(b, r"#.*$", ""))
        .when(h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(h.startswith("//"), F.concat(url_scheme(b), F.lit(":"), h))
        .when(h.startswith("/"), F.concat(b_origin, h))
        .otherwise(F.concat(b_origin, base_dir, h))
    )
    # dot-segment removal on the PATH span only (query untouched);
    # the origin is re-extracted from MERGED (an absolute href keeps
    # its own authority, not the base's)
    m_origin = F.regexp_extract(merged, r"^([^:/?#]+://[^/?#]*)", 1)
    path = F.regexp_extract(merged, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    tail = F.regexp_extract(merged, r"^[^:/?#]+://[^/?#]*[^?#]*(.*)$", 1)
    # every dot segment ("/./", "/../", trailing "/." or "/..")
    # contains the 2-byte needle "/." — guard the 24-regexp fold
    # behind one contains() so the overwhelmingly common clean path
    # skips it (CaseWhen branches evaluate lazily per row)
    folded = path
    for _ in range(8):
        folded = F.regexp_replace(folded, r"/\.(/|$)", "/")
        folded = F.regexp_replace(folded, r"^/\.\.(/|$)", "/")
        folded = F.regexp_replace(folded, r"/[^/]+/\.\.(/|$)", "/")
    path = F.when(path.contains("/."), folded).otherwise(path)
    # non-hierarchical absolute refs (mailto:, javascript:, data:)
    # have no '://' span — they pass through for the caller's scheme
    # filter rather than being reassembled to garbage
    return F.when(
        merged.rlike(r"^[^:/?#]+://"), F.concat(m_origin, path, tail)
    ).otherwise(merged)


def page_links(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """The outlink TABLE of a crawl frame: one row per anchor with
    the href resolved against the page URL, http(s) targets only —
    (id, link_url, anchor). Map-side explode; no shuffle, no Python.
    The (page, link) edge list feeds host/domain link-graph rollups
    downstream."""
    link = F.explode(extract_links(html_col)).alias("_l")
    out = df.select(id_col, F.col(base_col).alias("_base"), link)
    # r13-opt (guide §4.4's duplication mechanism, built-in flavor):
    # filtering on url_scheme(link_url) pushed the WHOLE resolve_url
    # regex tree below the projection (alias substitution), so every
    # anchor paid RFC 3986 resolution twice — once in the pushed
    # Filter, once again in the Project (codegen CSE does not unify
    # across the two operators). The scheme of the RESOLVED url is
    # already determined by the raw href + base: an absolute
    # reference keeps its own scheme (RFC 3986 §5.2.2), every other
    # shape (//, /, relative, empty/fragment-only) inherits the
    # base's. Filtering on that cheap equivalent BEFORE the
    # projection drops non-http(s) links before they are ever
    # resolved and leaves ONE resolve_url evaluation per surviving
    # anchor. Equivalence bound (same one resolve_url documents):
    # the base must be a hierarchical absolute URL (scheme://...) —
    # a non-hierarchical base (mailto:) already has no origin to
    # resolve against.
    h = F.regexp_replace(F.col("_l.href"), r"#.*$", "")
    scheme = F.when(
        h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), url_scheme(h)
    ).otherwise(url_scheme(F.col("_base")))
    resolved = resolve_url(F.col("_l.href"), F.col("_base"))
    return out.filter(scheme.isin("http", "https")).select(
        id_col,
        resolved.alias("link_url"),
        F.col("_l.anchor").alias("anchor"),
    )


def anchor_text_terms(
    links: DataFrame,
    k: int = 3,
    target_col: str = "link_url",
    anchor_col: str = "anchor",
    by_domain: bool = True,
) -> DataFrame:
    """Per-target anchor-text term profile — the classic web-search /
    corpus-labeling signal (anchor text describes the TARGET better
    than the target describes itself; Brin & Page 1998 §2.2 made it a
    first-class index field): for each link target (registrable
    domain by default, exact URL with by_domain=False) the top-`k`
    anchor terms by frequency -> (target, term, cnt, rank), rank 1 =
    most frequent, ties broken lexicographically so the result is
    deterministic.

    Feed it page_links() output. Plan: tokenize+explode map-side, ONE
    aggregation on (target, term), one rank window partitioned by
    target — the window's partition is the per-target term list
    (bounded by vocabulary, not corpus size), so no skew beyond a
    genuinely mega-inlinked target, which the aggregation has already
    reduced to distinct terms."""
    from kspp_spark.functions.text import tokenize

    target = (
        url_registrable_domain(target_col)
        if by_domain
        else F.col(target_col)
    )
    # two projection steps: the PSL fold and tokenize are both
    # higher-order-function lambda trees, and analyzing them in ONE
    # projection collides their lambda-variable namespaces (struct
    # field aliases inside the fold resolve against the wrong
    # lambda binding — FIELD_NOT_FOUND at analysis). Chained selects
    # analyze independently; the optimizer still collapses them.
    terms = links.select(
        target.alias("target"), F.lower(F.col(anchor_col)).alias("_anchor")
    ).select(
        "target", F.explode(tokenize(F.col("_anchor"))).alias("term")
    )
    counted = terms.groupBy("target", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("target").orderBy(
        F.col("cnt").desc(), F.col("term")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def crawl_budget(
    df: DataFrame,
    per_host: int,
    url_col: str = "url",
    priority: Column | None = None,
) -> DataFrame:
    """Frontier prioritization under a per-host crawl budget: keep at
    most `per_host` URLs per host, best-first -> input columns +
    (host, priority_rank). The politeness dual of crawl_delay —
    delay bounds the RATE per host, budget bounds the COUNT per host
    (every production crawler applies both; a giant site must not eat
    the fetch capacity of ten thousand small ones).

    Default priority mirrors the standard frontier heuristic:
    shallow-first (fewer path segments — hubs and section roots
    before leaf pages), then shorter URL, then lexicographic for a
    deterministic total order. Pass `priority` (any Column; SMALLER =
    sooner) to rank by your own signal — e.g. -hub score from
    hits(), or a domain_rank join.

    Plan: one window partitioned by HOST. Host partitions are the
    natural crawl unit and the window input can first be cut to at
    most per_host rows per partition by any pre-filter the caller
    applies; skew from a mega-host is bounded because row_number
    short-circuits nothing — for 100-TB frontiers run it AFTER the
    frontier's seen-set anti-join, where per-host candidate counts
    are already crawl-cycle-sized."""
    host = url_host(url_col)
    path = F.regexp_extract(F.col(url_col), r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    order = (
        [priority]
        if priority is not None
        else [depth, F.length(url_col), F.col(url_col)]
    )
    w = Window.partitionBy("host").orderBy(*order, F.col(url_col))
    return (
        df.withColumn("host", host)
        .withColumn("priority_rank", F.row_number().over(w))
        .filter(F.col("priority_rank") <= per_host)
    )


# --- sitemap parsing (sitemaps.org protocol) --------------------------

_SITEMAP_URL_BLOCK = r"(?is)<url\s*>(.*?)</url\s*>"
_SITEMAP_INDEX_BLOCK = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"


def _xml_tag_text(block: Column, tag: str) -> Column:
    """Text content of <tag>...</tag> inside an XML fragment: CDATA
    unwrapped, surrounding whitespace trimmed, the five predefined XML
    entities decoded (&amp; LAST so '&amp;lt;' round-trips correctly),
    NULL when the tag is absent or empty."""
    v = F.regexp_extract(
        block,
        rf"(?is)<{tag}\s*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</{tag}\s*>",
        1,
    )
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        v = F.regexp_replace(v, ent, ch)
    return F.nullif(F.trim(v), F.lit(""))


def sitemap_entries(xml: Column | str) -> Column:
    """A <urlset> sitemap's entries as array<struct<loc, lastmod,
    priority>> (sitemaps.org protocol) — pure JVM regex, no XML
    parser library, no Python per row; the same stripper-not-a-DOM
    bounds as html_to_text. loc handles CDATA and entity-encoded
    query strings (&amp; is REQUIRED by the protocol inside loc);
    absent lastmod/priority come back NULL; priority is a double.
    Feed through canonicalize_url + an anti-join against the seen
    set for frontier discovery."""
    x = F.col(xml) if isinstance(xml, str) else xml
    blocks = F.regexp_extract_all(x, F.lit(_SITEMAP_URL_BLOCK), F.lit(1))
    return F.transform(
        blocks,
        lambda b: F.struct(
            _xml_tag_text(b, "loc").alias("loc"),
            _xml_tag_text(b, "lastmod").alias("lastmod"),
            _xml_tag_text(b, "priority").cast("double").alias("priority"),
        ),
    )


def sitemap_index_locs(xml: Column | str) -> Column:
    """Child sitemap URLs of a <sitemapindex> file as array<string> —
    the recursion step of sitemap discovery (robots.txt Sitemap: lines
    -> index files -> leaf sitemaps; functions/robots.sitemap_urls
    provides the first hop)."""
    x = F.col(xml) if isinstance(xml, str) else xml
    blocks = F.regexp_extract_all(x, F.lit(_SITEMAP_INDEX_BLOCK), F.lit(1))
    return F.filter(
        F.transform(blocks, lambda b: _xml_tag_text(b, "loc")),
        lambda v: v.isNotNull(),
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    num_partitions: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CDX-style capture index: every capture keyed by surt_key and
    RANGE-partitioned + sorted by (surt, date) — the layout CDX files
    and their readers rely on (binary-search / prefix range-scan per
    domain), and in Spark the layout that (a) clusters a domain's
    captures into one contiguous partition span and (b) lets a
    range-partitioned parquet write serve per-domain reads with
    partition pruning instead of a full scan. The sort is WITHIN
    range partitions (no global sort barrier beyond the range
    exchange's sampling pass).

    At 100 TB this is the archive-index build: one range exchange on
    the (surt, date) key, no join, no Python; skewed mega-domains are
    bounded by range partitioning on the FULL key (surt includes
    path, so one domain spreads over adjacent partitions rather than
    one hot one) — tests/test_plans.py pins a 90%-one-domain input to
    a bounded partition-size spread.

    The residual hot spot range partitioning cannot split is IDENTICAL
    (surt, date) keys — e.g. one URL recaptured millions of times in
    one crawl second, or date truncated to the day. For that, pass
    `tiebreak_col` (any high-cardinality record column: WARC offset,
    digest, record id): it joins the range/sort key as the LAST
    component, so the (surt, date) layout contract is preserved
    exactly while equal-key runs split across adjacent partitions."""
    keyed = df.withColumn("surt", surt_key(F.col(url_col)))
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    range_cols = [F.col("surt"), F.col(date_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    sort_cols = ["surt", date_col] + ([tiebreak_col] if tiebreak_col else [])
    return keyed.repartitionByRange(parts, *range_cols).sortWithinPartitions(
        *sort_cols
    )


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
