"""robots.txt (RFC 9309) evaluation — crawl-compliance filtering for
web-corpus pipelines: given each domain's robots.txt capture (Common
Crawl ships them per crawl), decide per URL whether the configured
product token may use it. Beyond-reference capability, written to the
public RFC only.

Split of labor, scale-shaped:
  * PARSING (group selection + rule extraction + wildcard->regex
    translation) runs once per DOMAIN via an Arrow-batched UDF —
    robots bodies are tiny and the domain table is orders of
    magnitude smaller than the URL table;
  * MATCHING runs per URL as a pure JVM SQL expression with ZERO
    regex (startswith for literal prefixes; a locate()-fold over
    '*'-split parts for wildcard/anchored rules; an aggregate fold
    picking the winning rule), joined against the per-domain rule
    arrays — broadcast when the domain table fits, hash join on the
    host otherwise. No Python and no regex compile anywhere near the
    URL table.

Semantics implemented (documented choices where the RFC leaves room):
  * group selection: case-insensitive EXACT product-token match wins;
    otherwise the '*' groups apply; all selected groups' rules MERGE
    (RFC 9309 §2.2.1 — multiple groups for the same agent combine);
  * rule matching: '*' matches any characters, '$' anchors the end,
    everything else is literal (§2.2.3); robots_gate's match target
    is the URL PATH PLUS OPTIONAL QUERY (fragment excluded, §2.2.2);
    robots_decision accepts any path column;
  * precedence: the matching rule with the LONGEST path specification
    wins; on a tie, allow wins (§2.2.2); no matching rule -> allowed;
    no robots.txt for the domain -> allowed (§2.3.1.2: unavailable
    means no restrictions);
  * 'Disallow:' with an empty value matches nothing (ignored).
"""

from __future__ import annotations

import math
import re
from typing import Iterator

# ceiling on an honored Crawl-delay (one day) — Google caps at far
# less; anything above this is a misconfiguration or an attack on the
# crawler's scheduler, not a politeness request
MAX_CRAWL_DELAY_S = 86400.0

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            # pat: a literal PREFIX when lit (no '*'/'$' in the spec —
            # the overwhelmingly common case, matched with startswith);
            # for wildcard/anchored rules it keeps the translated regex
            # for DEBUGGING ONLY — matching uses parts/anchored below,
            # never a per-row regex compile
            T.StructField("pat", T.StringType()),
            T.StructField("lit", T.BooleanType()),
            T.StructField("allow", T.BooleanType()),
            T.StructField("spec", T.IntegerType()),
            # the spec body split on '*' (NULL when lit): matched with
            # startswith/locate/endswith — greedy-leftmost placement is
            # complete for a pattern language of literals + '*' only
            T.StructField("parts", T.ArrayType(T.StringType())),
            T.StructField("anchored", T.BooleanType()),
        ]
    )
)

_RULE_STRUCT_SQL = (
    "struct<pat:string,lit:boolean,allow:boolean,spec:int,"
    "parts:array<string>,anchored:boolean>"
)


def rule_to_regex(path_spec: str) -> str:
    """RFC 9309 §2.2.3 path spec -> RE2/Java regex: '*' -> '.*',
    trailing '$' -> end anchor, the rest literal-escaped."""
    anchored = path_spec.endswith("$")
    body = path_spec[:-1] if anchored else path_spec
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return rx + "$" if anchored else rx


def parse_robots_text(
    body: str, agent: str
) -> list[tuple[str, bool, bool, int, list[str] | None, bool]]:
    """One robots.txt body -> the rule list
    [(pattern, is_literal_prefix, allow, spec_len, parts, anchored)]
    applying to `agent` (a product token): exact case-insensitive
    user-agent match wins; otherwise the '*' groups; all selected
    groups merge. Specs without '*'/'$' stay literal prefixes
    (matched downstream with startswith — no regex anywhere); the
    rest carry their '*'-split parts + end-anchor flag for the
    regex-free JVM matcher (pattern kept as a translated regex for
    debugging only). spec_len = octet length of the raw path spec
    (the §2.2.2 precedence measure)."""
    agent_lc = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_header = True
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any user-agent line: no group
            in_group_header = False
            if value == "":
                continue  # empty path spec matches nothing
            cur_rules.append((value, field == "allow"))
        # other fields (crawl-delay, sitemap, ...) don't end a group
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    exact = [g for g in groups if agent_lc in g[0]]
    selected = exact if exact else [g for g in groups if "*" in g[0]]
    out = []
    for _, rules in selected:
        for spec, allow in rules:
            lit = "*" not in spec and not spec.endswith("$")
            if lit:
                out.append((spec, True, allow, len(spec), None, False))
            else:
                anchored = spec.endswith("$")
                body_spec = spec[:-1] if anchored else spec
                out.append(
                    (
                        rule_to_regex(spec),
                        False,
                        allow,
                        len(spec),
                        body_spec.split("*"),
                        anchored,
                    )
                )
    return out


def crawl_delay(body: str, agent: str) -> float | None:
    """The Crawl-delay value (seconds) applying to `agent` — not part
    of RFC 9309 but honored by most major crawlers (the de-facto
    extension documented by Yandex/Bing): group selection follows the
    same rule as allow/disallow (exact case-insensitive product-token
    match beats the '*' groups; all selected groups merge, the
    SMALLEST delay wins — the conservative read when groups
    disagree). None when no selected group sets one or the value
    doesn't parse. Values must be FINITE and are clamped to
    MAX_CRAWL_DELAY_S — a hostile robots.txt saying
    'Crawl-delay: inf' (or 1e300) would otherwise propagate inf into
    int(delay*1000) at the rate-limiter call site and overflow.

    Feed the result into the per-key token-bucket rate limiter
    (streaming/stateful.rate_limit_batch for a batch replay,
    rate_limit_stream for the live form — one bucket per domain,
    rate = 1/delay) to make a crawl polite per domain."""
    agent_lc = agent.lower()
    groups: list[tuple[list[str], list[float]]] = []
    cur_agents: list[str] = []
    cur_delays: list[float] = []
    in_group_header = True
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                groups.append((cur_agents, cur_delays))
                cur_agents, cur_delays = [], []
            cur_agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow", "crawl-delay"):
            if field == "crawl-delay" and cur_agents:
                try:
                    d = float(value)
                    if math.isfinite(d) and d >= 0:
                        cur_delays.append(min(d, MAX_CRAWL_DELAY_S))
                except ValueError:
                    pass
            in_group_header = False
    if cur_agents:
        groups.append((cur_agents, cur_delays))
    exact = [g for g in groups if agent_lc in g[0]]
    selected = exact if exact else [g for g in groups if "*" in g[0]]
    delays = [d for _, ds in selected for d in ds]
    return min(delays) if delays else None


def sitemap_urls(body: str) -> list[str]:
    """The Sitemap: lines of a robots.txt (RFC 9309 §2.4 treats them
    as global, group-independent) — crawl seeding companions to the
    allow/disallow groups."""
    out = []
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def parse_robots(
    robots_df: DataFrame,
    agent: str,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(domain, rules): each domain's robots.txt parsed for `agent`.
    Arrow-batched; one output row per input row."""
    schema = T.StructType(
        [robots_df.schema[domain_col], T.StructField("rules", RULES_TYPE)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    domain_col: pdf[domain_col],
                    "rules": [
                        parse_robots_text(b, agent) for b in pdf[body_col]
                    ],
                }
            )

    return robots_df.select(domain_col, body_col).mapInPandas(
        run, schema=schema
    )


def parse_robots_meta(
    robots_df: DataFrame,
    agent: str,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(domain, rules, crawl_delay, sitemaps): the FULL per-domain
    politeness record in ONE Arrow-batched pass — the corpus-scale
    form of the driver-side crawl_delay()/sitemap_urls() helpers
    (which stay for bounded per-host control planes like
    examples/example_polite_crawl.py's delay classes). Semantics are
    THE SAME functions applied per row inside mapInPandas, so the two
    forms cannot drift; golden tests assert equality.

    crawl_delay is NULL when no selected group sets one (callers
    coalesce to their default politeness); sitemaps is the possibly-
    empty Sitemap: list (RFC 9309 §2.4 — global, group-independent).
    One output row per input row; robots bodies are per-domain, so
    this frame is orders of magnitude smaller than the URL table and
    broadcast-joins onto it."""
    schema = T.StructType(
        [
            robots_df.schema[domain_col],
            T.StructField("rules", RULES_TYPE),
            T.StructField("crawl_delay", T.DoubleType()),
            T.StructField("sitemaps", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = pdf[body_col]
            yield pd.DataFrame(
                {
                    domain_col: pdf[domain_col],
                    "rules": [
                        parse_robots_text(b, agent) for b in bodies
                    ],
                    "crawl_delay": [crawl_delay(b, agent) for b in bodies],
                    "sitemaps": [sitemap_urls(b) for b in bodies],
                }
            )

    return robots_df.select(domain_col, body_col).mapInPandas(
        run, schema=schema
    )


def robots_decision(path: Column | str, rules: Column | str) -> Column:
    """The §2.2.2 per-URL decision as ONE JVM SQL expression over a
    path and a rule array, with ZERO regex anywhere: literal-prefix
    rules match via startswith (the overwhelmingly common case);
    wildcard/anchored rules match via their '*'-split parts —
    startswith on the first part, a greedy-leftmost locate() fold
    over the middle parts, endswith + a position bound for the '$'
    anchor. Greedy-leftmost placement is COMPLETE for a pattern
    language of literals and '*' only (no alternation/backrefs): if
    any placement of the middle parts matches, placing each at its
    leftmost feasible position also matches. The previous RLIKE form
    recompiled each non-literal pattern per evaluation (URL x rule);
    this fold is plain string search. Then the matches fold to the
    longest-spec winner (allow wins ties); allowed when nothing
    matches or rules are NULL (no robots)."""
    p = path if isinstance(path, str) else None
    r = rules if isinstance(rules, str) else None
    if p is None or r is None:
        raise ValueError("robots_decision takes COLUMN NAMES (SQL expr)")
    # 1-based "next search position" after matching the first part,
    # folded through the middle parts; -1 = dead. For anchored rules
    # the LAST part is checked as a suffix whose start must not
    # overlap the folded position.
    fold = f"""aggregate(
        slice(x.parts, 2,
              size(x.parts) - CASE WHEN x.anchored THEN 2 ELSE 1 END),
        length(element_at(x.parts, 1)) + 1,
        (acc, q) -> CASE WHEN acc < 0 THEN -1
            WHEN q = '' THEN acc
            WHEN locate(q, {p}, acc) = 0 THEN -1
            ELSE locate(q, {p}, acc) + length(q) END)"""
    wild = f"""CASE
        WHEN x.anchored AND size(x.parts) = 1
            THEN {p} = element_at(x.parts, 1)
        WHEN NOT startswith({p}, element_at(x.parts, 1)) THEN false
        WHEN x.anchored THEN
            endswith({p}, element_at(x.parts, -1))
            AND {fold} BETWEEN 0 AND
                length({p}) - length(element_at(x.parts, -1)) + 1
        ELSE {fold} >= 0 END"""
    match = (
        f"filter({r}, x -> CASE WHEN x.lit THEN startswith({p}, x.pat) "
        f"ELSE ({wild}) END)"
    )
    return F.expr(
        f"""
        CASE WHEN {r} IS NULL THEN true ELSE
          CASE WHEN size({match}) = 0 THEN true
          ELSE aggregate({match},
                CAST(NULL AS {_RULE_STRUCT_SQL}),
                (acc, x) -> CASE WHEN acc IS NULL THEN x
                    WHEN x.spec > acc.spec THEN x
                    WHEN x.spec = acc.spec AND x.allow AND NOT acc.allow
                        THEN x
                    ELSE acc END).allow
          END
        END
        """
    )


def robots_gate(
    urls_df: DataFrame,
    robots_df: DataFrame,
    agent: str,
    url_col: str = "url",
    domain_col: str = "domain",
    body_col: str = "robots_txt",
) -> DataFrame:
    """urls_df + (robots_allowed boolean): join each URL's host
    against its domain's parsed rules and evaluate the RFC decision.
    The robots side is per-domain (small) — Spark broadcasts it when
    it fits; URLs never touch Python.

    Match target is the PATH PLUS OPTIONAL QUERY (everything after the
    authority up to any '#'), per RFC 9309 §2.2.2 — so query-targeting
    rules like 'Disallow: /*?*' and 'Disallow: /search?q=' apply. Only
    the fragment is excluded."""
    from kspp_spark.functions.web import url_host

    rules = parse_robots(
        robots_df, agent, domain_col=domain_col, body_col=body_col
    ).withColumnRenamed(domain_col, "_rb_domain")
    out = urls_df.withColumn("_rb_host", url_host(url_col)).join(
        rules, F.col("_rb_host") == F.col("_rb_domain"), "left"
    )
    path = F.regexp_extract(F.col(url_col), r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    # empty path -> '/'; query with no path ('host?q=1') -> '/?q=1'
    path = (
        F.when(path == "", F.lit("/"))
        .when(path.startswith("?"), F.concat(F.lit("/"), path))
        .otherwise(path)
    )
    return (
        out.withColumn("_rb_path", path)
        .withColumn(
            "robots_allowed", robots_decision("_rb_path", "rules")
        )
        .drop("_rb_host", "_rb_domain", "_rb_path", "rules")
    )
