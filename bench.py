"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query median wall-clock seconds (median of RUNS).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
# Calm-window guard (VERDICT r9 item #1): a snapshot taken under
# external load is not comparable to the records, so (a) wait up to
# SPARK_GRAFT_CALM_WAIT_S for the 1-min load average to fall below
# 1.0 before starting, and (b) if it never does, STILL run but tag
# the output "degraded": true so no one mistakes a loaded run for a
# clean record (refusing outright would hand the driver a parse
# failure, which is worse than a tagged number).
CALM_WAIT_S = float(os.environ.get("SPARK_GRAFT_CALM_WAIT_S", "90"))


def _load1() -> float:
    return os.getloadavg()[0] if hasattr(os, "getloadavg") else -1.0


def _await_calm() -> float:
    """Poll until load < 1 or the wait budget runs out; returns the
    load at start-of-measurement (what load_avg_start records)."""
    deadline = time.monotonic() + CALM_WAIT_S
    load = _load1()
    while load > 1.0 and time.monotonic() < deadline:
        time.sleep(5)
        load = _load1()
    return load

# Headline set from BASELINE.md plus the beyond-reference operators.
BENCH_QUERIES = [
    "count_by_key",
    "count_by_value",
    "ktable_latest",
    "kstream_left_join",
    "transform_revenue",
    "windowed_count",
    "pricing_summary",
    "revenue_per_nation",
    "word_count",
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_cosine",
    "asof_join",
    "session_windows",
    "curate_docs",
    "tfidf_top_terms",
    "volume_shipping",
    "returned_items",
    "large_orders",
    "local_supplier_volume",
    "market_share",
    "waiting_suppliers",
    "repetition_stats",
    "train_split",
    "pack_sequences",
    # round-2 additions (compare per-query medians across rounds, not
    # totals — the set widened from 25 to 28; see BASELINE.md)
    "dedup_embedding",
    "decontaminate",
    "pii_mask",
    # round-3 additions (28 -> 30): the de-quadraticized connected
    # components and the exact-oracle portable LSH pipeline
    "dup_clusters",
    "minhash_pairs_portable",
    # round-4 additions (30 -> 35): span-level exact-substring dedup,
    # the SRP hyperplane-LSH embedding tier (pairs + ANN + int8
    # rescore), and hashed linear classifier inference
    "substring_spans",
    "srp_pairs",
    "quality_classifier",
    "srp_ann",
    "quantized_ann",
    "bm25_search",
    "inverted_index",
    # round-5 additions (37 -> 40): positional-index materialization,
    # index-backed phrase search (index built in-plan here; the stored
    # index is plan-pinned in tests), and SCD2 point-in-time lookup
    "positional_index",
    "phrase_search_indexed",
    "scd2_lookup",
    # round-6 additions (40 -> 44): changelog-folded index, SRP-bucket
    # diversity sampling, single-tokenize LM scoring, and the
    # DATA-STABLE synthetic duplicate graph (q_dup_clusters' cost
    # follows the driver-regenerated testdata's planted clusters;
    # dup_clusters_fixed is byte-identical every round)
    "positional_index_folded",
    "srp_diverse_sample",
    "lm_scores",
    "dup_clusters_fixed",
    # round-6 late additions (44 -> 47): corpus-frequency boilerplate
    # removal (digest-only detector shuffle + map-side broadcast
    # rewrite), the map-only Gopher quality gate, and the one-pass
    # Gopher repetition suite
    "boilerplate_clean",
    "gopher_quality",
    "gopher_repetition",
    # round-7 additions (47 -> 49): exact-oracled image header decode
    # (Arrow-batched synthesis + public-spec byte parse) and the
    # Lee-et-al span-removal completion (localize + cut, exact-oracled)
    "media_decode",
    "dup_spans_removed",
    # round-7 late additions (49 -> 55): the training-prep tier
    # (distributed two-pass global shuffle rank, LPT serpentine token
    # sharding, CCNet perplexity partition) and the web front door
    # (URL canonicalization, HTML->text, RFC 9309 robots gate) — all
    # exact-oracled
    "train_shuffle",
    "shard_assign",
    "perplexity_buckets",
    "url_canonicalize",
    "html_to_text",
    "robots_gate",
    # round-8 additions (55 -> 57): public-suffix-list registrable
    # domains (literal-map lookup, no join) + per-domain rollup, and
    # the outlink-graph extraction (JVM regex anchors + RFC 3986
    # resolution + per-target-domain rollup)
    "domain_rollup",
    "link_graph",
    # round-9 additions (57 -> 66): integer-scaled PageRank over the
    # outlink domain graph (the first graded ITERATIVE plan needed a
    # tracked record — VERDICT r8 item #3) plus the round-9 graded
    # queries: winnowing (profile + near-dup pairs), sitemap frontier
    # discovery, the full-PSL broadcast-join rollup, the SURT capture
    # index, bloom-prefiltered decontamination, and the integer-exact
    # classifier trainer (the second iterative plan), and Stupid
    # Backoff trigram LM self-scoring (Brants et al. 2007)
    "domain_rank",
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "sitemap_frontier",
    "domain_rollup_full",
    "surt_index",
    "decontaminate_bloom",
    "train_classifier",
    "stupid_backoff",
    # round-10 additions (66 -> 76): link-analysis duals (HITS,
    # anchor-text target profiles), crawl budgeting, quality-argmax
    # cluster collapse, intra-doc paragraph dedup, the clickstream
    # transition matrix, epoch-lift trending vocabulary, Wilson-bound
    # source quality, Arrow-batched NFC normalization, and DPR-style
    # hard-negative mining
    "hits_rank",
    "anchor_terms",
    "crawl_budget",
    "cluster_reps",
    "dedup_paragraphs",
    "event_transitions",
    "trending_terms",
    "domain_quality",
    "nfc_normalize",
    "hard_negatives",
    # round-10 late additions (76 -> 79): deterministic Count-Min
    # sketch build + probe (bounded-state distributed counting) and
    # order-independent per-dimension min-max feature scaling
    "cms_counts",
    "cms_estimates",
    "minmax_scaled",
    # round-10 final additions (79 -> 87): integer-exact portable
    # HyperLogLog (direct + lossless slice merge), per-doc
    # contamination fraction, keyed snapshot diff, exact heavy
    # hitters via two-pass CMS prune, SymSpell typo pairs, and
    # log-linear histogram quantiles (the third mergeable sketch)
    "hll_cardinality",
    "hll_merge_slices",
    "contamination_scores",
    "snapshot_diff",
    "heavy_hitters",
    "typo_pairs",
    "quantile_histogram",
    "outlier_gate",
    # rows-only production twin (like minhash_lsh_pairs): the native
    # DataSketches HLL next to the portable md5 form — the recorded
    # pair IS the portable-overhead measurement
    "hll_production",
    # round-10 second-session additions (88 -> 106): classifier
    # evaluation (histogram ROC-AUC / calibration / confusion),
    # lossless PPJoin prefix-filtered similarity join, weekly cohort
    # retention, calendar gap-fill LOCF + RANGE rolling sums, Morton
    # z-order layout stats, degree-ordered triangle counting, per-key
    # OLS trends and integer rolling z-score outliers
    "auc_eval",
    "score_calibration",
    "classifier_confusion",
    "ppjoin_pairs",
    "cohort_retention",
    "gap_fill_locf",
    "rolling_window_sum",
    "daily_trend",
    "rolling_outliers",
    "zorder_stats",
    "triangle_counts",
    "session_ids",
    "length_percentile",
    "table_checksum",
    "profile_columns",
    "join_size_estimate",
    "item_associations",
    "rate_ztest",
    # round-11 additions: the xxhash64-family heavy hitters (VERDICT
    # r10 item #3 — the bench pair vs heavy_hitters IS the md5
    # kernel-cost measurement; full plain-SQL oracle since CMS-prune
    # exactness is hash-family-independent), the grid-bucketed pure-
    # range join (the BNLJ killer), the ordered funnel pair, and the
    # governance tier (k-anonymity audit, categorical drift)
    "heavy_hitters_production",
    "range_bucket_join",
    "funnel_stages",
    "funnel_conversion",
    "k_anonymity",
    "category_drift",
    "numeric_drift",
    "rrf_fusion",
    "event_pattern",
    "weighted_median",
    "benford",
    # round-12 additions: funnel stage-latency quantiles (VERDICT r11
    # item #5 — the bounded-bucket quantile compose), per-match spans
    # for the event-sequence regex (item #6), and the product-
    # analytics / data-quality widening batch
    "funnel_latency",
    "event_pattern_spans",
    "rfm_segments",
    "attribution",
    "referential_integrity",
    "correlation_matrix",
    "ewma_smooth",
    "cusum_alarms",
    "acf_daily",
    "bfs_hops",
    "spearman",
    "kcore",
    "radius_join",
    # round-13 additions
    "knn_radius",
    "mad_outliers",
    "attribution_decay",
    "theil_sen",
    "stickiness",
    "hotspots",
    "knn_vote",
    "assortativity",
    "readability",
    # round-14 addition: the driver-gradable HLL error-band property
    # twin (VERDICT r13 item #6 — no_oracle hole closed as a graded
    # boolean row instead of a rows-only estimate)
    "hll_error_band",
]

# Recorded per-query BEST at sf0.1 across all rounds' BENCH_r*.json
# (mirrored in BASELINE.md "Recorded bests"; update both together when
# a round sets a new best). The cross-round normalization protocol:
# VM throughput varies 25-30% round to round (adjudicated in r5,
# METRICS.md), so raw cross-round ratios are meaningless. NORM_BASKET
# is the untouched-since-round-1 TPC-H/map-only queries — any uniform
# shift on them is machine, not code. machine_factor = median over the
# basket of (current / best); normalized_ratio(q) = (current / best)
# / machine_factor. A judge reads code regressions off normalized
# ratios in ONE file: ~1.0 = at the recorded best, >1.2 = look at it.
RECORD_BEST = {
    "asof_join": 0.3965,
    "bm25_search": 0.5498,
    "boilerplate_clean": 0.6991,
    "gopher_quality": 0.4082,
    "gopher_repetition": 1.6697,
    "count_by_key": 0.2487,
    "count_by_value": 0.3523,
    "curate_docs": 0.8808,
    "decontaminate": 0.9493,
    "dedup_embedding": 0.5995,
    "dedup_exact": 0.2267,
    "dup_clusters": 2.4329,
    "dup_clusters_fixed": 2.0925,
    "inverted_index": 0.4615,
    "knn_cosine": 0.687,
    "kstream_left_join": 0.3455,
    "ktable_latest": 0.349,
    "large_orders": 0.8307,
    "lm_scores": 0.7559,
    "media_decode": 0.2656,
    "dup_spans_removed": 1.1122,
    "train_shuffle": 0.2858,
    "shard_assign": 0.449,
    "perplexity_buckets": 0.9005,
    "url_canonicalize": 0.2208,
    "html_to_text": 0.5226,
    "robots_gate": 0.4098,
    "local_supplier_volume": 0.6363,
    "market_share": 0.9109,
    "minhash_lsh_pairs": 2.2608,
    "minhash_pairs_portable": 1.4031,
    "pack_sequences": 0.3167,
    "phrase_search_indexed": 0.4433,
    "pii_mask": 0.3353,
    "positional_index": 0.6832,
    "positional_index_folded": 1.5689,
    "pricing_summary": 0.6758,
    "quality_classifier": 0.5822,
    "quantized_ann": 0.9793,
    "repetition_stats": 0.7897,
    "returned_items": 0.5758,
    "revenue_per_nation": 0.498,
    "scd2_lookup": 0.3235,
    "session_windows": 0.3225,
    "srp_ann": 1.1883,
    "srp_diverse_sample": 0.2254,
    "srp_pairs": 2.3054,
    "substring_spans": 0.6536,
    "tfidf_top_terms": 0.5601,
    "train_split": 0.1118,
    "transform_revenue": 0.4025,
    "volume_shipping": 0.7936,
    "waiting_suppliers": 1.1042,
    "windowed_count": 0.2333,
    "word_count": 0.2896,
    "domain_rollup": 0.7259,
    "link_graph": 1.1793,
    "domain_rank": 1.0379,
    "decontaminate_bloom": 1.9438,
    "domain_rollup_full": 0.6412,
    "sitemap_frontier": 0.7332,
    "surt_index": 0.5393,
    "winnow_dup_pairs": 1.3666,
    "winnow_fingerprints": 0.9565,
    "train_classifier": 1.9857,
    "stupid_backoff": 1.9303,
    "anchor_terms": 1.0276,
    "cluster_reps": 2.0905,
    "cms_counts": 0.9353,
    "cms_estimates": 1.082,
    "crawl_budget": 0.1862,
    "dedup_paragraphs": 0.1665,
    "domain_quality": 0.2086,
    "event_transitions": 0.3913,
    "hard_negatives": 0.5654,
    "hits_rank": 1.1929,
    "minmax_scaled": 0.7944,
    "nfc_normalize": 0.2707,
    "trending_terms": 0.4231,
    "hll_cardinality": 0.4801,
    "hll_merge_slices": 0.6866,
    "contamination_scores": 0.9259,
    "snapshot_diff": 0.3762,
    "heavy_hitters": 2.7286,
    "typo_pairs": 1.6369,
    "quantile_histogram": 0.4254,
    "hll_production": 0.5849,
    "outlier_gate": 0.5028,
    # round-10 third-session first records (calm runs G/H, mf 1.11-1.15)
    "auc_eval": 0.4169,
    "classifier_confusion": 0.3739,
    "cohort_retention": 0.3995,
    "daily_trend": 0.2503,
    "gap_fill_locf": 0.2547,
    "ppjoin_pairs": 2.8522,
    "rolling_outliers": 0.2538,
    "rolling_window_sum": 0.1733,
    "score_calibration": 0.3686,
    "session_ids": 0.3025,
    "triangle_counts": 1.2163,
    "zorder_stats": 0.3616,
    # round-10 close first records (run I, load 0.99, mf 1.282)
    "join_size_estimate": 1.6927,
    "length_percentile": 0.5736,
    "profile_columns": 0.7195,
    # round-10 final first records (run J, load 0.14, mf 1.2155)
    "item_associations": 1.5322,
    "rate_ztest": 0.4287,
    "table_checksum": 1.4327,  # injective serialization (the 1.3013
    # record belonged to the retired non-injective sentinel form)
    # round-11 first records (calm run, load 0.92, mf 1.144) — the
    # eight round-11 queries; improved bests folded in place above
    # (ppjoin_pairs 3.8156, profile_columns 1.0277,
    # item_associations 1.9524, rate_ztest 0.4599 and four basket
    # queries updated in their original entries)
    "category_drift": 0.2769,
    "funnel_conversion": 0.4414,
    "funnel_stages": 0.2797,
    "heavy_hitters_production": 2.2244,
    "k_anonymity": 0.1162,
    "numeric_drift": 0.4961,
    "range_bucket_join": 0.2948,
    "rrf_fusion": 0.3479,
    # round-11 close first records (run 3, load 0.08, mf 1.4508 — the
    # documented ~1.45x-slow VM window; slack by construction)
    "event_pattern": 0.2564,
    "weighted_median": 1.1483,
    "benford": 0.401,
    # round-12 first records (calm run, load 0.08, degraded=false,
    # mf 1.2085): the twelve round-12 queries; 56 improved bests
    # folded in place above from the same run
    "funnel_latency": 0.4563,
    "event_pattern_spans": 0.4018,
    "rfm_segments": 0.7049,
    "attribution": 0.9561,
    "referential_integrity": 1.0427,
    "correlation_matrix": 0.918,
    "ewma_smooth": 0.3497,
    "cusum_alarms": 0.3018,
    "acf_daily": 0.3643,
    "bfs_hops": 0.7817,
    "spearman": 2.5876,
    "kcore": 0.6666,
    "radius_join": 0.6322,  # r12 late addition (r=50000, 845k pairs)
}

# untouched-since-round-1 queries (pure TPC-H / map-only shapes, no
# code delta since their BASELINE.md record): a uniform shift here is
# the machine, not the code
NORM_BASKET = [
    "count_by_key", "count_by_value", "ktable_latest",
    "kstream_left_join", "transform_revenue", "windowed_count",
    "pricing_summary", "revenue_per_nation", "word_count",
    "returned_items", "volume_shipping", "large_orders",
    "local_supplier_volume", "market_share", "waiting_suppliers",
    "train_split",
]


def main() -> None:
    load0 = _await_calm()
    degraded = load0 > 1.0
    spark = get_spark("kspp_spark_bench")
    queries = entry_mod.queries()
    # Optional subset (comma-separated names): the sf1 scale-point
    # runs (SCALE.md "measured" column) time only the heavy tier.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    global BENCH_QUERIES
    if subset:
        names = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        BENCH_QUERIES = names
    # Warmup: run the first query once untimed so JVM/codegen startup
    # doesn't land in the first timed sample (matters when RUNS=1).
    queries[BENCH_QUERIES[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # foreach-noop forces full materialization without
            # driver-side collect of the result set
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "sum_median_query_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # measurement context (VERDICT r2: medians over <=2 samples put
        # run noise straight into the record): sample count + machine
        # load at start, so a regression flag can be adjudicated
        "runs": RUNS,
        "load_avg_start": round(load0, 2),
        # True when the calm-window guard timed out and the run began
        # under external load > 1: numbers are NOT record-comparable
        # (the repo's adjudication protocol, METRICS.md) — compare
        # normalized ratios only, never fold these into RECORD_BEST.
        "degraded": degraded,
    }
    # cross-round normalization (VERDICT r5 item #6) — only meaningful
    # against the sf0.1 record the bests were taken at
    if out["sf"] == 0.1:
        basket = [
            timings[q] / RECORD_BEST[q]
            for q in NORM_BASKET
            if q in timings and q in RECORD_BEST
        ]
        if basket:
            mf = round(statistics.median(basket), 4)
            out["machine_factor"] = mf
            out["normalized"] = {
                q: round((t / RECORD_BEST[q]) / mf, 3)
                for q, t in timings.items()
                if q in RECORD_BEST
            }
            out["unnormalized"] = sorted(
                q for q in timings if q not in RECORD_BEST
            )
    # The full record goes to BENCH_LOCAL.json BEFORE stdout: the
    # driver's stdout capture keeps only the LAST 2000 chars, which
    # truncated the (long) JSON line two rounds running (BENCH_r06/
    # r07 parsed: null — the 'tail' field is exactly 2000 chars).
    # This file is committed per round, so the per-query record +
    # normalization survive verbatim regardless of stdout limits.
    # Guard (round-12 incident): BENCH_LOCAL.json is the committed
    # sf0.1 RECORD; a quick sf0.01 smoke run must not clobber it.
    # Non-record scale factors write a sidecar instead.
    fname = (
        "BENCH_LOCAL.json"
        if out["sf"] == 0.1
        else f"BENCH_SMOKE_sf{out['sf']}.json"
    )
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), fname
    )
    try:
        with open(local_path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    print(format_stdout_line(out, timings, BENCH_QUERIES), flush=True)


def format_stdout_line(
    out: dict, timings: dict[str, float], bench_queries: list[str]
) -> str:
    """Build the ONE stdout JSON line within the driver's tail window.

    stdout is EXACTLY one JSON line, and it must fit the driver's
    2000-char tail window or the driver records parsed:null. The
    line is the LAST thing printed, so only its own length matters
    (earlier progress-bar noise falls off the front of the window):
    budget = 1995 chars. PHYSICS NOTE (VERDICT r10 item #6): the
    full 106-query dict needs ~2330 chars even at 1-decimal
    precision — full names can NEVER fit the window, so
    BENCH_LOCAL.json (written by main(), committed per round) is the
    authoritative complete record; stdout carries as many entries
    as fit, newest first. Shedding order (VERDICT r13 item #1):
    precision -> oldest query entries. The measurement-context
    envelope (machine_factor / degraded / load_avg_start / runs)
    is NEVER shed — it costs ~70 chars and is the one thing the
    driver needs to adjudicate a loaded window (the r13 bench ran
    at load 1.51 and the old order dropped exactly those flags).
    """
    BUDGET = 1995
    lean = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "queries": timings,
        "sf": out["sf"],
        "runs": out["runs"],
        "machine_factor": out.get("machine_factor"),
        "degraded": out["degraded"],
        "load_avg_start": out["load_avg_start"],
    }
    # compact separators: default json.dumps spends 2 chars per item
    # on ", "/": " padding — at 76 queries that alone overflowed the
    # window and dropped the per-query dict from BENCH_r10's stdout
    compact = {"separators": (",", ":")}
    line = json.dumps(lean, **compact)
    for ndigits in (3, 2, 1):
        if len(line) < BUDGET:
            break
        lean["queries"] = {q: round(t, ndigits) for q, t in timings.items()}
        line = json.dumps(lean, **compact)
    if len(line) >= BUDGET:
        # Keep as many per-query entries as fit, NEWEST bench
        # additions first (the queries a fresh round is graded on;
        # older ones have records in every prior BENCH_r*.json), and
        # say how many were cut. BENCH_LOCAL.json always carries the
        # complete table. The envelope keys stay put.
        kept: dict[str, float] = {}
        for q in reversed(bench_queries):
            trial = dict(kept)
            trial[q] = round(timings[q], 1)
            lean["queries"] = trial
            lean["queries_truncated"] = len(timings) - len(trial)
            if len(json.dumps(lean, **compact)) >= BUDGET:
                break
            kept = trial
        lean["queries"] = kept
        lean["queries_truncated"] = len(timings) - len(kept)
        line = json.dumps(lean, **compact)
    return line


if __name__ == "__main__":
    main()
