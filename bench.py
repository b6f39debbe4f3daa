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
_LOAD0 = os.getloadavg()[0] if hasattr(os, "getloadavg") else -1.0

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
]


def main() -> None:
    spark = get_spark("kspp_spark_bench")
    queries = entry_mod.queries()
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
        "load_avg_start": round(_LOAD0, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
