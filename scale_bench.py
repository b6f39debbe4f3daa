"""One-session sf0.1 vs sf1 scale measurement (VERDICT r11 item #1).

Times each heavy-tier query at BOTH scale points back-to-back in the
same SparkSession — within-window comparison, so VM throughput drift
largely cancels out of the RATIO even when the absolute numbers are
noisy. count_by_key runs first as the yardstick (machine factor vs
its 0.25 s calm record, the METRICS.md protocol).

Prints one JSON blob and writes it to --out.

Usage:
    python scale_bench.py --sf1 /root/repo/.scale/sf1 \
        --out SCALE_MEASURE_r12.json [--runs 2] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from kspp_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"

# The bench-top heavy tier (VERDICT r11 item #1 list): every query
# whose sf0.1 cost exceeds ~1.5 s calm, i.e. where a super-linear
# constant would actually hurt at 100 TB.
HEAVY = [
    "dup_clusters",
    "cluster_reps",
    "heavy_hitters",
    "heavy_hitters_production",
    "typo_pairs",
    "ppjoin_pairs",
    "train_classifier",
    "decontaminate_bloom",
    "minhash_lsh_pairs",
    "srp_ann",
    "join_size_estimate",
    "winnow_dup_pairs",
    "table_checksum",
]


def _time(fn, spark, sf_dir, runs):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument(
        "--all",
        action="store_true",
        help="sweep EVERY registered query (VERDICT r12 item #4: the "
        "full-registry decade close; rows-only timing, runs=1 "
        "recommended)",
    )
    args = ap.parse_args()
    if args.all:
        names = list(entry_mod.queries().keys())
    else:
        names = (
            [s for s in args.queries.split(",") if s]
            if args.queries
            else HEAVY
        )
    spark = get_spark("kspp_spark_scale")
    queries = entry_mod.queries()
    # warmup + yardstick (the calm-window adjudication input)
    _time(queries["count_by_key"], spark, SF01, 1)
    yard = _time(queries["count_by_key"], spark, SF01, 3)
    out = {
        "yardstick_count_by_key_sf01": yard,
        "machine_factor_vs_record": round(yard / 0.25, 3),
        "load_avg_start": round(os.getloadavg()[0], 2),
        "runs": args.runs,
        "queries": {},
    }
    for name in names:
        fn = queries[name]
        try:
            a = _time(fn, spark, SF01, args.runs)
            b = _time(fn, spark, args.sf1, args.runs)
        except Exception as e:  # one bad query must not kill the sweep
            out["queries"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: ERROR {type(e).__name__}", file=sys.stderr)
            continue
        out["queries"][name] = {
            "sf0.1_sec": a,
            "sf1_sec": b,
            "ratio": round(b / a, 2) if a > 0 else None,
        }
        print(f"{name}: {a} -> {b}  x{out['queries'][name]['ratio']}",
              file=sys.stderr)
    out["load_avg_end"] = round(os.getloadavg()[0], 2)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
