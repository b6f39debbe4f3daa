"""Per-query profiling harness for the optimization rounds.

Times named queries with the noop sink (guide §1.4), labels jobs
(§1.5), and writes .explain("formatted") to
plans/$SPARK_GRAFT_PLAN_ROUND/<q>_<tag>.txt (default r14).

Usage:
    python tools/profile_query.py q1,q2,... [--tag before] [--runs 3]
        [--no-plan]

Prints one line per query: median + all samples. Honors
SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    spark = get_spark("kspp_profile")
    queries = entry_mod.queries()
    names = [s.strip() for s in args.queries.split(",") if s.strip()]
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warmup: first query once untimed (JVM/codegen startup)
    queries[names[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = queries[name]
        if args.tag and not args.no_plan:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"{name}\t{med:.3f}\t[{', '.join(f'{s:.3f}' for s in samples)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
