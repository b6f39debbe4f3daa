"""Registry-wide physical-plan shape sweep (optimization rounds).

For every declared query, prints one line of plan-shape counters:
parquet scan nodes (total + max re-reads of one input), Exchange,
Window, SortMergeJoin, BroadcastNestedLoopJoin / CartesianProduct,
Python-boundary nodes, and the plan's operator count. Flags are for
triage only — each flagged query needs per-case adjudication (a
cached relation's child plan prints per reference without
re-executing, so high scan counts are a LEAD, not a verdict).

Usage:
    python tools/plan_sweep.py [--only q1,q2] [--min-scans 3]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--min-scans", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("kspp_plan_sweep")
    queries = entry_mod.queries()
    names = (
        [s.strip() for s in args.only.split(",") if s.strip()]
        if args.only
        else sorted(queries)
    )

    scan_re = re.compile(r"Scan parquet[^\n]*\[([^\]]*)\]")
    loc_re = re.compile(r"Location:.*?\[(.*?)\]")
    print(
        "query\tops\tscans\tmax_rescan\texchanges\twindows\tsmj\tbnlj"
        "\tcartesian\tpython\tsubq"
    )
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            # keep the TSV machine-readable: the error lands on stderr
            # and the row is padded to the header's 11 columns
            # (ADVICE r13)
            msg = f"{type(e).__name__}: {e}".replace("\t", " ").replace("\n", " ")
            print(f"plan_sweep: {name} ERROR {msg}", file=sys.stderr)
            print(f"{name}\tERROR" + "\t" * 9, flush=True)
            continue
        ops = len(re.findall(r"^\(\d+\)", txt, re.M))
        scans = txt.count("Scan parquet")
        locs = Counter(loc_re.findall(txt))
        max_rescan = max(locs.values()) if locs else 0
        exch = len(re.findall(r"^\(\d+\) Exchange", txt, re.M))
        wins = len(re.findall(r"^\(\d+\) Window", txt, re.M))
        smj = txt.count("SortMergeJoin")
        bnlj = txt.count("BroadcastNestedLoopJoin")
        cart = txt.count("CartesianProduct")
        py = (
            txt.count("BatchEvalPython")
            + txt.count("ArrowEvalPython")
            + txt.count("MapInPandas")
            + txt.count("MapInArrow")
        )
        subq = txt.count("Subquery")
        print(
            f"{name}\t{ops}\t{scans}\t{max_rescan}\t{exch}\t{wins}"
            f"\t{smj}\t{bnlj}\t{cart}\t{py}\t{subq}",
            flush=True,
        )


if __name__ == "__main__":
    main()
