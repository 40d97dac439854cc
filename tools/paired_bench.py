"""Paired benchmark: run bench.py (Spark engine) and oracle_bench.py
(DuckDB oracle) back-to-back in one process invocation and write ONE
JSON artifact with both sides + the ratio, so the baseline comparison is
reproducible from the repo without re-running either half (host
contention swings single runs ±25%; pairing cancels it).

Usage: python tools/paired_bench.py [--out BENCH_PAIRED.json] [sf_dir]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], sf_dir: str) -> dict:
    # bench.py pairs the oracle in-process by default now (r6 tail
    # protocol); this harness runs the oracle half itself, so disable
    # the embedded pairing to avoid timing DuckDB twice
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_PAIRED="0")
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, check=True
    ).stdout
    # last JSON line CARRYING the per-query dict (bench.py additionally
    # prints a compact totals-only line last for the driver's tail
    # window; Spark logs can pollute earlier lines)
    fallback = None
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            if "queries" in rec:
                return rec
            fallback = fallback or rec
    if fallback is not None:
        return fallback
    raise RuntimeError(f"no JSON line in output of {cmd}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_PAIRED.json"))
    args = ap.parse_args()

    engine = _run([sys.executable, "bench.py"], args.sf_dir)
    oracle = _run([sys.executable, "tools/oracle_bench.py", args.sf_dir], args.sf_dir)

    shared = sorted(set(engine["queries"]) & set(oracle["queries"]))
    paired_engine = round(sum(engine["queries"][q] for q in shared), 3)
    paired_oracle = round(sum(oracle["queries"][q] for q in shared), 3)
    record = {
        "sf": engine.get("sf"),
        "n_queries_paired": len(shared),
        "engine_total_sec": paired_engine,
        "oracle_total_sec": paired_oracle,
        "ratio_engine_over_oracle": round(paired_engine / paired_oracle, 3)
        if paired_oracle
        else None,
        "engine_only": sorted(set(engine["queries"]) - set(oracle["queries"])),
        "oracle_only": sorted(set(oracle["queries"]) - set(engine["queries"])),
        "engine": engine,
        "oracle": oracle,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(
        json.dumps(
            {k: record[k] for k in (
                "sf", "n_queries_paired", "engine_total_sec",
                "oracle_total_sec", "ratio_engine_over_oracle",
            )}
        )
    )


if __name__ == "__main__":
    main()
