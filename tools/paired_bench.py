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


def pick_record(lines: list[str]) -> dict | None:
    """Choose the record carrying the FULL per-query dict.

    bench.py prints (in order) the full line (`queries` +
    `oracle_queries`, all entries), a rotating line, a per_query_timings
    line, and LAST a compact tail line that — since r17 — also carries a
    size-budgeted PARTIAL `queries` map for the driver's 2000-char
    window. Scanning from the end: prefer the last line with
    `oracle_queries` (the full engine line; the partial tail map never
    has it), then the last with a `queries` dict (oracle_bench.py's one
    line), then any JSON line."""
    with_queries = None
    fallback = None
    for line in reversed(lines):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "oracle_queries" in rec:
            return rec
        if with_queries is None and "queries" in rec:
            with_queries = rec
        fallback = fallback or rec
    return with_queries or fallback


def _run(cmd: list[str], sf_dir: str) -> dict:
    # bench.py pairs the oracle in-process by default now (r6 tail
    # protocol); this harness runs the oracle half itself, so disable
    # the embedded pairing to avoid timing DuckDB twice
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_PAIRED="0")
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, check=True
    ).stdout
    rec = pick_record(out.strip().splitlines())
    if rec is not None:
        return rec
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
