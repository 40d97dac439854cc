"""Matched-depth cross-run minima tally for optimization rounds.

BASELINE.md rule (r16 lesson): only compare cross-run minima ratios
computed from the SAME number of runs on each side — the oracle's
minima converge slower than the engine's, so unequal depths skew the
ratio. Given two artifact prefixes and N, this sums per-query minima
over runs 1..N of each series (engine and oracle sides independently)
and prints both composites and the engine/oracle ratio per series.

Usage: python tools/matched_depth_tally.py BENCH_PAIRED_r16opt_run BENCH_PAIRED_r17_run [N]
"""

from __future__ import annotations

import json
import os
import sys


def tally(prefix: str, n: int) -> dict:
    eng: dict[str, float] = {}
    ora: dict[str, float] = {}
    used = []
    for i in range(1, n + 1):
        path = f"{prefix}{i}.json"
        if not os.path.exists(path):
            continue
        with open(path) as f:
            doc = json.load(f)
        used.append(i)
        for side, best in (("engine", eng), ("oracle", ora)):
            for name, sec in doc[side]["queries"].items():
                if name not in best or sec < best[name]:
                    best[name] = sec
    shared = set(eng) & set(ora)
    e_tot = sum(eng[q] for q in shared)
    o_tot = sum(ora[q] for q in shared)
    return {
        "prefix": prefix,
        "runs_used": used,
        "n_queries": len(shared),
        "engine_min_composite_sec": round(e_tot, 3),
        "oracle_min_composite_sec": round(o_tot, 3),
        "ratio": round(e_tot / o_tot, 4) if o_tot else None,
    }


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 17
    ta, tb = tally(a, n), tally(b, n)
    depth = min(len(ta["runs_used"]), len(tb["runs_used"]))
    if len(ta["runs_used"]) != len(tb["runs_used"]):
        ta, tb = tally(a, depth), tally(b, depth)
    print(json.dumps({"depth": depth, "a": ta, "b": tb}, indent=1))


if __name__ == "__main__":
    main()
