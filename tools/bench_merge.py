"""Merge per-query minima across recorded paired-bench artifacts.

BASELINE.md's round-over-round signal is the sum-of-per-query-MINIMA
composite. bench.py computes it within one invocation (its passes);
this tool computes it ACROSS invocations — feed it the committed
BENCH_PAIRED_r{N}_run*.json files and it prints one JSON line with the
cross-run ENGINE composite and the per-run spread (artifacts carry no
per-query oracle timings, so no cross-run oracle composite exists —
compare the engine composite only against a single run's
oracle_total_sec with that caveat in mind).

Note: run artifacts carry per-run composites and pass totals; only the
full bench line (with "queries") contributes per-query minima. Runs
recorded compact-only still contribute their totals to the spread.

Usage: python tools/bench_merge.py BENCH_PAIRED_r12_run*.json
"""

from __future__ import annotations

import json
import sys


def main(paths: list[str]) -> None:
    eng_best: dict[str, float] = {}
    clean_best: dict[str, float] = {}  # minima over canary-clean runs only
    run_sets: list[set[str]] = []  # query set per run that carried timings
    clean_sets: list[set[str]] = []
    runs = []
    for path in paths:
        # an artifact may hold several JSON lines (full per-query line,
        # compact failsafe, compact+ratios) — merge them, later lines win
        # for scalar fields, any line may carry the "queries" dict
        doc: dict = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    part = json.loads(line)
                except ValueError:
                    continue
                queries = doc.get("queries")
                doc.update(part)
                if "queries" not in part and queries:
                    doc["queries"] = queries
        runs.append(
            {
                "file": path,
                "value": doc.get("value"),
                "oracle_total_sec": doc.get("oracle_total_sec"),
                "raw_ratio": doc.get("raw_ratio"),
                "floor_adjusted_ratio": doc.get("floor_adjusted_ratio"),
                "canary_ratio": doc.get("canary_ratio"),
                "degraded_window": doc.get("degraded_window"),
                # host-invariant engine-regression signal (r16): the
                # same-run engine/oracle ratio over the canary set
                "canary_eo_ratio": doc.get("canary_eo_ratio"),
                "engine_regression": doc.get("engine_regression"),
            }
        )
        queries = doc.get("queries") or {}
        if queries:
            run_sets.append(set(queries))
            # canary-clean subset (VERDICT r14 item 3): minima restricted
            # to runs whose own canary verdict read clean, so one
            # contended round can't move the headline composite — runs
            # without a canary verdict (older artifacts, no sf reference)
            # are conservatively excluded from the clean subset
            if doc.get("degraded_window") is False:
                clean_sets.append(set(queries))
                for name, sec in queries.items():
                    if name not in clean_best or sec < clean_best[name]:
                        clean_best[name] = sec
        for name, sec in queries.items():
            if name not in eng_best or sec < eng_best[name]:
                eng_best[name] = sec
    out = {
        "n_runs": len(runs),
        "engine_composite_sec": round(sum(eng_best.values()), 3) if eng_best else None,
        "n_queries_in_composite": len(eng_best),
        "per_run": runs,
    }
    # Like-for-like composite: when runs span a composite-set change
    # (r13: 74→82, r14: 82→83 queries), the union composite above sums
    # sets no single run timed — the round-over-round signal is the
    # minima over queries present in EVERY run with timings (r12/r13
    # verdicts recomputed exactly this by hand; now the artifact carries
    # it). Identical sets → common == union and the extra keys are
    # omitted.
    if run_sets:
        common = set.intersection(*run_sets)
        if common != set(eng_best):
            out["common_set_composite_sec"] = round(
                sum(eng_best[n] for n in common), 3
            )
            out["n_queries_common_set"] = len(common)
            out["queries_not_in_all_runs"] = sorted(set(eng_best) - common)
    # canary-clean subset composite, printed alongside the all-runs
    # minima (VERDICT r14 item 3): the round-over-round headline should
    # come from runs whose host window read clean
    out["n_clean_runs"] = len(clean_sets)
    if clean_best:
        out["clean_runs_composite_sec"] = round(sum(clean_best.values()), 3)
        out["n_queries_clean_composite"] = len(clean_best)
        clean_common = set.intersection(*clean_sets)
        if clean_common != set(clean_best):
            out["clean_common_set_composite_sec"] = round(
                sum(clean_best[n] for n in clean_common), 3
            )
    elif run_sets:
        # ZERO canary-clean runs (r16 adversarial review): previously the
        # clean composite silently vanished and the all-runs minima read
        # as the headline with no warning that every contributing window
        # was degraded — make that state explicit for BASELINE.md readers
        out["all_runs_degraded"] = True
    vals = [r["value"] for r in runs if r["value"] is not None]
    ratios = [r["raw_ratio"] for r in runs if r["raw_ratio"] is not None]
    if vals:
        out["engine_run_spread"] = [min(vals), max(vals)]
    if ratios:
        out["ratio_spread"] = [min(ratios), max(ratios)]
        out["best_ratio"] = min(ratios)
    # host-invariant signal spread (r16): engine/oracle over the canary
    # set per run — the cross-round regression detector that survives
    # host-baseline drift
    eo = [r["canary_eo_ratio"] for r in runs if r.get("canary_eo_ratio") is not None]
    if eo:
        out["canary_eo_ratio_spread"] = [min(eo), max(eo)]
        out["n_engine_regression_flags"] = sum(
            1 for r in runs if r.get("engine_regression")
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
