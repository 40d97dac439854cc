"""Wall-time + state-size evidence for the streaming (st_*) family.

VERDICT r16 item 6: the streaming operators had only code-level audits —
"watermark-bounded state, nothing to optimize" was asserted, never
measured. This micro-bench drains every registered st_* entry (each
entry's function builds the stream AND drains it synchronously via
run_stream_to_completion's availableNow memory sink) with the composite
bench's timing discipline (min-of-N back-to-back walls, System.gc +
clearCache between runs) and captures per-query state-store metrics from
a StreamingQueryListener (numRowsTotal across stateful operators —
the quantity the watermark bounds at scale).

Usage: python tools/streaming_bench.py [--sf DIR ...] [--runs N]
Prints one JSON line per scale factor and a combined artifact to stdout;
the runner (r17) redirects into STREAM_BENCH_r17.json via --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from dbt_fal_spark.registry import all_queries  # noqa: E402
from dbt_fal_spark.session import get_spark  # noqa: E402


class _StateListener(StreamingQueryListener):
    """Collects per-query state-operator totals; the listener bus is
    async, so readers settle-wait after each drain."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.by_query: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batches": 1,
            "num_input_rows": int(p.numInputRows or 0),
            "state_rows_total": sum(
                int(s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
            "state_rows_updated": sum(
                int(s.numRowsUpdated or 0) for s in (p.stateOperators or [])
            ),
            "state_memory_bytes": sum(
                int(s.memoryUsedBytes or 0) for s in (p.stateOperators or [])
            ),
            "n_state_operators": len(p.stateOperators or []),
        }
        with self.lock:
            old = self.by_query.get(str(p.id))
            if old:  # accumulate batches; state totals = last reading
                rec["batches"] += old["batches"]
                rec["num_input_rows"] += old["num_input_rows"]
                rec["state_rows_updated"] += old["state_rows_updated"]
            self.by_query[str(p.id)] = rec

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def drain_window(self, before: set[str]) -> dict:
        """Merge records for queries that appeared since `before` (one
        entry's fn() may drain several streams, e.g. upsert)."""
        with self.lock:
            new = {k: v for k, v in self.by_query.items() if k not in before}
        if not new:
            return {}
        out: dict = {
            "streams": len(new),
            "batches": sum(v["batches"] for v in new.values()),
            "num_input_rows": sum(v["num_input_rows"] for v in new.values()),
            "state_rows_total": sum(v["state_rows_total"] for v in new.values()),
            "state_rows_updated": sum(
                v["state_rows_updated"] for v in new.values()
            ),
            "state_memory_bytes": sum(
                v["state_memory_bytes"] for v in new.values()
            ),
            "n_state_operators": sum(
                v["n_state_operators"] for v in new.values()
            ),
        }
        return out

    def seen(self) -> set[str]:
        with self.lock:
            return set(self.by_query)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        nargs="*",
        default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--state-provider",
        choices=["default", "rocksdb"],
        default="default",
        help="state store provider (rocksdb = the scale-profile choice)",
    )
    args = ap.parse_args()

    spark = get_spark("streaming_bench")
    if args.state_provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    listener = _StateListener()
    spark.streams.addListener(listener)
    jvm_gc = spark.sparkContext._jvm.System.gc
    specs = all_queries()
    names = sorted(n for n in specs if n.startswith("st_"))
    artifact: dict = {
        "runs": args.runs,
        "state_provider": args.state_provider,
        "entries": {},
    }

    for sf_dir in args.sf:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        # warm pass: codegen + state-store provider init outside timings
        for name in names:
            specs[name].fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        for name in names:
            spark.sparkContext.setJobDescription(f"st_bench {name} sf{sf}")
            best, state = None, {}
            for _ in range(max(1, args.runs)):
                jvm_gc()
                before = listener.seen()
                t0 = time.time()
                n_rows = specs[name].fn(spark, sf_dir).count()
                dt = time.time() - t0
                if best is None or dt < best:
                    best = dt
                spark.catalog.clearCache()
                time.sleep(0.3)  # listener bus settle
                state = listener.drain_window(before) or state
            rec = {"wall_sec": round(best, 3), "out_rows": int(n_rows), **state}
            artifact["entries"].setdefault(name, {})[sf] = rec
            print(json.dumps({"entry": name, "sf": sf, **rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "streaming_bench_done", "n": len(names)}))


if __name__ == "__main__":
    main()
