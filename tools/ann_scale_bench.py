"""ANN paired bench at work-dominated scale (VERDICT r6 item 3).

The per-round bench fixture (sf0.1 = 2,000 vectors) is so small that the
~0.2 s-per-job Spark dispatch floor dominates every ANN query, making
the engine/oracle ratio a constant-overhead artifact (9-16x raw) rather
than a statement about the plans. This tool builds a 125x synthetic
corpus (250,000 x 64-dim vectors: sf0.1 embeddings replicated with a
deterministic per-copy jitter, query set unchanged) and runs each ANN
operator and its DuckDB oracle back-to-back on it, where per-query work
dominates the floor. PLANS.md records the resulting table; the r6 floor
model predicts the ratio lands well under the 2x bound at this size.

Usage: python tools/ann_scale_bench.py [--copies 125] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from dbt_fal_spark.registry import all_queries
from dbt_fal_spark.session import get_spark

OPS = ["s_knn_lsh_bucketed", "s_knn_ivf", "s_knn_int8", "s_knn_bruteforce"]


def build_fixture(spark, src: str, dst: str, copies: int) -> int:
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    cp = spark.range(copies).withColumnRenamed("id", "copy")
    os.makedirs(dst, exist_ok=True)
    (
        emb.crossJoin(cp)
        .select(
            (F.col("vec_id") + F.col("copy") * n_vec).alias("vec_id"),
            # per-copy jitter keeps copies distinct but the geometry
            # realistic; copy 0 is bit-identical so the query set
            # (vec_id < N_QUERIES) is unchanged
            F.expr(
                "transform(embedding, (x, i) -> x + float(copy) * 0.0017 * float(1 + i % 7))"
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "embeddings.parquet"))
    )
    return n_vec * copies


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=125)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ann_scale")
    args = ap.parse_args()
    spark = get_spark("ann-scale-bench")
    n_total = build_fixture(spark, "/root/testdata/sf0.1", args.out, args.copies)
    print(f"fixture: {n_total} vectors x 64 dims at {args.out}", file=sys.stderr)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{args.out}/embeddings.parquet/*.parquet'"
    )
    specs = all_queries()
    results = {}
    for op in OPS:
        spec = specs[op]
        eng_best = ora_best = float("inf")
        rows = orows = None
        for _ in range(args.rounds):
            t0 = time.time()
            rows = spec.fn(spark, args.out).count()
            eng = time.time() - t0
            spark.catalog.clearCache()
            t0 = time.time()
            orows = len(con.execute(spec.oracle).fetchall())
            ora = time.time() - t0
            eng_best, ora_best = min(eng_best, eng), min(ora_best, ora)
        results[op] = {
            "engine_sec": round(eng_best, 3),
            "oracle_sec": round(ora_best, 3),
            "ratio": round(eng_best / ora_best, 3) if ora_best else None,
            "rows": rows,
            "oracle_rows": orows,
        }
        print(
            f"{op:22s} engine {eng_best:7.2f}s  oracle {ora_best:7.2f}s  "
            f"ratio {eng_best / ora_best:5.2f}x  rows {rows}/{orows}",
            file=sys.stderr,
        )
    print(json.dumps({"n_vectors": n_total, "copies": args.copies, "ops": results}))


if __name__ == "__main__":
    main()
