"""Scale-growth smoke for the dedup/LSH family (VERDICT r4 item 8).

The quadratic failure mode of pair-generation operators is invisible at
one scale point: a capped, bucketed plan and an all-pairs plan produce
the same answer at sf0.1. This tool measures pair counts and wall time
across FOUR corpus sizes — sf0.001 / sf0.01 / sf0.1 (real 10× steps)
plus a synthetic 10× built from sf0.1 (each document copied 10 times
with a distinct prefix token, each embedding jittered by a deterministic
per-copy epsilon) — and prints the growth ratio per 10× step.

The synthetic corpus is the worst case by construction: every document
becomes a 10-member near-dup cluster, so every LSH bucket fattens 10×.
An uncapped plan would grow candidate pairs ~100× per step; the
bucket/doc caps (LSH_BUCKET_CAP, SHINGLE_DOC_CAP) must hold growth to
~linear-in-corpus for the non-pair ops and ~linear-in-cluster-area for
the pair ops (every emitted pair here is a true near-dup, so output
scales with the real duplicate mass — that IS the answer, not blowup).

Usage: python tools/scale_smoke.py [--out /tmp/scale_smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_fal_spark.registry import all_queries
from dbt_fal_spark.session import get_spark

OPS = [
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "d_winnow_neardup",
    "d_containment_pairs",
    "d_simhash",
    "d_embedding_neardup_lsh",
    "d_embedding_neardup_pairs",
    "d_exact_dedup",
    # r13: the exact substring family — linear-by-construction (no cap);
    # the x10 prefix-copy corpus makes every doc body a duplicated span,
    # so output stays ~linear in docs while duplicate MASS explodes —
    # exactly the shape that breaks a quadratic formulation
    "d_substring_spans",
    "d_substring_dedup_clean",
    "d_substring_dedup_keep_first",
    # r13: the LM gate — linear stages + type-bounded model relations;
    # the x10 copy corpus multiplies every bigram count 10× while vocab
    # stays ~flat, so any formulation joining OCCURRENCES (instead of
    # per-doc TYPES) or materializing the model per doc shows super-
    # linear wall here
    "t_lm_surprise_fraction",
    # r15: the vocab-ranking pair (VERDICT r14 item 1) — the global
    # top-K must run as TakeOrderedAndProject (per-partition K-heaps),
    # so wall must track the token-count stage (~linear in corpus) and
    # never the vocabulary sort; on the x10 prefix-copy corpus the
    # vocabulary stays ~flat while token mass grows 10x, which is
    # exactly the regime where a single-task vocab sort would hide and
    # a linear count-then-prune shows linear wall
    "t_vocab_coverage",
    "t_cms_heavy_hitters",
    "s_knn_bruteforce",
    "s_knn_ivf",
    "s_knn_lsh_multitable",
    # d_lsh_levenshtein_refine is excluded from the default list: its
    # candidate set IS d_minhash_lsh_pairs' (already measured) and the
    # per-pair DP refine on 248k true-dup candidates runs ~4 min on the
    # saturated corpus — linear in candidates, just slow per unit.
]


def build_synth_10x(spark, src: str, dst: str) -> None:
    """10 perturbed copies of sf0.1: documents get a per-copy prefix
    token (shingle sets stay ~identical → worst-case bucket fattening),
    embeddings get a deterministic per-copy jitter (clusters stay tight)."""
    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = spark.range(10).withColumnRenamed("id", "copy")
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat(F.format_string("v%d", "copy"), F.lit(" "), F.col("text")).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "documents.parquet"))
    )
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * n_vec).alias("vec_id"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            F.expr("transform(embedding, x -> x + float(copy) * 0.0011)").alias("embedding"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "embeddings.parquet"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_smoke")
    ap.add_argument(
        "--ops", default=None,
        help="comma-separated subset of OPS to measure (default: all)",
    )
    args = ap.parse_args()
    ops = [o for o in (args.ops.split(",") if args.ops else OPS) if o]
    unknown = [o for o in ops if o not in OPS]
    if unknown:
        ap.error(f"not in the smoke's OPS list: {unknown}")
    spark = get_spark("scale-smoke")
    synth = os.path.join(args.out, "x10")
    build_synth_10x(spark, "/root/testdata/sf0.1", synth)

    sizes = [
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("x10(synthetic dup clusters)", synth),
    ]
    specs = all_queries()
    results: dict[str, list[tuple[str, int, float]]] = {}
    for op in ops:
        fn = specs[op].fn
        rows_at = []
        for label, d in sizes:
            t0 = time.time()
            n = fn(spark, d).count()
            dt = time.time() - t0
            spark.catalog.clearCache()
            rows_at.append((label, n, round(dt, 2)))
        results[op] = rows_at

    print(f"{'operator':28s} " + "  ".join(f"{lbl.split('(')[0]:>12s}" for lbl, _ in sizes) + "   growth/10x")
    for op, rows_at in results.items():
        counts = [n for _, n, _ in rows_at]
        ratios = [
            (counts[i + 1] / counts[i]) if counts[i] else float("nan")
            for i in range(len(counts) - 1)
        ]
        print(
            f"{op:28s} "
            + "  ".join(f"{n:>8d}/{dt:>4.1f}s" for _, n, dt in rows_at)
            + "   "
            + " → ".join(f"{r:.1f}x" for r in ratios)
        )
    print(json.dumps({op: [[lbl, n, dt] for lbl, n, dt in rows] for op, rows in results.items()}))


if __name__ == "__main__":
    main()
