"""Dump .explain(formatted) for the r17-touched entries under BOTH
session profiles (latency = the bench shape, scale = the 100 TB shape)
into plans/r17/<name>_{before|after}[_scale].txt.

Usage: python tools/dump_plans_r17.py before|after [name,...]
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_fal_spark.registry import all_queries
from dbt_fal_spark.session import get_spark

DEFAULT = [
    "d_ngram_jaccard_pairs",
    "d_containment_pairs",
    "d_lsh_levenshtein_refine",
    "e_dau_hll_sketch",
    "e_retention_cohorts",
    "d_minhash_lsh_pairs",  # spread()-probe representative
    "t_tfidf_top_terms",  # text.py width-probe twin
]

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump_plans_r17", sf_dir=SF)
    specs = all_queries()
    # latency profile (what the bench runs) — the session default at sf0.1
    for name in names:
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_text(specs[name].fn(spark, SF)))
    # scale profile: flip the runtime markers the operators key on
    # (pre-r17 code keys on spark.sql.adaptive.enabled; r17 code keys on
    # spark.dbt_fal.profile — set both so the same dumper covers both HEADs)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.dbt_fal.profile", "scale")
    for name in names:
        with open(os.path.join(OUT, f"{name}_{tag}_scale.txt"), "w") as f:
            f.write(plan_text(specs[name].fn(spark, SF)))
        spark.catalog.clearCache()
    print(f"wrote {2 * len(names)} plans to {OUT} ({tag})")


if __name__ == "__main__":
    main()
