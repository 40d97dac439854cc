"""Skew-handling join helpers.

AQE's skew-join split (enabled in the scale profile, session.py) handles
most skew at runtime by splitting oversized partitions. ``salted_join``
is the explicit fallback for the pathological case AQE can't fix: a
single join KEY so hot that one task would own it even after splits —
the classic null-key / celebrity-entity / default-value hotspot at
100 TB.

Mechanics: the big side gets a uniform random salt in [0, salts); the
small side is replicated once per salt value (an explode, then usually a
broadcast). The join key becomes (key, salt), spreading the hot key over
``salts`` tasks. Row multiplicity is unchanged — results are exactly the
plain join's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
    broadcast_small: bool = True,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on``, salted ``salts`` ways.

    ``small`` is replicated ``salts``× (keep it dimension-sized); ``big``
    rows are salted uniformly at random — randomness only affects task
    placement, never results.

    Only big-side-preserving join types are valid: with the small side
    replicated per salt, a right/full outer join would emit every
    UNMATCHED small-side row once per salt value — ``salts`` phantom
    copies (r10 adversarial-review finding). Flip the sides (salt the
    other table) or use a plain join for those shapes.
    """
    # NOTE: "cross" is deliberately absent — salted_join always joins on
    # [on, SALT], and Spark treats how='cross' with an on-condition as a
    # conditioned (inner-semantics) join, so accepting it would only
    # mislead (ADVICE r10); a true cross join has no key to salt.
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: join type {how!r} is not big-side-preserving — "
            f"the replicated small side would duplicate unmatched rows "
            f"{salts}x. Salt the other side instead."
        )
    salted_big = big.withColumn(SALT, (F.rand() * salts).cast("int"))
    replicated = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    if broadcast_small:
        replicated = F.broadcast(replicated)
    return salted_big.join(replicated, on=[on, SALT], how=how).drop(SALT)


# Registry entry: the salted join as an oracle-checked operator (results
# must be exactly the plain join's — salting only moves work).
from pyspark.sql import SparkSession  # noqa: E402

from dbt_fal_spark.functions.numeric import dsum, o_dsum  # noqa: E402
from dbt_fal_spark.registry import query  # noqa: E402
from dbt_fal_spark.sources.readers import load_table  # noqa: E402


@query(
    "q_salted_join_supplier_volume",
    oracle=f"""
    SELECT s_name,
           count(*) AS n_items,
           {o_dsum('l_quantity')} AS total_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    tags=("join", "skew"),
)
def q_salted_join_supplier_volume(spark: SparkSession, sf_dir: str):
    """Hot-key-proof fact⋈dim join: lineitem joins supplier through
    ``salted_join`` (8 salts), then aggregates per supplier. The oracle is
    the PLAIN join — proving salting is result-invariant — while the plan
    spreads any pathological supplier key over 8 tasks. The random salt
    never reaches results: it only routes rows, and the aggregate's
    decimal sums are order-independent.
    """
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        salted_join(li, supp, on="s_suppkey", salts=8)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "total_qty"))
    )
