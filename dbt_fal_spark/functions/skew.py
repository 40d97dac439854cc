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
    """
    salted_big = big.withColumn(SALT, (F.rand() * salts).cast("int"))
    replicated = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    if broadcast_small:
        replicated = F.broadcast(replicated)
    return salted_big.join(replicated, on=[on, SALT], how=how).drop(SALT)
