"""Round-6 regression locks: scan-cache restore semantics and the
null-element embedding contract (advisor findings, VERDICT r5)."""

from __future__ import annotations

import os

from dbt_fal_spark.sources import readers


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_load_table_fresh_restores_cache(spark):
    """load_table_fresh must not evict the shared cached scan: the advisor
    found the old pop-before-and-after left the key empty, so every later
    load_table paid the ~80 ms footer re-read for the session's remainder."""
    key = (spark.sparkContext.applicationId, os.path.abspath(SF_DIR), "nation")
    readers._SCAN_CACHE.pop(key, None)

    cached = readers.load_table(spark, SF_DIR, "nation")
    assert readers._SCAN_CACHE[key] is cached

    fresh = readers.load_table_fresh(spark, SF_DIR, "nation")
    # fresh scan has its own lineage (self-join right side)...
    assert fresh is not cached
    # ...and the shared entry survives for every other caller
    assert readers._SCAN_CACHE[key] is cached
    assert readers.load_table(spark, SF_DIR, "nation") is cached


def test_load_table_fresh_never_caches_itself(spark):
    """With no prior entry, the fresh scan must NOT be left in the cache —
    a later load_table returning the self-join's right-side DF would
    re-create the ambiguous-lineage problem load_table_fresh exists for."""
    key = (spark.sparkContext.applicationId, os.path.abspath(SF_DIR), "region")
    readers._SCAN_CACHE.pop(key, None)

    fresh = readers.load_table_fresh(spark, SF_DIR, "region")
    assert key not in readers._SCAN_CACHE
    later = readers.load_table(spark, SF_DIR, "region")
    assert later is not fresh
