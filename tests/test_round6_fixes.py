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


def test_driver_window_names_resolve():
    """Every name in __spark_entry__._CHECK_FIRST must exist in the
    registry — a typo would silently fall out of the driver's 50-entry
    correctness window and the stale row would go unrefreshed."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from dbt_fal_spark.registry import all_queries

    names = set(all_queries())
    missing = [n for n in mod._CHECK_FIRST if n not in names]
    assert not missing, f"window names not in registry: {missing}"
    # window must fill the driver's 50-entry record exactly
    assert len(mod._CHECK_FIRST) == 50
    assert len(set(mod._CHECK_FIRST)) == 50
