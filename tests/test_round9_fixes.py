"""Round-9 regression locks (r8 ADVICE items): vacuum's flip-TOCTOU
keep-set, the rank persist=False partition pinning, selectors.yml
nested-composition distribution, upsert-target age GC, and the
live-pointer tmp-file leak."""

from __future__ import annotations

import os
import shutil
import time

from dbt_fal_spark.api import FalSpark
from dbt_fal_spark.materialize import (
    _live_pointer_path,
    _read_live_pointer,
    _table_location,
    _write_live_pointer,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _proj(tmp_path, name, models):
    proj = tmp_path / name
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(f"name: {name}\n")
    for mname, sql in models.items():
        (proj / "models" / f"{mname}.sql").write_text(sql)
    return proj


# --- ADVICE medium: vacuum TOCTOU — flip between catalog and mtime reads ---


def test_vacuum_keeps_post_flip_live_dir_from_pointer_content(spark, tmp_path):
    """Race shape: vacuum reads the catalog location (old live), a
    concurrent flip commits (new live dir, fresh pointer), THEN vacuum
    reads the pointer mtime. The new live dir's mtime predates the
    fresh pointer's, so the mtime guard alone won't protect it — the
    re-read of the pointer CONTENT must. Simulated deterministically:
    catalog still points at the old dir (stale read), pointer content
    names a new dir whose mtime we backdate below the pointer's."""
    spark.sql("DROP DATABASE IF EXISTS toctouproj CASCADE")
    proj = _proj(tmp_path, "toctouproj", {"t": "SELECT id AS k FROM range(25)"})
    fal = FalSpark(proj, spark=spark)
    fal.run(select=["t"])
    fal.compact("t", target_partitions=1)  # live = t__v*, grace = t
    ident = fal._identifier("t")
    live = _table_location(spark, ident)
    db_dir = os.path.dirname(live)
    base = os.path.join(db_dir, "t")

    # the "concurrent flip": new version dir with data, pointer -> it
    newlive = os.path.join(db_dir, "t__vfeedbeef")
    spark.range(25).selectExpr("id AS k").coalesce(1).write.parquet(newlive)
    _write_live_pointer(base, newlive)
    ptr_mtime = os.path.getmtime(_live_pointer_path(base))
    backdated = ptr_mtime - 10
    os.utime(newlive, (backdated, backdated))  # dir mtime < pointer mtime
    try:
        fal.vacuum("t")
        assert os.path.isdir(newlive), (
            "vacuum deleted the post-flip live dir the pointer names"
        )
        # catalog-side live dir is always kept too
        assert os.path.isdir(live)
    finally:
        shutil.rmtree(newlive, ignore_errors=True)
        _write_live_pointer(base, live)  # restore for later tests


# --- ADVICE low: _write_live_pointer must not leak mkstemp tmp files -------


def test_write_live_pointer_failure_leaves_no_tmp_litter(tmp_path):
    """If the rename fails after mkstemp succeeded (here: the pointer
    path is an existing DIRECTORY, so os.replace raises), the tmp file
    must be unlinked — repeated failures must not accumulate
    .__live_tmp_* litter in the database dir."""
    db = tmp_path / "db"
    db.mkdir()
    base = str(db / "t")
    os.makedirs(_live_pointer_path(base))  # forces os.replace to fail
    for _ in range(3):
        _write_live_pointer(base, "/anywhere")  # swallows the OSError
    litter = [f for f in os.listdir(db) if f.startswith(".__live_tmp_")]
    assert litter == [], litter


# --- ADVICE medium: rank persist=False pins the range partitioning ---------


def test_global_row_number_persist_false_is_exact(spark):
    """persist=False must still produce an exact 1..N permutation: the
    size pass and the rank job have to see identical range-partition
    boundaries (pinned via localCheckpoint), never two independently
    sampled repartitionByRange runs."""
    from dbt_fal_spark.functions.rank import global_row_number_with_total

    # non-trivial lineage: a shuffle upstream of the rank's range shuffle
    df = (
        spark.range(0, 5000)
        .selectExpr("id", "cast(id % 97 as int) AS g")
        .groupBy("g")
        .agg({"id": "max"})
        .selectExpr("g", "`max(id)` AS m")
    )
    ranked, n = global_row_number_with_total(
        df, ["m", "g"], out_col="i", persist=False
    )
    rows = ranked.select("i").collect()
    got = sorted(r["i"] for r in rows)
    assert n == 97
    assert got == list(range(1, 98)), "ranks are not an exact 1..N permutation"
    # repeated evaluation of the RETURNED frame must stay stable too —
    # the checkpoint pinned the boundaries, so no re-sample can shift ranks
    again = sorted(r["i"] for r in ranked.select("i").collect())
    assert again == got


# --- ADVICE low: selectors.yml nested composition ---------------------------


def test_selector_terms_distributes_union_inside_intersection():
    from dbt_fal_spark.cli import _selector_terms

    terms = _selector_terms({"intersection": [{"union": ["a", "b"]}, "c"]})
    assert terms == ["a,c", "b,c"]  # (a∪b)∩c — NOT a∩b∩c


def test_selector_terms_nested_intersection_inside_union():
    from dbt_fal_spark.cli import _selector_terms

    terms = _selector_terms(
        {"union": [{"intersection": ["a", "b"]}, "c"]}
    )
    assert terms == ["a,b", "c"]  # (a∩b)∪c


def test_selector_terms_intersection_of_intersections_flattens():
    from dbt_fal_spark.cli import _selector_terms

    terms = _selector_terms(
        {"intersection": [{"intersection": ["a", "b"]}, "c"]}
    )
    assert terms == ["a,b,c"]  # ',' composes associatively


# --- ADVICE low: dead-session upsert targets are reclaimed by age ----------


def test_upsert_stream_gc_reclaims_old_foreign_targets(spark):
    from urllib.parse import urlparse

    from dbt_fal_spark.registry import all_queries

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    os.makedirs(wh, exist_ok=True)
    old = os.path.join(wh, "st_upsert_stream_target_local-9999999999999_zz")
    fresh = os.path.join(wh, "st_upsert_stream_target_local-8888888888888_yy")
    for d in (old, fresh):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.parquet"), "wb") as f:
            f.write(b"foreign session's data")
    stale_t = time.time() - 25 * 3600
    os.utime(old, (stale_t, stale_t))  # > 24h: a dead session's leak
    try:
        df = all_queries()["st_upsert_stream"].fn(spark, SF_DIR)
        assert df.count() > 0
        assert not os.path.isdir(old), "dead session's target was not reclaimed"
        assert os.path.isdir(fresh), "age GC deleted a recent foreign target"
    finally:
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(fresh, ignore_errors=True)
