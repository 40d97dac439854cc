"""Round-7 regression locks (VERDICT r6 / ADVICE items): compact must
preserve every declared layout, maintenance CLI edge cases, requirement
spec normalization, JDBC '$' escaping, winnow bounded buckets."""

from __future__ import annotations

import os

import pytest

from dbt_fal_spark.api import FalSpark
from dbt_fal_spark.cli import main
from dbt_fal_spark.environments import _spec_name

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _proj(tmp_path, name, models):
    proj = tmp_path / name
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(f"name: {name}\n")
    for mname, sql in models.items():
        (proj / "models" / f"{mname}.sql").write_text(sql)
    return proj


def _describe(spark, ident):
    return {r["col_name"]: r["data_type"] for r in spark.sql(
        f"DESCRIBE TABLE EXTENDED {ident}").collect()}


# --- compact layout preservation (ADVICE medium, api.py compact) -------------


def test_compact_preserves_bucket_by(spark, tmp_path):
    """Compacting a bucketed model must keep the bucket spec — losing it
    silently voids the zero-shuffle-join contract the config declared."""
    proj = _proj(tmp_path, "bproj", {
        "bucketed": "{{ config(bucket_by={'cols': 'k', 'n': 4}) }}\n"
                    "SELECT id % 97 AS k, id AS payload FROM range(2000)",
    })
    fal = FalSpark(proj, spark=spark)
    assert fal.run(select=["bucketed"])["model.bproj.bucketed"] == "success"
    ident = fal._identifier("bucketed")
    before = _describe(spark, ident)
    assert before.get("Num Buckets") == "4"

    n = fal.compact("bucketed")
    assert n == 4  # bucket count, not defaultParallelism
    after = _describe(spark, ident)
    assert after.get("Num Buckets") == "4", "compact dropped the bucket spec"
    assert "k" in after.get("Bucket Columns", "")
    assert spark.table(ident).count() == 2000


def test_compact_preserves_partition_by(spark, tmp_path):
    """Compacting a hive-partitioned model must re-apply partitionBy —
    a flat rewrite voids partition pruning AND breaks insert_overwrite."""
    import glob as _glob

    proj = _proj(tmp_path, "pproj", {
        "parted": "{{ config(partition_by='grp') }}\n"
                  "SELECT id AS payload, id % 5 AS grp FROM range(1000)",
    })
    fal = FalSpark(proj, spark=spark)
    assert fal.run(select=["parted"])["model.pproj.parted"] == "success"
    ident = fal._identifier("parted")

    fal.compact("parted", target_partitions=2)
    desc = spark.sql(f"DESCRIBE TABLE {ident}").collect()
    names = [r["col_name"] for r in desc]
    assert "# Partition Information" in names, "compact flattened hive layout"
    location = _describe(spark, ident)["Location"].replace("file:", "")
    part_dirs = _glob.glob(location + "/grp=*")
    assert len(part_dirs) == 5, f"expected 5 partition dirs, got {part_dirs}"
    assert spark.table(ident).count() == 1000
    # pruning still works: a partition filter reads one directory
    plan = (
        spark.table(ident).filter("grp = 3")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "grp=3" in plan or "PartitionFilters" in plan


# --- maintenance CLI fallback (ADVICE low, cli.py) ---------------------------


def test_maintenance_views_only_project_is_noop(spark, tmp_path, capsys):
    proj = _proj(tmp_path, "vproj", {
        "v1": "{{ config(materialized='view') }}\nSELECT 1 AS one",
    })
    fal = FalSpark(proj, spark=spark)
    fal.run(select=["v1"])
    rc = main(["maintenance", "compact", "--project-dir", str(proj)])
    assert rc == 0  # no-op, not a raise on the unfiltered fallback


def test_maintenance_unknown_select_reports_distinctly(spark, tmp_path, capsys):
    proj = _proj(tmp_path, "uproj", {
        "t1": "SELECT 1 AS one",
    })
    FalSpark(proj, spark=spark).run(select=["t1"])
    rc = main(["maintenance", "compact", "--project-dir", str(proj),
               "--select", "no_such_model"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unknown model" in err and "no_such_model" in err
    assert "view" not in err  # NOT misreported as a view/ephemeral


# --- requirement spec normalization (ADVICE low, environments.py) ------------


@pytest.mark.parametrize("spec,name", [
    ("pandas[performance]==2.2", "pandas"),
    ('numpy==1.26; python_version<"3.12"', "numpy"),
    ("PyYAML>=6.0", "pyyaml"),
    ("requests [socks] >= 2.0 ; sys_platform == 'linux'", "requests"),
    ("plainname", "plainname"),
    ("./local/path", ""),
])
def test_spec_name_strips_extras_and_markers(spec, name):
    assert _spec_name(spec) == name


def test_declared_extra_spec_suppresses_replicated_pin():
    from dbt_fal_spark.environments import _merge_replicated, replicate_local_deps

    replicated_names = {_spec_name(p) for p in replicate_local_deps()}
    if "pandas" not in replicated_names:
        pytest.skip("pandas not in replicated set in this environment")
    merged = _merge_replicated(["pandas[performance]==2.2"])
    pandas_specs = [s for s in merged if _spec_name(s) == "pandas"]
    assert pandas_specs == ["pandas[performance]==2.2"], (
        "conflicting pandas pins handed to pip: %s" % pandas_specs
    )


# --- JDBC '$' escaping (ADVICE low, api.py) ----------------------------------


def test_expand_source_dollar_escape_and_nonstrict():
    # $$ escapes a literal dollar in both modes
    assert FalSpark._expand_source_path("pw$$123", strict=False) == "pw$123"
    assert FalSpark._expand_source_path("/tmp/a$$b") == "/tmp/a$b"
    # non-strict: a residual unexpanded var passes through (JDBC values)
    assert (
        FalSpark._expand_source_path("jdbc:pg://h/db?pw=a$XNOVARX9",
                                     strict=False)
        == "jdbc:pg://h/db?pw=a$XNOVARX9"
    )
    # strict paths still fail fast with the variable name
    with pytest.raises(ValueError, match="XNOVARX9"):
        FalSpark._expand_source_path("/data/$XNOVARX9/t.parquet")
    # real vars expand in both modes
    os.environ["R7_TEST_VAR"] = "xyz"
    try:
        assert FalSpark._expand_source_path("$R7_TEST_VAR/p") == "xyz/p"
        assert (
            FalSpark._expand_source_path("u$R7_TEST_VAR$$", strict=False)
            == "uxyz$"
        )
    finally:
        del os.environ["R7_TEST_VAR"]


# --- winnow bounded buckets (ADVICE low, dedup.py) ---------------------------


def test_winnow_count_gate_precedes_collect(spark):
    """The cap must be enforced by a count-only gate (a join in the
    plan), not by filtering an already-collected array — otherwise one
    degenerate fingerprint builds an unbounded buffer on one reducer."""
    from dbt_fal_spark.operators.dedup import d_winnow_neardup

    plan = (
        d_winnow_neardup(spark, SF_DIR)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" in plan, "count-gate join missing from winnow plan"
