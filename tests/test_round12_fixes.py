"""Round-12 hardening regressions:

- accepted_values NULL semantics + severity:warn + store_failures
  (VERDICT r11 'What's wrong' 1 / 'Next round' 1 — dbt-core test
  configs the reference inherits via delegation)
- alias-aware Python models and --defer (ADVICE r11 medium + low)
- write_to_model positional-target guard (ADVICE r11)
- $DBT_PROFILES_DIR error-message origin (ADVICE r11)
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from dbt_fal_spark.project.loader import load_profile, load_project

FIXTURE = Path(__file__).parent / "fixtures" / "jaffle_spark"


def _copy_project(tmp_path: Path) -> Path:
    proj = tmp_path / "proj"
    shutil.copytree(FIXTURE, proj)
    return proj


# ---------------------------------------------------------------------------
# dbt test configs: accepted_values NULLs, severity: warn, store_failures
# ---------------------------------------------------------------------------


def _one_model_project(tmp_path: Path, schema_tests: str, model_sql: str) -> Path:
    """Minimal project: one model `probe` + the given schema.yml tests."""
    proj = tmp_path / "tproj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(
        "name: tproj\nprofile: tproj\nmodel-paths: [models]\n"
    )
    (proj / "models" / "probe.sql").write_text(model_sql)
    (proj / "models" / "schema.yml").write_text(
        "models:\n  - name: probe\n    columns:\n" + schema_tests
    )
    return proj


def test_accepted_values_null_rows_pass(tmp_path, spark):
    """dbt compiles accepted_values to `WHERE col NOT IN (...)`: a NULL
    row evaluates to NULL and is NOT a violation — NULL-checking is
    not_null's job. Previously NULLs failed accepted_values here
    (VERDICT r11 finding 1)."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n"
        "        tests:\n"
        "          - accepted_values: {values: ['A', 'B']}\n"
        "          - not_null\n",
        "select * from values ('A'), ('B'), (cast(null as string)) t(status)\n",
    )
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    by_name = {r["test"]: r for r in fal.test()}
    av = by_name["accepted_values_probe_status"]
    nn = by_name["not_null_probe_status"]
    # legal NULL passes accepted_values (dbt semantics) ...
    assert av["status"] == "tested" and av["violations"] == 0
    # ... and is still caught by not_null, its actual owner
    assert nn["status"] == "error" and nn["violations"] == 1
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")


def test_severity_warn_reports_without_failing(tmp_path, spark):
    """`config: {severity: warn}` (nested or inline) reports violations
    with status 'warn'; the CLI exit code treats warn as non-failing."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n"
        "        tests:\n"
        "          - accepted_values:\n"
        "              values: ['A']\n"
        "              config: {severity: warn}\n"
        "      - name: v\n"
        "        tests:\n"
        "          - not_null:\n"
        "              severity: warn\n",  # inline spelling
        "select * from values ('A', 1), ('B', cast(null as int)) t(status, v)\n",
    )
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    results = fal.test()
    by_name = {r["test"]: r for r in results}
    av = by_name["accepted_values_probe_status"]
    nn = by_name["not_null_probe_v"]
    assert av["status"] == "warn" and av["violations"] == 1
    assert av["severity"] == "warn"
    assert nn["status"] == "warn" and nn["violations"] == 1
    # CLI semantics: warn-only outcomes exit 0
    assert all(r["status"] in ("tested", "warn") for r in results)
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")


def test_store_failures_materializes_audit_table(tmp_path, spark):
    """`config: {store_failures: true}` writes the failing rows to
    <schema>_dbt_test__audit.<test_name> (dbt convention), overwritten
    per run."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n"
        "        tests:\n"
        "          - accepted_values:\n"
        "              values: ['A']\n"
        "              config: {severity: warn, store_failures: true}\n",
        "select * from values ('A'), ('B'), ('C') t(status)\n",
    )
    for db in ("tproj", "tproj_dbt_test__audit"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    results = {r["test"]: r for r in fal.test()}
    assert results["accepted_values_probe_status"]["violations"] == 2
    audit = spark.table("tproj_dbt_test__audit.accepted_values_probe_status")
    assert {r["status"] for r in audit.collect()} == {"B", "C"}
    # re-run overwrites rather than appending
    fal.test()
    assert spark.table("tproj_dbt_test__audit.accepted_values_probe_status").count() == 2
    for db in ("tproj", "tproj_dbt_test__audit"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_singular_test_config_severity_warn(tmp_path, spark):
    """Singular tests configure via {{ config(severity='warn') }} in the
    SQL body (dbt-core semantics)."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n",
        "select * from values ('A') t(status)\n",
    )
    (proj / "tests").mkdir()
    (proj / "tests" / "always_fails.sql").write_text(
        "{{ config(severity='warn') }}\n"
        "select * from {{ ref('probe') }} where status = 'A'\n"
    )
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    by_name = {r["test"]: r for r in fal.test()}
    sg = by_name["always_fails"]
    assert sg["status"] == "warn" and sg["violations"] == 1
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")


# ---------------------------------------------------------------------------
# alias-aware Python models (ADVICE r11 medium)
# ---------------------------------------------------------------------------


def test_python_model_alias_config(tmp_path, spark):
    """A dbt-style Python model with config.alias materializes under the
    ALIAS (like SQL models); downstream ref() by model name resolves to
    the aliased relation. Previously the python path wrote schema.name
    while refs read schema.alias (ADVICE r11 medium)."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    (proj / "models" / "py_aliased.py").write_text(
        "def model(dbt, session):\n"
        "    df = dbt.ref('stg_orders')\n"
        "    return df.groupBy('status').count()\n"
    )
    (proj / "models" / "py_script_aliased.py").write_text(
        "df = ref('stg_orders').limit(5)\n"
        "write_to_model(df)\n"
    )
    schema_yml = proj / "models" / "schema.yml"
    schema_yml.write_text(
        schema_yml.read_text()
        + "  - name: py_aliased\n"
        + "    config: {alias: py_alias_target}\n"
        + "  - name: py_script_aliased\n"
        + "    config: {alias: py_script_target}\n"
        + "  - name: py_downstream\n"
    )
    (proj / "models" / "py_downstream.sql").write_text(
        "select count(*) as n from {{ ref('py_aliased') }}\n"
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(threads=2)
    assert statuses["model.jaffle_spark.py_aliased"] == "success"
    assert statuses["model.jaffle_spark.py_script_aliased"] == "success"
    assert statuses["model.jaffle_spark.py_downstream"] == "success"
    # physical relations carry the alias; model names are not tables
    assert spark.catalog.tableExists("jaffle_spark.py_alias_target")
    assert not spark.catalog.tableExists("jaffle_spark.py_aliased")
    assert spark.catalog.tableExists("jaffle_spark.py_script_target")
    assert not spark.catalog.tableExists("jaffle_spark.py_script_aliased")
    # downstream ref by MODEL name reads through the alias
    assert fal.ref("py_downstream").collect()[0]["n"] > 0
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_write_to_model_positional_target_raises(tmp_path, spark):
    """Inside a fal-style python model, write_to_model is bound to THAT
    model: an explicit positional target must fail loudly (the reference
    hard-wires target_1 via functools.partial → TypeError), not be
    silently ignored (ADVICE r11)."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    (proj / "models" / "py_bad_target.py").write_text(
        "df = ref('stg_orders').limit(3)\n"
        "write_to_model(df, 'some_other_model')\n"
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(select="py_bad_target")
    assert statuses["model.jaffle_spark.py_bad_target"] == "error"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


# ---------------------------------------------------------------------------
# --defer resolves aliased upstreams via target_name (ADVICE r11)
# ---------------------------------------------------------------------------


def test_defer_resolves_aliased_upstream(tmp_path, spark):
    """--defer against a state env whose upstream has an alias: the
    deferred lookup must use the ALIAS path in the state warehouse —
    the model-name path does not exist there."""
    from dbt_fal_spark.api import FalSpark

    proj = tmp_path / "aproj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(
        "name: aliasci\nprofile: aliasci\nmodel-paths: [models]\n"
    )
    # upstream gets an alias; downstream refs it by MODEL name
    (proj / "models" / "aliased_up.sql").write_text(
        "{{ config(materialized='table', alias='up_alias') }}\n"
        "select 42 as answer\n"
    )
    for s in ("alias_prod", "alias_dev"):
        spark.sql(f"DROP DATABASE IF EXISTS {s} CASCADE")
    # 1. prod run builds the aliased upstream
    prod = FalSpark(proj, spark=spark, schema="alias_prod")
    assert all(s == "success" for s in prod.run().values())
    state_dir = tmp_path / "prod_state"
    shutil.copytree(proj / "target", state_dir)
    # 2. dev adds a downstream; defer-run ONLY it — the ref must resolve
    #    against the state env's ALIAS relation (alias_prod.up_alias);
    #    alias_prod.aliased_up does not exist
    (proj / "models" / "down_of_alias.sql").write_text(
        "select answer from {{ ref('aliased_up') }}\n"
    )
    dev = FalSpark(
        proj, spark=spark, schema="alias_dev", state_path=state_dir, defer=True
    )
    statuses = dev.run(select=["down_of_alias"])
    assert statuses == {"model.aliasci.down_of_alias": "success"}, statuses
    assert dev.ref("down_of_alias").collect()[0]["answer"] == 42
    for s in ("alias_prod", "alias_dev"):
        spark.sql(f"DROP DATABASE IF EXISTS {s} CASCADE")


# ---------------------------------------------------------------------------
# profiles-dir error message names its origin (ADVICE r11)
# ---------------------------------------------------------------------------


def test_profiles_dir_error_names_env_var_origin(tmp_path, monkeypatch):
    """A missing profiles.yml reached via $DBT_PROFILES_DIR must blame
    the env var, not a --profiles-dir flag the user never passed."""
    proj = _copy_project(tmp_path)
    empty = tmp_path / "empty_profiles"
    empty.mkdir()
    monkeypatch.setenv("DBT_PROFILES_DIR", str(empty))
    with pytest.raises(ValueError, match=r"\$DBT_PROFILES_DIR"):
        load_profile(proj)
    monkeypatch.delenv("DBT_PROFILES_DIR")
    with pytest.raises(ValueError, match=r"--profiles-dir"):
        load_profile(proj, profiles_dir=empty)


# ---------------------------------------------------------------------------
# dbt sources.json freshness-artifact ingestion (VERDICT r11 item 6)
# ---------------------------------------------------------------------------


def test_source_freshness_ingests_dbt_artifact(tmp_path, spark):
    """A target/sources.json from a prior dbt run is ingested: its rows
    are attached to DbtSource.freshness_result and returned as-is
    (reference parse.py:161-173 + project.py:415-421). recompute=True —
    and sources absent from the artifact — fall back to live compute."""
    import json
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    uid = "source.jaffle_spark.testdata.events"
    canned = {
        "metadata": {"dbt_schema_version": "https://schemas.getdbt.com/dbt/sources/v3.json"},
        "results": [
            {
                "unique_id": uid,
                "max_loaded_at": "2026-08-14 12:00:00",
                "snapshotted_at": "2026-08-15 00:00:00",
                "max_loaded_at_time_ago_in_s": 43200.0,
                "status": "warn",
                "criteria": {"warn_after": {"count": 1, "period": "hour"}},
            }
        ],
    }
    (proj / "target" / "sources.json").write_text(json.dumps(canned))
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    res = fal.source_freshness()
    assert len(res) == 1
    r = res[0]
    # artifact row wins: status/ages come from the canned file, not a scan
    assert r["from_artifact"] is True
    assert r["status"] == "warn" and r["age_sec"] == 43200.0
    src = next(s for s in fal.manifest.sources.values() if s.unique_id == uid)
    assert src.freshness_result["status"] == "warn"
    # recompute=True ignores the artifact: events data is from 2024 →
    # live compute says error (see test_source_freshness_statuses)
    live = fal.source_freshness(recompute=True)
    assert live[0]["status"] == "error" and "from_artifact" not in live[0]
    # a corrupt artifact degrades gracefully to live compute
    (proj / "target" / "sources.json").write_text("{not json")
    res2 = fal.source_freshness()
    assert res2[0]["status"] == "error"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_write_sources_artifact_round_trips(tmp_path, spark):
    """_write_sources_artifact (the CLI `source freshness` sink) writes
    dbt's artifact shape, and a fresh FalSpark on the same project
    ingests what was written."""
    import json
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    live = fal.source_freshness()  # no artifact yet → live compute
    assert live[0]["status"] == "error"
    fal._write_sources_artifact()
    doc = json.loads((proj / "target" / "sources.json").read_text())
    assert doc["metadata"]["dbt_schema_version"].endswith("sources/v3.json")
    assert doc["results"][0]["status"] == "error"
    # second load reads the artifact instead of recomputing
    fal2 = FalSpark(proj, spark=spark)
    res = fal2.source_freshness()
    assert res[0]["from_artifact"] is True and res[0]["status"] == "error"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


# ---------------------------------------------------------------------------
# D10 cloud-execution interface stub (VERDICT r11 item 7)
# ---------------------------------------------------------------------------


def test_cloud_environment_parses_but_refuses_to_run(tmp_path):
    """A fal_project.yml declaring the reference's cloud environment
    shape (type: remote / host / machine_type — adapter.py:68-149)
    LOADS, so migrating projects don't crash at parse; executing in it
    raises the documented out-of-scope error."""
    from dbt_fal_spark.environments import CloudEnvironment, load_environments

    (tmp_path / "fal_project.yml").write_text(
        "environments:\n"
        "  - name: gpu_box\n"
        "    type: remote\n"
        "    host: cloud.example\n"
        "    machine_type: GPU\n"
        "  - name: local_venv\n"
        "    type: venv\n"
        "    requirements: []\n"
    )
    envs = load_environments(tmp_path)
    assert set(envs) == {"gpu_box", "local_venv"}
    cloud = envs["gpu_box"]
    assert isinstance(cloud, CloudEnvironment)
    for call in (
        lambda: cloud.ensure(),
        lambda: cloud.run_script(Path("x.py"), {}),
        lambda: cloud.run_python_model(Path("m.py"), {}),
    ):
        with pytest.raises(NotImplementedError, match=r"out of scope.*Spark cluster"):
            call()


def test_cli_cloud_verb_exits_with_documented_error(tmp_path, capsys):
    """`fal cloud` exists as a verb (D10 interface shape) and exits 1
    with the documented out-of-scope message — without starting Spark."""
    from dbt_fal_spark.cli import main

    proj = _copy_project(tmp_path)
    rc = main(["cloud", "--project-dir", str(proj)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "out of scope" in err and "Spark cluster" in err


def test_run_results_statuses_attach_at_load(tmp_path, spark):
    """A prior run's target/run_results.json pre-populates model.status
    at load (reference project.py:406-411) — a fresh FalSpark on an
    already-run project reports the previous outcomes instead of
    'pending'."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(select="stg_orders")
    assert statuses["model.jaffle_spark.stg_orders"] == "success"
    fal2 = FalSpark(proj, spark=spark)
    m = fal2.manifest.models["model.jaffle_spark.stg_orders"]
    assert m.status == "success"
    # models absent from the artifact stay pending
    assert fal2.manifest.models["model.jaffle_spark.customers"].status in (
        "pending",
        "skipped",
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_cli_version_flag(capsys):
    """`--version` (reference args.py:28-34 parity — the one CLI delta
    VERDICT r11 noted)."""
    from dbt_fal_spark import __version__
    from dbt_fal_spark.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_where_limit_and_threshold_configs(tmp_path, spark):
    """dbt test configs `where` (filters the tested relation), `limit`
    (caps the failure SELECT) and `warn_if`/`error_if` (threshold
    expressions over the failure count)."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n"
        "        tests:\n"
        "          - accepted_values:\n"
        "              values: ['A']\n"
        "              config: {where: \"grp = 'keep'\"}\n"
        "      - name: v\n"
        "        tests:\n"
        "          - not_null:\n"
        "              config: {error_if: '>2', warn_if: '>0'}\n"
        "      - name: grp\n"
        "        tests:\n"
        "          - accepted_values:\n"
        "              values: ['keep']\n"
        "              config: {severity: warn, store_failures: true, limit: 1}\n",
        "select * from values\n"
        "  ('A', cast(null as int), 'keep'),\n"
        "  ('B', 1, 'drop'),\n"
        "  ('B', cast(null as int), 'drop'),\n"
        "  ('C', 2, 'drop')\n"
        "t(status, v, grp)\n",
    )
    for db in ("tproj", "tproj_dbt_test__audit"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    by_name = {r["test"]: r for r in fal.test()}
    # where: only grp='keep' rows are tested → the 'B'/'C' rows are out
    av = by_name["accepted_values_probe_status"]
    assert av["status"] == "tested" and av["violations"] == 0
    # warn_if '>0' + error_if '>2': 2 NULLs → warn tier, not error
    nn = by_name["not_null_probe_v"]
    assert nn["status"] == "warn" and nn["violations"] == 2
    # limit 1: count and stored rows capped at 1 (3 rows actually fail)
    lg = by_name["accepted_values_probe_grp"]
    assert lg["violations"] == 1
    assert spark.table("tproj_dbt_test__audit.accepted_values_probe_grp").count() == 1
    for db in ("tproj", "tproj_dbt_test__audit"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_threshold_expression_parser():
    """_test_threshold: the dbt warn_if/error_if grammar (op + int) —
    and a clear error on anything else (no eval path)."""
    import pytest as _pytest

    from dbt_fal_spark.api import _test_threshold

    assert _test_threshold(1, "!=0") and not _test_threshold(0, "!=0")
    assert _test_threshold(11, ">10") and not _test_threshold(10, "> 10")
    assert _test_threshold(5, ">=5") and _test_threshold(0, "=0")
    assert _test_threshold(3, "<=3") and _test_threshold(2, "< 3")
    with _pytest.raises(ValueError, match="threshold"):
        _test_threshold(1, "import os")


def test_cloud_credentials_wrap_all_environments(tmp_path, spark):
    """Reference semantics (utils/environments.py:157-166): key_id +
    key_secret on the profile route EVERY environment to the serverless
    host. Here that wraps them in the D10 stub — execution fails loudly
    with the out-of-scope error instead of silently running locally."""
    import os

    from dbt_fal_spark.api import FalSpark
    from dbt_fal_spark.environments import CloudEnvironment
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    (proj / "fal_project.yml").write_text(
        "environments:\n"
        "  - name: funny\n"
        "    type: venv\n"
        "    requirements: []\n"
    )
    (proj / "profiles.yml").write_text(
        "jaffle_spark:\n"
        "  target: cloud\n"
        "  outputs:\n"
        "    cloud:\n"
        "      type: fal\n"
        "      host: cloud.example\n"
        "      key_id: kid\n"
        "      key_secret: sekrit\n"
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    assert isinstance(fal.environments["funny"], CloudEnvironment)
    with pytest.raises(NotImplementedError, match="out of scope"):
        fal.environments["funny"].ensure()
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_cli_source_freshness_always_recomputes(tmp_path, spark, capsys):
    """The freshness COMMAND recomputes even when an artifact exists —
    it is the thing that PRODUCES sources.json; ingesting its own output
    would freeze freshness after the first run (r12 review finding)."""
    import json
    import os

    from dbt_fal_spark.cli import main
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    # canned artifact claims 'pass' — live data (2024 events) says error
    canned = {
        "metadata": {},
        "results": [
            {
                "unique_id": "source.jaffle_spark.testdata.events",
                "max_loaded_at": "2026-08-15 00:00:00",
                "max_loaded_at_time_ago_in_s": 60.0,
                "status": "pass",
            }
        ],
    }
    (proj / "target" / "sources.json").write_text(json.dumps(canned))
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    rc = main(["source", "freshness", "--project-dir", str(proj)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "error" in out and "(artifact)" not in out
    # and the command rewrote the artifact with the LIVE result
    doc = json.loads((proj / "target" / "sources.json").read_text())
    assert doc["results"][0]["status"] == "error"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_node_status_derives_tested_after_test_run(tmp_path, spark):
    """Reference semantics (project.py:180-188, dbt_test.feature): a
    node that didn't run this invocation but whose attached tests DID
    run reports status 'tested' — scripts running after `dbt test` see
    'tested', not 'pending'/'skipped'. A node that RAN keeps its run
    status."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path,
        "      - name: status\n"
        "        tests:\n"
        "          - not_null\n",
        "select 'A' as status\n",
    )
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")
    build = FalSpark(proj, spark=spark)
    build.run()
    # fresh load: model not run THIS session (pending), tests not run
    fal = FalSpark(proj, spark=spark)
    # wipe artifact-derived status to simulate a test-only invocation
    model = next(iter(fal.manifest.models.values()))
    model.status = "pending"
    assert model.status == "pending"
    fal.test()
    assert model.status == "tested"
    # a model that ran keeps its run status even with tested tests
    model.status = "success"
    assert model.status == "success"
    spark.sql("DROP DATABASE IF EXISTS tproj CASCADE")


def test_cli_debug_verb(tmp_path, spark, capsys):
    """`debug` verb (reference commands.feature 'Run dbt debug'):
    project + profile + connectivity summary, exit 0 when healthy."""
    import os

    from dbt_fal_spark.cli import main
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    rc = main(["debug", "--project-dir", str(proj)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "connection test: OK" in out
    assert "models:" in out and "schema:" in out


def test_source_freshness_reference_contract(tmp_path, spark):
    """The reference script contract (cli_tests 010_source_freshness
    fal_scripts/freshness.py): `node.freshness` is the freshness RESULT
    — `if node.freshness:` gates, `.status` attribute-reads — not the
    schema.yml thresholds (those are freshness_spec here)."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    # simulate a project whose freshness has never been evaluated (the
    # shared fixture's target/ may carry a sources.json from CLI runs)
    (proj / "target" / "sources.json").unlink(missing_ok=True)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    src = next(s for s in fal.list_sources() if s.loaded_at_field)
    # thresholds parsed from schema.yml live in freshness_spec
    assert "warn_after" in src.freshness_spec
    # never evaluated → falsy, exactly what reference scripts gate on
    assert not src.freshness
    fal.source_freshness()
    assert src.freshness is not None
    assert src.freshness.status == "error"  # 2024 data vs 30-day error
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_write_to_source_datetime_and_arrays_roundtrip(tmp_path, spark):
    """Reference write_to_source scenarios ('Write a datetime to the
    datawarehouse', 'Write a string and int array'): temporal and array
    columns survive the write→read round-trip bit-exactly."""
    import datetime
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    schema_yml = proj / "models" / "schema.yml"
    # register the sink table under the existing source namespace
    txt = schema_yml.read_text().replace(
        "      - name: events\n",
        "      - name: typed_sink\n"
        "        meta:\n"
        "          path: target/typed_sink.parquet\n"
        "      - name: events\n",
        1,
    )
    schema_yml.write_text(txt)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    ts = datetime.datetime(2023, 5, 17, 12, 34, 56)
    d = datetime.date(2023, 5, 17)
    df = spark.createDataFrame(
        [(1, ts, d, [1, 2, 3], ["a", "b"])],
        "id int, event_ts timestamp, event_d date, nums array<int>, tags array<string>",
    )
    fal.write_to_source(df, "testdata", "typed_sink", mode="overwrite")
    back = fal.source("testdata", "typed_sink").collect()[0]
    assert back["event_ts"] == ts and back["event_d"] == d
    assert back["nums"] == [1, 2, 3] and back["tags"] == ["a", "b"]
    # append doubles the row count (reference 'source size 1/2' contract)
    fal.write_to_source(df, "testdata", "typed_sink", mode="append")
    assert fal.source("testdata", "typed_sink").count() == 2
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
