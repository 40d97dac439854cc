"""Round-13 hardening regressions (ADVICE r12 low items):

- singular-test `where` config now filters the violation set instead of
  being parsed-then-silently-dropped (api.py singular branch + loader)
- status-less rows in a dbt target/sources.json artifact are skipped at
  load-time attach, so the `freshness` property's `.status` contract
  holds for every attached result
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

FIXTURE = Path(__file__).parent / "fixtures" / "jaffle_spark"


def _one_model_project(tmp_path: Path, model_sql: str) -> Path:
    proj = tmp_path / "tproj13"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(
        "name: tproj13\nprofile: tproj13\nmodel-paths: [models]\n"
    )
    (proj / "models" / "probe.sql").write_text(model_sql)
    (proj / "models" / "schema.yml").write_text("models:\n  - name: probe\n")
    return proj


def test_singular_test_where_filters_violations(tmp_path, spark):
    """`{{ config(where=...) }}` on a singular test filters the violation
    rows — same relation algebra as the generic-test branch. Previously
    the loader parsed `where` but dropped it for singular tests while
    honoring severity/limit from the same config (ADVICE r12)."""
    from dbt_fal_spark.api import FalSpark

    proj = _one_model_project(
        tmp_path, "select * from values ('A', 1), ('A', 2), ('B', 3) t(status, id)\n"
    )
    (proj / "tests").mkdir()
    (proj / "tests" / "status_a_rows.sql").write_text(
        "{{ config(where=\"id >= 2\") }}\n"
        "select * from {{ ref('probe') }} where status = 'A'\n"
    )
    spark.sql("DROP DATABASE IF EXISTS tproj13 CASCADE")
    fal = FalSpark(proj, spark=spark)
    fal.run()
    t = fal.manifest.tests["test.tproj13.status_a_rows"]
    assert t.where == "id >= 2"  # loader keeps it for singular tests now
    by_name = {r["test"]: r for r in fal.test()}
    sg = by_name["status_a_rows"]
    # 2 rows have status='A'; the where config keeps only id >= 2 → 1
    assert sg["violations"] == 1 and sg["status"] == "error"
    spark.sql("DROP DATABASE IF EXISTS tproj13 CASCADE")


def test_sources_artifact_statusless_rows_skipped(tmp_path, spark):
    """An artifact row without `status` is unusable (the `freshness`
    property promises `.status`; reference scripts do
    `node.freshness.status`) — load-time attach now filters it, matching
    source_freshness()'s own reuse gate (ADVICE r12)."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = tmp_path / "proj"
    shutil.copytree(FIXTURE, proj)
    uid = "source.jaffle_spark.testdata.events"
    canned = {
        "metadata": {},
        "results": [
            {
                # no `status` key: e.g. a runtime-errored freshness row in
                # a real dbt artifact
                "unique_id": uid,
                "max_loaded_at": "2026-08-14 12:00:00",
            }
        ],
    }
    (proj / "target").mkdir(exist_ok=True)
    (proj / "target" / "sources.json").write_text(json.dumps(canned))
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    src = next(s for s in fal.manifest.sources.values() if s.unique_id == uid)
    # the status-less row must NOT attach: freshness is None (never
    # evaluated), not a namespace missing .status
    assert src.freshness_result is None
    assert src.freshness is None
    # and the freshness command falls through to live compute
    res = fal.source_freshness()
    assert all("from_artifact" not in r for r in res)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


# ---------------------------------------------------------------------------
# r13 adversarial-review findings (VERDICT r12 item 6 targets: debug
# verb, freshness round-trip under degenerate inputs)
# ---------------------------------------------------------------------------


def test_debug_verb_reports_project_load_failure(tmp_path, capsys):
    """`debug` exists to diagnose a broken setup: a project that fails
    to LOAD (bad YAML) must print a FAIL report and exit 1, not
    traceback (r13 review finding)."""
    from dbt_fal_spark.cli import main

    proj = tmp_path / "broken"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: [unclosed\n")  # invalid YAML
    rc = main(["debug", "--project-dir", str(proj)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "project load: FAIL" in out


def test_source_freshness_all_null_loaded_at_is_runtime_error(tmp_path, spark):
    """An empty / all-NULL loaded_at source reports dbt's 'runtime
    error' status instead of crashing the whole freshness run (r13
    review finding)."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = tmp_path / "proj"
    shutil.copytree(FIXTURE, proj)
    (proj / "target" / "sources.json").unlink(missing_ok=True)
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    src = next(s for s in fal.manifest.sources.values() if s.loaded_at_field)
    # point the source at an empty relation with the same loaded_at col
    empty = spark.range(0).selectExpr(
        f"CAST(NULL AS TIMESTAMP) AS {src.loaded_at_field}"
    )
    empty.createOrReplaceTempView("__empty_freshness_probe")
    orig_source = fal.source
    fal.source = lambda s, t: (
        spark.table("__empty_freshness_probe")
        if (s, t) == (src.source_name, src.table_name)
        else orig_source(s, t)
    )
    res = {r["source"]: r for r in fal.source_freshness(recompute=True)}
    r = res[src.full_name]
    assert r["status"] == "runtime error"
    assert r["age_sec"] is None and r["max_loaded_at"] is None
    # the row still round-trips through the artifact writer
    fal._write_sources_artifact()
    import json as _json

    doc = _json.loads((proj / "target" / "sources.json").read_text())
    row = next(
        x for x in doc["results"] if x["unique_id"] == src.unique_id
    )
    assert row["status"] == "runtime error"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
