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
