"""Per-model environment isolation (reference: packages/environments/
base.py:104-232, virtual_env.py:26-92): scripts of a model tagged with
meta.fal.environment run in that named venv's interpreter.
"""

from __future__ import annotations

import sys
import textwrap
from pathlib import Path

import pytest

from dbt_fal_spark.api import FalSpark
from dbt_fal_spark.environments import VirtualEnvironment, load_environments


def test_load_environments_absent_file(tmp_path):
    assert load_environments(tmp_path) == {}


def test_load_environments_rejects_unknown_type(tmp_path):
    (tmp_path / "fal_project.yml").write_text(
        "environments:\n  - name: x\n    type: conda\n"
    )
    with pytest.raises(ValueError, match="not supported"):
        load_environments(tmp_path)


def test_venv_script_runs_in_isolated_interpreter(tmp_path):
    env = VirtualEnvironment(name="clean", base_dir=tmp_path / "envs")
    script = tmp_path / "probe.py"
    script.write_text(
        "import sys\n"
        "context.result = {'python': sys.executable,\n"
        "                  'model': context.current_model['name'],\n"
        "                  'arg': context.arguments['k'],\n"
        "                  'target': context.target}\n"
    )
    res = env.run_script(
        script,
        {
            "current_model": {"name": "m1", "alias": "m1", "status": "success", "meta": {}},
            "arguments": {"k": 41},
            "target": "dev",
        },
    )
    assert res["status"] == "success"
    assert res["result"]["model"] == "m1" and res["result"]["arg"] == 41
    assert res["result"]["target"] == "dev"
    # ran under the venv interpreter, not this one
    assert res["result"]["python"].startswith(str(env.env_dir))
    assert res["result"]["python"] != sys.executable
    # venv reused on second call (same dir)
    assert env.ensure() == env.python


def test_model_scripts_use_declared_environment(spark, tmp_path):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: isoproj")
    (proj / "fal_project.yml").write_text(
        "environments:\n  - name: clean\n    type: venv\n"
    )
    (proj / "models" / "one.sql").write_text("SELECT 1 AS x")
    (proj / "models" / "schema.yml").write_text(
        textwrap.dedent(
            """
            version: 2
            models:
              - name: one
                config: {materialized: table}
                meta:
                  fal:
                    environment: clean
                    scripts:
                      after:
                        - record_env.py
            """
        )
    )
    (proj / "record_env.py").write_text(
        "import sys\n"
        "open(__file__ + '.interp', 'w').write(sys.executable)\n"
    )
    spark.sql("DROP DATABASE IF EXISTS isoproj CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run()
    assert all(s == "success" for s in statuses.values()), statuses
    interp = Path(str(proj / "record_env.py.interp")).read_text()
    assert str(proj / ".fal_envs" / "clean-") in interp or interp.startswith(
        str(proj / ".fal_envs")
    )
    assert interp != sys.executable
    spark.sql("DROP DATABASE IF EXISTS isoproj CASCADE")


def test_missing_environment_fails_clearly(spark, tmp_path):
    proj = tmp_path / "proj2"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: isoproj2")
    (proj / "models" / "one.sql").write_text("SELECT 1 AS x")
    (proj / "models" / "schema.yml").write_text(
        textwrap.dedent(
            """
            version: 2
            models:
              - name: one
                config: {materialized: table}
                meta:
                  fal:
                    environment: ghost
                    scripts:
                      after: [s.py]
            """
        )
    )
    (proj / "s.py").write_text("pass\n")
    spark.sql("DROP DATABASE IF EXISTS isoproj2 CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run()
    # the model itself builds; its post-script fails the node with the
    # clear missing-environment error recorded in run_results
    assert statuses["model.isoproj2.one"] == "error"
    import json

    errors = json.loads((proj / "target" / "run_results.json").read_text())["errors"]
    assert any("ghost" in e for e in errors)
    spark.sql("DROP DATABASE IF EXISTS isoproj2 CASCADE")
