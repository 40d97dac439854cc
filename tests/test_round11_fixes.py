"""Round-11 adversarial-review regressions: project-loader error paths
(VERDICT r10 item 7 — one focused pass over loader error handling)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from dbt_fal_spark.project.loader import load_project

FIXTURE = Path(__file__).parent / "fixtures" / "jaffle_spark"


def _copy_project(tmp_path: Path) -> Path:
    proj = tmp_path / "proj"
    shutil.copytree(FIXTURE, proj)
    return proj


def test_malformed_schema_yaml_names_the_file(tmp_path):
    """A schema.yml whose top level is a list (lost its `models:` header)
    previously died with an AttributeError traceback deep in the loader;
    now it's a ValueError naming the file and the expectation."""
    proj = _copy_project(tmp_path)
    bad = proj / "models" / "broken.yml"
    bad.write_text("- name: stg_orders\n- name: customers\n")
    with pytest.raises(ValueError, match=r"broken\.yml.*YAML mapping"):
        load_project(proj)


def test_duplicate_model_names_error(tmp_path):
    """Two model files sharing a stem previously let the later-scanned
    one silently replace the earlier (ambiguous ref targets); dbt-style
    behavior is a loud duplicate error naming both files."""
    proj = _copy_project(tmp_path)
    sub = proj / "models" / "sub"
    sub.mkdir()
    (sub / "customers.sql").write_text("select 1 as x")
    with pytest.raises(ValueError, match="duplicate model name 'customers'"):
        load_project(proj)
    (sub / "customers.sql").unlink()
    # python model colliding with a SQL model is the same error
    (sub / "customers.py").write_text("def model(dbt, session):\n    return None\n")
    with pytest.raises(ValueError, match="duplicate model name 'customers'"):
        load_project(proj)


def test_dunder_py_files_are_not_models(tmp_path):
    """__init__.py in a models dir is package plumbing, not a model —
    previously registered as a model named '__init__' that failed at
    run time."""
    proj = _copy_project(tmp_path)
    (proj / "models" / "__init__.py").write_text("")
    manifest = load_project(proj)
    assert not any(m.name == "__init__" for m in manifest.models.values())
