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


def test_memory_sink_gc_keeps_one_grace_sink(spark):
    """run_stream_to_completion drops this session's older drained
    memory sinks (keeping the newest previous as grace) — previously
    every drain leaked an in-memory table for the session's lifetime."""
    import dbt_fal_spark.streaming.windows as W
    from tests.conftest import SF_DIR

    # clean baseline: earlier tests in the session legitimately leave up
    # to two tracked sinks plus (pre-fix ordering) stray ones — drop them
    # all so the invariant below is about THIS test's drains
    for t in spark.catalog.listTables():
        if t.name.startswith("stream_out_"):
            spark.catalog.dropTempView(t.name)
    W._MEMORY_SINKS.clear()
    results = []
    for _ in range(4):
        events = W.read_events_stream(spark, SF_DIR)
        results.append(W.run_stream_to_completion(W.hourly_windowed_agg(events)))
    # r12: sinks are tracked PER SparkSession (dict keyed by the JVM
    # sessionUUID) under a lock — an unkeyed list dropped views in the
    # wrong session when several sessions drained, and concurrent
    # drains raced
    key = W._session_key(spark)
    tracked = W._MEMORY_SINKS[key]
    assert set(W._MEMORY_SINKS) == {key}
    assert len(tracked) <= 2  # current + one grace
    live = {t.name for t in spark.catalog.listTables() if t.name.startswith("stream_out_")}
    assert live == set(tracked)
    # the newest result (and the grace one) remain readable
    assert results[-1].count() > 0


def test_memory_sink_gc_concurrent_drains_consistent(spark):
    """Concurrent drains must not race the tracking list: after N
    parallel drains the tracked set exactly matches the live temp views
    (no double-free, no untracked leak) and at most one grace sink
    beyond the survivors of each thread's last drain remains."""
    import threading as th

    import dbt_fal_spark.streaming.windows as W
    from tests.conftest import SF_DIR

    for t in spark.catalog.listTables():
        if t.name.startswith("stream_out_"):
            spark.catalog.dropTempView(t.name)
    W._MEMORY_SINKS.clear()
    errs = []

    def drain():
        try:
            events = W.read_events_stream(spark, SF_DIR)
            W.run_stream_to_completion(W.hourly_windowed_agg(events))
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [th.Thread(target=drain) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    tracked = set(W._MEMORY_SINKS.get(W._session_key(spark), []))
    live = {t.name for t in spark.catalog.listTables() if t.name.startswith("stream_out_")}
    # every tracked sink is live, and nothing beyond the tracked set
    # plus in-flight grace survivors leaked
    assert tracked <= live
    assert len(tracked) <= 2


def test_scripts_and_python_models_run_as_main(tmp_path, spark):
    """Reference contract (cli_tests/features/main_module.feature):
    scripts and fal models execute with __name__ == '__main__', so
    `if __name__ == "__main__":` blocks run. Previously __name__ was
    absent from the exec namespace and the guard raised NameError."""
    import json as _json
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    out = tmp_path / "main_probe.json"
    (proj / "scripts" / "main_probe.py").write_text(
        "import json\n"
        "if __name__ == '__main__':\n"
        f"    json.dump({{'name': __name__}}, open({str(out)!r}, 'w'))\n"
    )
    (proj / "fal_models" / "main_model.py").write_text(
        "import pandas as pd\n"
        "assert __name__ == '__main__', __name__\n"
        "df = ref('orders_daily')\n"
        "write_to_model(df.limit(1), mode='overwrite')\n"
    )
    schema_yml = proj / "models" / "schema.yml"
    schema_yml.write_text(
        schema_yml.read_text().replace(
            "        scripts:\n          after:\n            - scripts/after_audit.py",
            "        scripts:\n          after:\n            - scripts/after_audit.py\n            - scripts/main_probe.py",
        )
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(threads=2)
    assert statuses["model.jaffle_spark.main_model"] == "success"
    assert _json.load(open(out))["name"] == "__main__"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_hooks_cannot_write_to_model_or_source(tmp_path, spark):
    """Reference contract (run.feature 'Post hooks with write_to_model
    will fail', fal_script.py:284-296): hooks observe model runs; calling
    write_to_model/write_to_source from a hook raises, and the node
    reports error. Before/after SCRIPTS keep write access."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    (proj / "scripts" / "writing_hook.py").write_text(
        "write_to_model(ref('customers'), mode='overwrite')\n"
    )
    schema_yml = proj / "models" / "schema.yml"
    schema_yml.write_text(
        schema_yml.read_text().replace(
            "        pre-hook:",
            "        post-hook:\n"
            "          - path: scripts/writing_hook.py\n"
            "        pre-hook:",
        )
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(threads=2)
    assert statuses["model.jaffle_spark.customers"] == "error"
    import json as _json

    errors = _json.loads((fal.target_dir / "run_results.json").read_text()).get("errors", [])
    assert any("not allowed in hooks" in e for e in errors), errors
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_model_alias_config(tmp_path, spark):
    """dbt `alias` config (reference: run.feature 'fal run provides
    model aliases'): the physical relation takes the alias name, ref()
    keeps resolving by MODEL name, and context.current_model.alias
    reports the alias to scripts."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    proj = _copy_project(tmp_path)
    (proj / "models" / "agent_wait_time.sql").write_text(
        "{{ config(materialized='table', alias='wait_time') }}\n"
        "select count(*) as n from {{ ref('stg_orders') }}\n"
    )
    (proj / "scripts" / "alias_probe.py").write_text(
        "open(__file__ + '.out', 'w').write(\n"
        "    f'alias={context.current_model.alias} name={context.current_model.name}')\n"
    )
    schema_yml = proj / "models" / "schema.yml"
    schema_yml.write_text(
        schema_yml.read_text()
        + "  - name: agent_wait_time\n"
        + "    meta: {fal: {scripts: {after: [scripts/alias_probe.py]}}}\n"
    )
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")
    fal = FalSpark(proj, spark=spark)
    statuses = fal.run(threads=2)
    assert statuses["model.jaffle_spark.agent_wait_time"] == "success"
    # physical relation carries the alias; the model name is not a table
    assert spark.catalog.tableExists("jaffle_spark.wait_time")
    assert not spark.catalog.tableExists("jaffle_spark.agent_wait_time")
    # ref() by MODEL name resolves to the aliased relation
    assert fal.ref("agent_wait_time").collect()[0]["n"] > 0
    probe = (proj / "scripts" / "alias_probe.py.out").read_text()
    assert probe == "alias=wait_time name=agent_wait_time"
    spark.sql("DROP DATABASE IF EXISTS jaffle_spark CASCADE")


def test_tests_attached_to_model_and_source_objects(tmp_path):
    """list_models()/list_sources() consumers enumerate per-node tests
    (reference: dbt_test.feature 'Source tests are present in context');
    previously DbtModel had no .tests and DbtSource.tests stayed empty."""
    proj = _copy_project(tmp_path)
    schema_yml = proj / "models" / "schema.yml"
    schema_yml.write_text(
        schema_yml.read_text().replace(
            "      - name: orders\n        meta:\n          path: $TESTDATA_DIR/orders.parquet",
            "      - name: orders\n        meta:\n          path: $TESTDATA_DIR/orders.parquet\n"
            "        columns:\n"
            "          - name: o_orderkey\n"
            "            tests: [unique, not_null]\n",
        )
    )
    manifest = load_project(proj)
    stg = next(m for m in manifest.models.values() if m.name == "stg_orders")
    assert {t.test_type for t in stg.tests} == {
        "unique", "not_null", "accepted_values", "relationships"
    }
    orders_src = next(
        s for s in manifest.sources.values() if s.table_name == "orders"
    )
    assert {t.test_type for t in orders_src.tests} == {"unique", "not_null"}
    # the same objects are registered in the global test map
    assert all(t.unique_id in manifest.tests for t in stg.tests + orders_src.tests)


def test_property_spellings_match_reference_example(tmp_path, spark):
    """The reference programmatic example iterates faldbt.models /
    .sources / .tests as ATTRIBUTES (002_jaffle_shop/fal_dbt.py);
    FalSpark exposes the same spellings alongside the list_* methods."""
    import os

    from dbt_fal_spark.api import FalSpark
    from tests.conftest import SF_DIR

    os.environ["TESTDATA_DIR"] = SF_DIR
    fal = FalSpark(FIXTURE, spark=spark)
    assert [m.name for m in fal.models] == [m.name for m in fal.list_models()]
    assert len(fal.sources) == len(fal.list_sources())
    assert len(fal.tests) == len(fal.list_tests())
    # the reference example's loop shape works verbatim
    for model in fal.models:
        _ = (model.name, [(t.name, t.status) for t in model.tests])
    for source in fal.sources:
        _ = (source.source_name, source.table_name,
             [(t.name, t.status) for t in source.tests])
