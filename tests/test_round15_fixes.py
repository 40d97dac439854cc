"""Round-15 regression locks (VERDICT r14 items 1/2/5 + ADVICE r14).

Findings fixed this round:
- t_vocab_coverage / t_cms_heavy_hitters pushed the Heaps-law-unbounded
  token vocabulary through a single-partition ranking window; both now
  take the global top-K via orderBy().limit() (TakeOrderedAndProject —
  per-partition K-heaps, driver-side K×P merge) and only the ≤K
  survivors meet a single sort task. Locked by asserting the physical
  plan contains TakeOrderedAndProject and NO empty-partition-spec
  window over the frequency relation.
- t_tfidf_top_terms force-broadcast the vocab-sized df relation; the
  hint is gone (AQE's choice now) and the phantom "stopword prune"
  docstring claim is removed. Locked by scanning the optimized plan
  for a broadcast hint.
- streaming memory-sink GC dropped a caller's LIVE temp view on the
  third drain under a FIXED query name (the stale list contained the
  same name as the newest sink, which had REPLACED the old view).
- _vacuum_versions re-checks the in-flight writer registry per
  directory, immediately before each rmtree (ADVICE r14: the
  caller-side snapshot left a register-after-snapshot window).
- table_swap_token carries a per-commit nonce from the live pointer
  file (ADVICE r14: drop-first swaps landing in the same coarse
  filesystem mtime tick compared equal).
- bench._paired_ratios keys cached floors by the paired-name tuple
  (ADVICE r14: a query breaking during the degraded rerun shrank the
  paired set while the stale floors still subtracted its fixed cost).
- bench_set.canary_verdict returns no-verdict on a zeroed reference
  total instead of raising TypeError through round() (ADVICE r14).
- bench._canary_phase survives one canary erroring and reports which.
- _clean_output on documents that become fully covered by duplicated
  spans: verified consistent with the oracle (both drop the doc) —
  adversarial pass came up empty, behavior locked here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# vocab-window scale fixes (VERDICT r14 items 1-2)
# ---------------------------------------------------------------------------


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_coverage_no_unbounded_single_partition_sort(spark):
    from dbt_fal_spark.operators.curation import t_vocab_coverage

    df = t_vocab_coverage(spark, SF_DIR)
    plan = _physical_plan(df)
    # the vocabulary-sized relation is pruned by TakeOrderedAndProject
    # (per-partition K-heaps), never globally sorted in one task
    assert "TakeOrderedAndProject" in plan
    # every Window in the plan carries a partition spec (the empty-spec
    # form is WindowExec's move-everything-to-one-task path); the spec
    # printed is windowspecdefinition(<partition>, <order> ...) — with
    # no partition key it starts directly with an ordering column
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            inner = line.split("windowspecdefinition(", 1)[1]
            first_arg = inner.split(",", 1)[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                "window with empty partition spec (single-partition sort "
                "of an unbounded relation): " + line
            )
    spark.catalog.clearCache()


def test_cms_probe_side_has_no_window_at_all(spark):
    from dbt_fal_spark.operators.curation import t_cms_heavy_hitters

    df = t_cms_heavy_hitters(spark, SF_DIR)
    plan = _physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan, (
        "the CMS probe ranking should be orderBy().limit(), not a window"
    )
    spark.catalog.clearCache()


def test_tfidf_df_join_not_force_broadcast(spark):
    """The vocab-sized df relation must not carry a broadcast HINT —
    broadcast is AQE's runtime choice (it still picks broadcast at test
    SFs; the hint is what breaks at a 100 TB vocabulary)."""
    from dbt_fal_spark.operators.text import t_tfidf_top_terms

    df = t_tfidf_top_terms(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized and "hints=[broadcast]" not in optimized
    # the phantom docstring claim is gone
    assert "scale path drops terms" not in (t_tfidf_top_terms.__doc__ or "")
    spark.catalog.clearCache()


def test_vocab_entries_still_match_their_oracles(spark):
    """The scale fix must not move a single value: re-run the in-repo
    oracle compare for the three changed entries at sf0.001."""
    import duckdb

    from dbt_fal_spark.registry import all_queries

    specs = all_queries()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name in ("t_vocab_coverage", "t_cms_heavy_hitters", "t_tfidf_top_terms"):
        got = specs[name].fn(spark, SF_DIR)
        want = con.execute(specs[name].oracle).df()
        g = got.toPandas().sort_values(sorted(got.columns)).reset_index(drop=True)
        w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
        g = g[sorted(g.columns)]
        assert len(g) == len(w), name
        for col in g.columns:
            for a, b in zip(g[col], w[col]):
                if isinstance(a, float):
                    assert abs(a - b) < 1e-12, (name, col, a, b)
                else:
                    assert a == b, (name, col, a, b)
        spark.catalog.clearCache()
    con.close()


# ---------------------------------------------------------------------------
# streaming memory-sink GC under a fixed query name (r15 adversarial)
# ---------------------------------------------------------------------------


def test_memory_sink_fixed_name_survives_repeated_drains(spark):
    """Three drains under the SAME query name: the GC must not drop the
    temp view the newest drain just registered (pre-fix, the third drain
    put the shared name on the stale list and killed its own sink)."""
    from dbt_fal_spark.streaming.windows import (
        hourly_windowed_agg,
        read_events_stream,
        run_stream_to_completion,
    )

    src = hourly_windowed_agg(read_events_stream(spark, SF_DIR))
    for _ in range(3):
        out = run_stream_to_completion(src, name="r15_fixed_name")
        assert out.count() > 0
    # the view of the LAST drain must still be resolvable by name
    assert spark.table("r15_fixed_name").count() > 0
    spark.catalog.dropTempView("r15_fixed_name")


# ---------------------------------------------------------------------------
# vacuum in-flight re-check + swap-token nonce (ADVICE r14)
# ---------------------------------------------------------------------------


def test_vacuum_rechecks_inflight_registry_per_directory(tmp_path):
    """A version dir registered AFTER the vacuum call starts (the
    snapshot race) must survive: _vacuum_versions consults the registry
    immediately before each rmtree."""
    import dbt_fal_spark.materialize as mat

    base = tmp_path / "tbl"
    late = str(tmp_path / "tbl__v0badd00d")
    dead = str(tmp_path / "tbl__vdeadbeef")
    os.makedirs(late)
    os.makedirs(dead)
    with mat._INFLIGHT_LOCK:
        mat._INFLIGHT_DIRS.add(late)
    try:
        # keep is EMPTY — only the per-dir registry check can save `late`
        removed = mat._vacuum_versions(str(base), keep=set())
    finally:
        with mat._INFLIGHT_LOCK:
            mat._INFLIGHT_DIRS.discard(late)
    assert os.path.isdir(late), "in-flight dir was rmtree'd"
    assert not os.path.isdir(dead)
    assert removed == 1
    # after deregistration the same dir is collectable
    assert mat._vacuum_versions(str(base), keep=set()) == 1
    assert not os.path.isdir(late)


def test_swap_token_changes_across_same_mtime_tick_rebuilds(spark, tmp_path):
    """Two drop-first swaps forced onto the SAME directory mtime must
    still produce different tokens — the per-commit nonce, not the
    coarse-filesystem timestamp, carries the version (ADVICE r14)."""
    from dbt_fal_spark.materialize import (
        _table_location,
        replace_relation_atomic,
        table_swap_token,
    )

    ident = "r15_nonce_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    df1 = spark.range(10).selectExpr("id AS k", "cast(id % 3 as string) AS p")
    replace_relation_atomic(spark, df1, ident, partition_by="p")
    loc1 = _table_location(spark, ident)
    pinned = (1_700_000_000, 1_700_000_000)
    os.utime(loc1, pinned)
    tok1 = table_swap_token(spark, ident)

    df2 = spark.range(20).selectExpr("id AS k", "cast(id % 3 as string) AS p")
    replace_relation_atomic(spark, df2, ident, partition_by="p")
    loc2 = _table_location(spark, ident)
    os.utime(loc2, pinned)  # simulate the coarse same-tick landing
    tok2 = table_swap_token(spark, ident)
    assert tok1 != tok2, "same-tick rebuild produced an equal swap token"
    spark.sql(f"DROP TABLE IF EXISTS {ident}")


def test_live_pointer_roundtrip_with_nonce(tmp_path):
    """Pointer file carries (location, nonce); location parsing is
    unchanged for readers, and every write refreshes the nonce. Pre-r15
    single-line pointer files still parse (nonce None)."""
    from dbt_fal_spark.materialize import (
        _live_pointer_path,
        _read_live_nonce,
        _read_live_pointer,
        _write_live_pointer,
    )

    base = str(tmp_path / "t")
    loc = str(tmp_path / "t__v01234567")
    _write_live_pointer(base, loc)
    assert _read_live_pointer(base) == os.path.abspath(loc)
    n1 = _read_live_nonce(base)
    assert n1
    _write_live_pointer(base, loc)
    assert _read_live_nonce(base) != n1
    # pre-r15 format: single line, no nonce
    with open(_live_pointer_path(base), "w") as f:
        f.write(os.path.abspath(loc))
    assert _read_live_pointer(base) == os.path.abspath(loc)
    assert _read_live_nonce(base) is None


# ---------------------------------------------------------------------------
# bench harness hardening (ADVICE r14 + VERDICT r14 item 5)
# ---------------------------------------------------------------------------


def test_paired_ratio_floors_keyed_by_paired_set(monkeypatch):
    """Cached floors measured over one paired set must be remeasured
    when the set shrinks (a query breaking during the degraded-window
    rerun), not subtracted stale."""
    sys.path.insert(0, REPO)
    import bench

    calls = {"floor": 0}

    def fake_engine_floor(spark, jvm_gc, specs, paired, runs=2):
        calls["floor"] += 1
        return 0.1 * len(paired)

    def fake_oracle_timings(names, specs, sf_dir, runs=3):
        return {n: 0.05 for n in names}

    monkeypatch.setattr(bench, "_engine_floor", fake_engine_floor)
    monkeypatch.setattr(bench, "_oracle_timings", fake_oracle_timings)
    monkeypatch.setattr(bench, "FLOOR_DIR", REPO)  # isdir() true

    eng = {"a": 1.0, "b": 2.0, "c": 3.0}
    ora = {"a": 0.5, "b": 1.0, "c": 1.5}
    out1, floors = bench._paired_ratios(None, None, {}, eng, ora, "/x/sf0.1")
    assert calls["floor"] == 1
    assert floors[0] == ("a", "b", "c")
    # same set: floors reused, no remeasure
    out2, floors = bench._paired_ratios(None, None, {}, eng, ora, "/x/sf0.1", floors=floors)
    assert calls["floor"] == 1
    # shrunk set: remeasured, floor totals follow the new set
    eng2 = {"a": 1.0, "b": 2.0}
    ora2 = {"a": 0.5, "b": 1.0}
    out3, floors2 = bench._paired_ratios(None, None, {}, eng2, ora2, "/x/sf0.1", floors=floors)
    assert calls["floor"] == 2
    assert floors2[0] == ("a", "b")
    assert out3["engine_floor_sec"] == round(0.2, 3)


def test_canary_verdict_zero_reference_total_is_no_verdict(monkeypatch):
    import dbt_fal_spark.bench_set as bs

    monkeypatch.setitem(bs.CANARY_REF, "9.9", {"q": 0.0})
    assert bs.canary_verdict({"q": 1.0}, "9.9") is None
    # missing sf still no-verdict; healthy path still verdicts
    assert bs.canary_verdict({"q": 1.0}, "8.8") is None
    v = bs.canary_verdict(
        {n: r * 1.0 for n, r in bs.CANARY_REF["0.1"].items()}, "0.1"
    )
    assert v is not None and v["degraded_window"] in (False, True)


def test_canary_phase_survives_one_broken_canary(monkeypatch):
    sys.path.insert(0, REPO)
    import bench
    from dbt_fal_spark.bench_set import CANARIES

    class _Cat:
        def clearCache(self):
            pass

    class _Spark:
        catalog = _Cat()

    class _Spec:
        def __init__(self, fn):
            self.fn = fn

    class _DF:
        def count(self):
            return 1

    def ok(spark, sf_dir):
        return _DF()

    def boom(spark, sf_dir):
        raise RuntimeError("canary down")

    specs = {n: _Spec(ok) for n in CANARIES}
    specs[CANARIES[0]] = _Spec(boom)
    timings, errors = bench._canary_phase(_Spark(), lambda: None, specs, "/x", runs=1)
    assert CANARIES[0] in errors and "canary down" in errors[CANARIES[0]]
    assert set(timings) == set(CANARIES[1:])


def test_bench_merge_reports_canary_clean_subset(tmp_path):
    """bench_merge prints the clean-runs composite alongside the
    all-runs minima so a contended round can't move the headline."""
    clean = {
        "queries": {"a": 1.0, "b": 2.0},
        "value": 3.0,
        "canary_ratio": 1.05,
        "degraded_window": False,
    }
    hot = {
        "queries": {"a": 0.4, "b": 0.5},  # suspiciously fast noise-window mins
        "value": 0.9,
        "canary_ratio": 2.2,
        "degraded_window": True,
    }
    p1 = tmp_path / "run1.json"
    p2 = tmp_path / "run2.json"
    p1.write_text(json.dumps(clean) + "\n")
    p2.write_text(json.dumps(hot) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_merge.py"), str(p1), str(p2)],
        capture_output=True, text=True, check=True,
    )
    doc = json.loads(out.stdout)
    assert doc["engine_composite_sec"] == 0.9  # all-runs minima (noisy)
    assert doc["n_clean_runs"] == 1
    assert doc["clean_runs_composite_sec"] == 3.0  # clean subset untouched
    assert doc["per_run"][0]["degraded_window"] is False
    assert doc["per_run"][1]["canary_ratio"] == 2.2


# ---------------------------------------------------------------------------
# _clean_output on fully-covered documents (r15 adversarial — pass came
# up empty; behavior verified consistent with the oracle and locked)
# ---------------------------------------------------------------------------


def test_clean_output_drops_fully_covered_docs(spark):
    from dbt_fal_spark.operators.curation import SPAN_K, _clean_output

    # doc 1: every position covered by duplicated k-gram starts -> drops
    # doc 2: spans cover a prefix only -> survives with the tail tokens
    # doc 3: no duplicated spans -> survives verbatim
    w1 = [f"t{i}" for i in range(SPAN_K * 2)]
    w2 = [f"u{i}" for i in range(SPAN_K + 3)]
    w3 = ["lone", "doc", "words"]
    ws = spark.createDataFrame(
        [(1, w1), (2, w2), (3, w3)], "doc_id int, w array<string>"
    )
    dup = spark.createDataFrame(
        [(1, 1), (1, SPAN_K + 1), (2, 1)], "doc_id int, pos int"
    )
    out = _clean_output(ws, dup).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [2, 3], (
        "fully-covered doc must drop out (consistent with the oracle's "
        "inner-join-then-group shape)"
    )
    r2 = out[0]
    assert r2["n_kept"] == 3 and r2["n_removed"] == SPAN_K
    assert r2["text_clean"] == " ".join(w2[SPAN_K:])
    r3 = out[1]
    assert r3["n_kept"] == 3 and r3["n_removed"] == 0
    assert r3["text_clean"] == "lone doc words"
