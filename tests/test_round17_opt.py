"""Round-17 OPTIMIZATION locks (second optimization round).

Changes locked here (see OPTIMIZATION_r17.md for measurements):
- readers.conf_bytes: byte-size confs parsed with Spark's size-string
  suffixes ("128m") — a bare int() raised ValueError and silently sent
  width probes down the ~100 ms RDD fallback (ADVICE r16).
- readers.scan_bytes: the spread()/t_tfidf width probes read the sum of
  LEAF relation stats (the file-byte total split planning divides), not
  the projected-plan estimate, which scales string columns by a 20-byte
  schema default and could consolidate a genuinely wide scan (ADVICE
  r16).
- readers.at_scale: scale-profile gating keys on the dedicated
  ``spark.dbt_fal.profile`` conf set by session.pick_profile, NOT on
  ``spark.sql.adaptive.enabled`` (an unrelated tuning flag, default-on);
  undeclared sessions conservatively read as latency (ADVICE r16).
- readers.persist_at_scale: explicit serialized MEMORY_AND_DISK level —
  the persisted relations are dimension-sized, not small, at 100 TB
  (VERDICT r16 item 5).
- d_ngram_jaccard_pairs: scale-profile-only size-ratio pair prune
  (jaccard <= min/max ⇒ max > 2*min cannot reach the 0.5 gate); the
  latency profile keeps the bare join, which measured faster locally
  (VERDICT r16 item 4).
- d_lsh_levenshtein_refine: the scale-profile text-pruning semi-join
  broadcasts the candidate-id side explicitly (guarded by a measured
  count vs spark.dbt_fal.lev.maxBroadcastIds) so a planner misestimate
  can never shuffle the whole corpus text (VERDICT r16 item 9).
- bench.py: full per-query engine+oracle minima map emitted as its own
  ``per_query_timings`` JSON line BEFORE the final compact line (the
  83-entry map outgrows the driver's 2000-char tail window; the final
  line must stay complete), and the final line carries a size-budgeted
  top-K ``queries`` map — the driver joins per-query comparisons on the
  LAST parsed line's ``queries`` key, so the heaviest entries that fit
  under 1950 bytes ride there (VERDICT r16 item 1).
- tools/paired_bench.py: record picker prefers the full line (the only
  one with ``oracle_queries``) so paired artifacts stay full-width now
  that the last line also has a (partial) ``queries`` key.
"""

from __future__ import annotations

import json
import os

import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class _profile:
    """Temporarily declare the session profile marker conf."""

    def __init__(self, spark, value: str):
        self.spark, self.value = spark, value

    def __enter__(self):
        self.prior = self.spark.conf.get("spark.dbt_fal.profile", "latency")
        self.spark.conf.set("spark.dbt_fal.profile", self.value)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.dbt_fal.profile", self.prior)
        self.spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# conf_bytes / scan_bytes / at_scale / persist_at_scale
# ---------------------------------------------------------------------------


def test_conf_bytes_parses_size_strings(spark):
    from dbt_fal_spark.sources.readers import conf_bytes

    key = "spark.dbt_fal.test.bytes"
    for raw, want in [
        ("134217728", 134217728),
        ("128m", 134217728),
        ("128M", 134217728),
        ("128mb", 134217728),
        ("1g", 1 << 30),
        ("512k", 512 << 10),
        ("7", 7),
    ]:
        spark.conf.set(key, raw)
        assert conf_bytes(spark, key, 1) == want, raw
    # unparseable value falls back to the caller's default, visibly
    spark.conf.set(key, "lots")
    assert conf_bytes(spark, key, 42) == 42
    spark.conf.unset(key)
    # unset key -> default
    assert conf_bytes(spark, key, 99) == 99


def test_scan_bytes_is_projection_invariant(spark):
    """ADVICE r16 item 2: a narrow projection of a wide text table must
    NOT shrink the probe's estimate (the projected-plan stats scaled
    text columns to a 20-byte schema default; the leaf stats are the
    file bytes split planning actually divides)."""
    from dbt_fal_spark.sources.readers import load_table, scan_bytes

    docs = load_table(spark, SF_DIR, "documents")
    full = scan_bytes(docs)
    proj = scan_bytes(docs.select("doc_id", "text"))
    assert full is not None and full > 0
    assert proj == full


def test_at_scale_keys_on_dedicated_conf_not_aqe(spark):
    from dbt_fal_spark.sources.readers import at_scale

    prior_aqe = spark.conf.get("spark.sql.adaptive.enabled", "false")
    try:
        with _profile(spark, "latency"):
            # AQE toggling alone must not flip the profile (ADVICE r16)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            assert at_scale(spark) is False
        with _profile(spark, "scale"):
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            assert at_scale(spark) is True
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)
    # undeclared session -> conservative latency (no persists)
    spark.conf.unset("spark.dbt_fal.profile")
    try:
        assert at_scale(spark) is False
    finally:
        spark.conf.set("spark.dbt_fal.profile", "latency")


def test_persist_at_scale_serialized_storage_level(spark):
    from pyspark import StorageLevel

    from dbt_fal_spark.sources.readers import load_table, persist_at_scale

    df = load_table(spark, SF_DIR, "region")
    with _profile(spark, "latency"):
        assert persist_at_scale(df).storageLevel == StorageLevel.NONE
    with _profile(spark, "scale"):
        cached = persist_at_scale(df)
        try:
            lvl = cached.storageLevel
            # serialized MEMORY_AND_DISK (VERDICT r16 item 5): disk- and
            # memory-backed, NOT the deserialized default
            assert (lvl.useDisk, lvl.useMemory, lvl.deserialized) == (
                True,
                True,
                False,
            )
            assert lvl == StorageLevel.MEMORY_AND_DISK
        finally:
            cached.unpersist()


# ---------------------------------------------------------------------------
# d_ngram_jaccard_pairs: scale-profile size-ratio prune
# ---------------------------------------------------------------------------


def test_ngram_jaccard_profiles_agree(spark):
    from dbt_fal_spark.operators.dedup import d_ngram_jaccard_pairs

    lat = {tuple(r) for r in d_ngram_jaccard_pairs(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    with _profile(spark, "scale"):
        scl = {tuple(r) for r in d_ngram_jaccard_pairs(spark, SF_DIR).collect()}
    assert lat == scl and len(lat) > 0


def test_ngram_jaccard_scale_plan_carries_size_ratio_predicate(spark):
    from dbt_fal_spark.operators.dedup import d_ngram_jaccard_pairs

    lat_plan = _physical_plan(d_ngram_jaccard_pairs(spark, SF_DIR))
    spark.catalog.clearCache()
    with _profile(spark, "scale"):
        scl_plan = _physical_plan(d_ngram_jaccard_pairs(spark, SF_DIR))
    # the (a.n <= 2*b.n) AND (b.n <= 2*a.n) conjuncts render as integer
    # multiplications in the join condition — scale only
    assert " * 2))" in scl_plan
    assert " * 2))" not in lat_plan


# ---------------------------------------------------------------------------
# d_lsh_levenshtein_refine: broadcast-guarded text semi (scale profile)
# ---------------------------------------------------------------------------


def test_lev_refine_semi_broadcasts_despite_low_auto_threshold(spark):
    """VERDICT r16 item 9: with auto-broadcast OFF (the worst-case
    planner misestimate), the corpus-text semi-join must STILL be a
    BroadcastHashJoin via the explicit hint — never a sort-merge/
    shuffled-hash semi that exchanges the whole corpus text."""
    from dbt_fal_spark.operators.dedup import d_lsh_levenshtein_refine

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with _profile(spark, "scale"):
            plan = _physical_plan(d_lsh_levenshtein_refine(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    for op in ("SortMergeJoin LeftSemi", "ShuffledHashJoin LeftSemi"):
        assert op not in plan


def test_lev_refine_id_cap_fallback_matches(spark):
    """Candidate-id count over spark.dbt_fal.lev.maxBroadcastIds: the
    un-hinted fallback semi must produce identical values (the guard
    changes the join strategy, never the result)."""
    from dbt_fal_spark.operators.dedup import d_lsh_levenshtein_refine

    base = {tuple(r) for r in d_lsh_levenshtein_refine(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    key = "spark.dbt_fal.lev.maxBroadcastIds"
    try:
        spark.conf.set(key, "0")  # force every id set over the cap
        with _profile(spark, "scale"):
            df = d_lsh_levenshtein_refine(spark, SF_DIR)
            plan = _physical_plan(df)
            capped = {tuple(r) for r in df.collect()}
    finally:
        spark.conf.unset(key)
        spark.catalog.clearCache()
    assert capped == base and len(base) > 0
    # over-cap: the explicit broadcast hint must NOT be present on the
    # semi (the planner is free to pick, the driver never builds it)
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# scale-profile streaming state store: RocksDB provider
# ---------------------------------------------------------------------------


def test_streaming_state_rocksdb_provider_matches_default(spark):
    """The scale profile sets the RocksDB state-store provider (state
    off-heap/on-disk instead of deserialized JVM-heap objects — guide
    §5). Lock: representative stateful entries (arbitrary-state agg,
    watermark-bounded dedup) produce identical results under RocksDB."""
    from dbt_fal_spark.registry import all_queries

    specs = all_queries()
    names = ["st_user_totals_stateful", "st_dedup_within_watermark_stream"]
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    for name in names:
        base = {tuple(r) for r in specs[name].fn(spark, SF_DIR).collect()}
        prior = spark.conf.get(key, None)
        try:
            spark.conf.set(key, rocks)
            got = {tuple(r) for r in specs[name].fn(spark, SF_DIR).collect()}
        finally:
            if prior:
                spark.conf.set(key, prior)
            else:
                spark.conf.unset(key)
        assert got == base and len(base) > 0, name


# ---------------------------------------------------------------------------
# bench.py tail contract: per_query line precedes the final compact line
# ---------------------------------------------------------------------------


def test_bench_tail_emits_per_query_line_before_final_compact_line():
    """VERDICT r16 item 1 + the r4 tail lesson: the full per-query map
    rides its own JSON line; the LAST stdout line stays the compact,
    complete final payload (the driver records only the final 2000
    chars)."""
    sys.path.insert(0, REPO)
    from bench import tail_emission
    from dbt_fal_spark.bench_set import composite_names
    from dbt_fal_spark.registry import all_queries

    names = composite_names(all_queries())
    timings = {n: round(0.1 + i * 0.001, 3) for i, n in enumerate(names)}
    oracle = {n: round(0.05 + i * 0.001, 3) for i, n in enumerate(names)}
    final_payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "slowest": {},
    }
    lines = tail_emission(timings, oracle, "0.1", final_payload)
    parsed = [json.loads(ln) for ln in lines]
    # exactly one per_query line, directly before the final line
    assert parsed[-2]["metric"] == "per_query_timings"
    pq = parsed[-2]["per_query"]
    assert set(pq) == set(names)
    assert all(
        rec["engine_sec"] == timings[n] and rec["oracle_sec"] == oracle[n]
        for n, rec in pq.items()
    )
    # engine-only fallback: oracle side degrades per-entry, not per-line
    eng_only = json.loads(tail_emission(timings, {}, "0.1", final_payload)[0])
    assert all("oracle_sec" not in r for r in eng_only["per_query"].values())
    # the final line is LAST, compact, and never carries the big map
    final = parsed[-1]
    assert final["metric"] == "headline_queries_total_wall"
    assert "per_query" not in final
    # tail-window safety: the final line must fit the driver's 2000-char
    # record with room to spare; the per-query map (which does not) must
    # therefore never be merged into it
    assert len(lines[-1]) < 2000 < len(lines[-2])
    # the final line's size-budgeted `queries` map (the driver-contract
    # join key): a strict top-K-by-time prefix of the composite, exact
    # values, truncation flagged, and the whole line under budget
    top = final["queries"]
    assert 0 < len(top) < len(timings)
    assert final["queries_truncated_to_tail_budget"] is True
    ranked = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    assert top == {n: round(v, 3) for n, v in ranked[: len(top)]}
    assert len(lines[-1]) <= 1950
    # a small composite fits whole and is not flagged
    few = {n: t for n, t in list(timings.items())[:5]}
    small_final = json.loads(
        tail_emission(few, oracle, "0.1", final_payload)[-1]
    )
    assert set(small_final["queries"]) == set(few)
    assert small_final["queries_truncated_to_tail_budget"] is False


def test_paired_bench_picks_full_line_over_partial_tail_map():
    """tools/paired_bench.py must keep building FULL-width artifacts:
    the last stdout line now carries a partial `queries` map, so the
    picker prefers the full line (the only one with `oracle_queries`),
    falls back to a bare `queries` line (oracle_bench.py), then any
    JSON line."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from paired_bench import pick_record

    full = {"queries": {"a": 1.0, "b": 2.0}, "oracle_queries": {"a": 0.5}}
    partial_tail = {"metric": "headline_queries_total_wall", "queries": {"b": 2.0}}
    lines = [
        "not json",
        json.dumps(full),
        json.dumps({"metric": "per_query_timings", "per_query": {}}),
        json.dumps(partial_tail),
    ]
    assert pick_record(lines) == full
    # oracle_bench output: one line with bare queries
    ora = {"metric": "oracle", "queries": {"a": 0.4}}
    assert pick_record([json.dumps(ora)]) == ora
    # fallback: any JSON line
    assert pick_record([json.dumps({"metric": "x"})]) == {"metric": "x"}
    assert pick_record(["garbage"]) is None
