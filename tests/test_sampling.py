"""Semantic invariants of the curation operators (the oracle gate in
test_operators.py already covers engine-parity; these pin the properties
that make the operators correct for their purpose)."""

from __future__ import annotations

from dbt_fal_spark.operators.sampling import (
    N_SHARDS,
    SAMPLE_PCT,
    SAMPLE_PCT_DEFAULT,
    TOKEN_BUDGET,
    t_pack_sequences,
    t_stratified_sample,
)
from tests.conftest import SF_DIR


def test_sample_is_stable_and_stratified(spark):
    a = {r["doc_id"] for r in t_stratified_sample(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in t_stratified_sample(spark, SF_DIR).collect()}
    assert a == b and a  # deterministic, non-empty
    # strata keep-rates land near their targets (hash-uniformity check)
    rows = t_stratified_sample(spark, SF_DIR).collect()
    from dbt_fal_spark.sources.readers import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    kept = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    for lang, n_kept in kept.items():
        target = SAMPLE_PCT.get(lang, SAMPLE_PCT_DEFAULT) / 100
        rate = n_kept / totals[lang]
        assert abs(rate - target) < 0.25, (lang, rate, target)


def test_packing_respects_budget_and_order(spark):
    rows = t_pack_sequences(spark, SF_DIR).collect()
    assert rows
    by_shard_bin: dict = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % N_SHARDS
        by_shard_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (shard, bin_id), members in by_shard_bin.items():
        fill = sum(m["n_tokens"] for m in members)
        # a bin exceeds the budget only as a single oversized doc
        assert fill <= TOKEN_BUDGET or len(members) == 1, (shard, bin_id, fill)
    # greedy is maximal: a bin's first doc never fits in the previous bin
    for shard in {r["shard"] for r in rows}:
        bins = sorted(
            (b for (s, b) in by_shard_bin if s == shard)
        )
        for prev_b, next_b in zip(bins, bins[1:]):
            prev_fill = sum(m["n_tokens"] for m in by_shard_bin[(shard, prev_b)])
            head = min(by_shard_bin[(shard, next_b)], key=lambda m: m["doc_id"])
            assert prev_fill + head["n_tokens"] > TOKEN_BUDGET
