"""Behavioral semantics of the curation operators on a controlled
corpus — the oracle equivalence tests (test_operators.py) prove
engine-vs-engine agreement; these pin the MEANING: exact duplicates
score dup_frac 1.0, unique docs 0.0, singleton tokens get <unk>'d,
degenerate repetition maxes the repetition signals.
"""

from __future__ import annotations

import pandas as pd
import pytest

from dbt_fal_spark.operators.curation import (
    MIN_WORDS,
    SHINGLE_K,
    d_dup_ngram_fraction,
    t_gopher_quality,
    t_repetition_stats,
    t_unk_replace,
)

UNIQUE_TAIL = "zeta eta theta iota kappa lam mu nu xi omicron pi rho"
DOCS = [
    # 0 and 1: identical 13-word docs -> every shingle duplicated
    (0, "alpha beta gamma delta epsilon " + UNIQUE_TAIL.replace("zeta", "zz")),
    (1, "alpha beta gamma delta epsilon " + UNIQUE_TAIL.replace("zeta", "zz")),
    # 2: fully unique words -> no shingle appears elsewhere
    (2, "one two three four five six seven eight nine ten eleven twelve"),
    # 3: shares doc 0's first 8 words, then diverges into unique words
    (3, "alpha beta gamma delta epsilon zz eta theta foo bar baz qux quux"),
    # 4: shorter than SHINGLE_K words -> emits no shingles
    (4, "tiny doc here"),
    # 5: degenerate repetition
    (5, "spam spam spam spam spam spam spam spam spam spam"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("curation_corpus")
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in DOCS],
            "text": [t for _, t in DOCS],
            "lang": ["en"] * len(DOCS),
            "source": ["src0"] * len(DOCS),
            "n_chars": [len(t) for _, t in DOCS],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    return str(out)


def test_dup_ngram_fraction_semantics(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in d_dup_ngram_fraction(spark, corpus_dir).collect()}
    # identical docs: every shingle seen in >=2 docs
    assert rows[0]["dup_frac"] == 1.0 and rows[1]["dup_frac"] == 1.0
    # unique doc: nothing shared
    assert rows[2]["dup_frac"] == 0.0
    # partial overlap: doc 3 shares its first 8 words with docs 0/1 ->
    # exactly 8-K+1 duplicated shingles of its len-K+1 total
    n_shared = 8 - SHINGLE_K + 1
    assert rows[3]["n_dup_shingles"] == n_shared
    assert 0.0 < rows[3]["dup_frac"] < 1.0
    # sub-K doc emits nothing
    assert 4 not in rows
    # degenerate doc: its only distinct shingle is self-repeated, not
    # cross-document -> 1 shingle, 0 duplicated
    assert rows[5]["n_shingles"] == 1 and rows[5]["n_dup_shingles"] == 0


def test_unk_replace_semantics(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in t_unk_replace(spark, corpus_dir).collect()}
    # token counts preserved exactly (rewrite is positional)
    for doc_id, text in DOCS:
        assert len(rows[doc_id]["text_clean"].split(" ")) == len(text.split(" "))
    # doc 2's words are all corpus-singletons -> fully <unk>'d
    assert set(rows[2]["text_clean"].split(" ")) == {"<unk>"}
    assert rows[2]["n_replaced"] == len(DOCS[2][1].split(" "))
    # docs 0/1 are identical -> every token has freq >=2 -> untouched
    assert rows[0]["text_clean"] == DOCS[0][1] and rows[0]["n_replaced"] == 0
    # doc 5: 'spam' x10 -> freq 10, untouched
    assert rows[5]["n_replaced"] == 0
    # doc 3: shared prefix kept, unique tail words replaced in place
    got = rows[3]["text_clean"].split(" ")
    assert got[:8] == DOCS[3][1].split(" ")[:8]
    assert got[8:13] == ["<unk>"] * 5


def test_repetition_stats_semantics(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in t_repetition_stats(spark, corpus_dir).collect()}
    r5 = rows[5]
    assert r5["ttr"] == pytest.approx(0.1)
    assert r5["top_token_frac"] == 1.0
    assert r5["dup_bigram_frac"] == pytest.approx(1.0 - 1.0 / 9.0)
    # all-distinct doc: ttr 1, top fraction 1/n, no duplicate bigrams
    r2 = rows[2]
    assert r2["ttr"] == 1.0
    assert r2["top_token_frac"] == pytest.approx(1.0 / r2["n_tokens"])
    assert r2["dup_bigram_frac"] == 0.0


def test_gopher_quality_semantics(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in t_gopher_quality(spark, corpus_dir).collect()}
    # 3-word doc fails the token-count gate and the conjunction
    assert not rows[4]["flag_n_tokens"] and not rows[4]["passes"]
    assert rows[4]["n_tokens"] == 3 < MIN_WORDS
    # every fixture doc lacks 2 stopword hits -> stopword gate fails,
    # which must veto passes even where other gates hold
    assert all(not r["passes"] for r in rows.values())


def test_chunk_dedup_handles_empty_text(spark, tmp_path):
    """Zero-length blobs must yield no chunks (DuckDB semantics), not a
    Spark sequence(1, 0, 64) IllegalArgumentException."""
    import pandas as pd

    from dbt_fal_spark.operators.multimodal import m_chunk_dedup

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["", "alpha beta " * 20],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [0, 220],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r["doc_id"]: r for r in m_chunk_dedup(spark, str(tmp_path)).collect()}
    assert 0 not in rows  # empty doc emits no chunks
    assert rows[1]["n_chunks"] >= 1
