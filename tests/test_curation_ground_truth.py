"""Random-corpus ground truth for the curation operators.

The oracle tests prove Spark and DuckDB agree; these prove the SHARED
semantics are right, by comparing the distributed implementation
against independent ~15-line pure-Python reference implementations on
seeded random word-soup corpora (different sizes, duplication rates,
and degenerate shapes each seed).
"""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
import pytest

from dbt_fal_spark.operators.curation import (
    SHINGLE_K,
    d_dup_ngram_fraction,
    t_repetition_stats,
    t_unk_replace,
)

VOCAB = [f"w{i}" for i in range(40)]


def make_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    n = rng.randint(8, 25)
    for i in range(n):
        length = rng.randint(1, 60)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(length))))
    # exact duplicate pair + a partial copy, every corpus
    docs.append((n, docs[0][1]))
    docs.append((n + 1, docs[0][1] + " " + " ".join(rng.choice(VOCAB) for _ in range(10))))
    return docs


def write_corpus(spark, tmp_path, docs):
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for _, t in docs],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def py_dup_ngram(docs):
    shingles = {}
    for i, t in docs:
        w = t.split(" ")
        if len(w) >= SHINGLE_K:
            shingles[i] = {
                " ".join(w[j : j + SHINGLE_K]) for j in range(len(w) - SHINGLE_K + 1)
            }
    df = Counter(s for ss in shingles.values() for s in ss)
    return {
        i: (len(ss), sum(1 for s in ss if df[s] >= 2)) for i, ss in shingles.items()
    }


def py_unk_replace(docs):
    freq = Counter(tok for _, t in docs for tok in t.split(" "))
    out = {}
    for i, t in docs:
        toks = ["<unk>" if freq[tok] == 1 else tok for tok in t.split(" ")]
        out[i] = (" ".join(toks), sum(1 for tok in t.split(" ") if freq[tok] == 1))
    return out


def py_repetition(docs):
    out = {}
    for i, t in docs:
        w = t.split(" ")
        c = Counter(w)
        bigrams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        dup_bi = 0.0 if len(w) < 2 else 1.0 - len(set(bigrams)) / len(bigrams)
        out[i] = (len(w), len(c) / len(w), max(c.values()) / len(w), dup_bi)
    return out


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_dup_ngram_matches_python_ground_truth(spark, tmp_path, seed):
    docs = make_corpus(seed)
    sf = write_corpus(spark, tmp_path, docs)
    exp = py_dup_ngram(docs)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"])
        for r in d_dup_ngram_fraction(spark, sf).collect()
    }
    assert got == exp


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_unk_replace_matches_python_ground_truth(spark, tmp_path, seed):
    docs = make_corpus(seed)
    sf = write_corpus(spark, tmp_path, docs)
    exp = py_unk_replace(docs)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_replaced"])
        for r in t_unk_replace(spark, sf).collect()
    }
    assert got == exp


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_repetition_stats_matches_python_ground_truth(spark, tmp_path, seed):
    docs = make_corpus(seed)
    sf = write_corpus(spark, tmp_path, docs)
    exp = py_repetition(docs)
    for r in t_repetition_stats(spark, sf).collect():
        n, ttr, top, dupbi = exp[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["ttr"] == pytest.approx(ttr)
        assert r["top_token_frac"] == pytest.approx(top)
        assert r["dup_bigram_frac"] == pytest.approx(dupbi)
