"""Ground truth for the LM quality gate (t_lm_surprise_fraction,
CCNet-style perplexity filtering, integer-exact — r13).

The oracle gate proves Spark and DuckDB agree; these prove the SHARED
semantics are right, against an independent pure-Python bigram model on
seeded random corpora plus engineered edge docs (1-token, repeated-token,
out-of-distribution transitions). The gate has no cap and no float
reduction — the property tested is full equivalence.
"""

from __future__ import annotations

import random
from fractions import Fraction

import pandas as pd
import pytest

from dbt_fal_spark.operators.text import _LM_K, t_lm_surprise_fraction

VOCAB = [f"w{i}" for i in range(25)]


def make_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    n = rng.randint(8, 16)
    for i in range(n):
        length = rng.randint(1, 40)
        # skewed sampling so some transitions are common, others rare
        docs.append(
            (i, " ".join(rng.choice(VOCAB[: 5 + (j % 20)]) for j in range(length)))
        )
    # engineered edges: a 1-token doc (0 bigrams), a single repeated
    # token (one very-likely self-transition), and a doc walking the
    # vocab in a unique order (every transition rare)
    docs.append((n, VOCAB[0]))
    docs.append((n + 1, " ".join([VOCAB[1]] * 12)))
    docs.append((n + 2, " ".join(VOCAB[::-1])))
    return docs


def py_surprise(docs, k=_LM_K):
    """Independent reference: add-one bigram LM trained on the corpus,
    exact-rational probability compare (P < 1/k), per-doc occurrence
    fraction."""
    from collections import Counter

    c1: Counter = Counter()
    c2: Counter = Counter()
    for _, t in docs:
        w = t.split(" ")
        c1.update(w)
        c2.update(zip(w, w[1:]))
    v = len(c1)
    out = {}
    for i, t in docs:
        w = t.split(" ")
        pairs = list(zip(w, w[1:]))
        n_sur = sum(
            1
            for p in pairs
            if Fraction(c2[p] + 1, c1[p[0]] + v) < Fraction(1, k)
        )
        frac = Fraction(n_sur, len(pairs)) if pairs else Fraction(0)
        out[i] = (len(pairs), n_sur, frac)
    return out


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


@pytest.mark.parametrize("seed", [7, 40, 1913])
def test_matches_pure_python_model(spark, tmp_path, seed):
    docs = make_corpus(seed)
    sf_dir = write_corpus(spark, tmp_path, docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_surprising"], r["surprise_fraction"])
        for r in t_lm_surprise_fraction(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    want = py_surprise(docs)
    assert set(got) == set(want)
    for i, (nb, ns, frac) in want.items():
        gnb, gns, gfrac = got[i]
        assert (gnb, gns) == (nb, ns), f"doc {i}: counts {gnb, gns} != {nb, ns}"
        # the operator's double division is exact for these magnitudes
        assert gfrac == float(frac), f"doc {i}: fraction {gfrac} != {float(frac)}"


def test_engineered_edges(spark, tmp_path):
    docs = make_corpus(7)
    sf_dir = write_corpus(spark, tmp_path, docs)
    rows = {r["doc_id"]: r for r in t_lm_surprise_fraction(spark, sf_dir).collect()}
    spark.catalog.clearCache()
    n = max(i for i, _ in docs) - 2
    # 1-token doc: zero bigrams, fraction 0.0 — the row still gates
    assert rows[n]["n_bigrams"] == 0 and rows[n]["surprise_fraction"] == 0.0
    # self-repeating doc: its own 11 occurrences make the transition
    # common — nothing surprising
    assert rows[n + 1]["n_surprising"] == 0
    # unique-order vocab walk: note the add-one-smoothing subtlety this
    # doc exists to pin — a RARE first token makes the smoothed
    # P(w2|w1) = (c2+1)/(c1+V) LARGE (tiny denominator), so transitions
    # out of rare tokens are NOT surprising; only an unseen transition
    # out of a COMMON token can be. The contract is exact agreement
    # with the reference model, not a hand-waved ranking:
    want = py_surprise(docs)
    assert (
        rows[n + 2]["n_bigrams"], rows[n + 2]["n_surprising"]
    ) == want[n + 2][:2]
