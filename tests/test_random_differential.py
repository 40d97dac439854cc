"""Random-corpus Spark↔DuckDB differential tests for the dedup/text/
similarity families, at the CAP BOUNDARIES the fixed testdata never
hits.

Each seed builds a fresh documents/embeddings corpus with engineered
degenerate shapes — an identical-doc cluster two over LSH_BUCKET_CAP, a
hot shingle in exactly SHINGLE_DOC_CAP+1 docs next to one at exactly
the cap, equal-length tie rows for canonical selection, a tight
embedding cluster plus an exact-duplicate vector — then runs every
op's Spark implementation AND its own registry oracle on the same
parquet and requires the driver-protocol digests to match
(tools/check.py's exact norm/digest code, imported, not copied).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check import pandas_rows, table_digest  # noqa: E402

from dbt_fal_spark.operators.dedup import LSH_BUCKET_CAP, SHINGLE_DOC_CAP
from dbt_fal_spark.registry import all_queries

VOCAB = [f"w{i}" for i in range(48)]

OPS = [
    "d_exact_dedup",
    "d_keep_best_per_key",
    "d_ngram_jaccard_pairs",
    "d_minhash_lsh_pairs",
    "d_lsh_levenshtein_refine",
    "d_containment_pairs",
    "d_simhash",
    "d_bloom_prefilter",
    "d_decontaminate",
    "d_dup_ngram_fraction",
    "t_tfidf_top_terms",
    "d_embedding_neardup_pairs",
    "d_embedding_neardup_lsh",
    "s_knn_bruteforce",
    "s_knn_lsh_multitable",
]


def _build_corpus(seed: int, out: str) -> None:
    rng = random.Random(seed)

    def soup(n):
        return " ".join(rng.choice(VOCAB) for _ in range(n))

    texts: list[str] = []
    # word-soup base (ids 0.. cover the bloom bench range doc_id < 50)
    for _ in range(60):
        texts.append(soup(rng.randint(4, 50)))
    # identical-doc cluster TWO OVER the bucket cap: every shingle/band
    # bucket it forms is degenerate and must be dropped whole
    dup = soup(30)
    texts.extend([dup] * (LSH_BUCKET_CAP + 2))
    # hot shingle straddling SHINGLE_DOC_CAP: "h0 h1 h2" in cap+1 docs
    # (dropped), "g0 g1 g2" in exactly cap docs (kept)
    for i in range(SHINGLE_DOC_CAP + 1):
        texts.append(f"h0 h1 h2 {soup(6)}")
    for i in range(SHINGLE_DOC_CAP):
        texts.append(f"g0 g1 g2 {soup(6)}")
    # a near-dup pair (one word changed) and a containment pair
    base = soup(40)
    texts.append(base)
    texts.append(base.replace(base.split()[5], "zz", 1))
    texts.append(base + " " + soup(25))  # contains base
    rng.shuffle(texts)

    langs = ["en", "de", "fr"]
    sources = ["s0", "s1"]
    n = len(texts)
    n_chars = [len(t) for t in texts]
    # equal-n_chars ties inside one (source, lang) group: canonical
    # selection must tie-break on doc_id identically in both engines
    for i in range(0, min(8, n)):
        n_chars[i] = 100
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % 3] for i in range(n)]),
            "source": pa.array([sources[i % 2] for i in range(n)]),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))

    nprng = np.random.default_rng(seed)
    vecs = nprng.standard_normal((50, 64)).astype(np.float32)
    # tight cluster: 8 jittered copies of one vector (cosine ≈ 1)
    center = nprng.standard_normal(64).astype(np.float32)
    for i in range(8):
        vecs[10 + i] = center + nprng.standard_normal(64).astype(np.float32) * 0.01
    vecs[30] = vecs[31]  # exact duplicate pair
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([int(i % 5) for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))


@pytest.fixture(scope="module", params=[11, 47])
def rand_dir(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"randdiff_{request.param}")
    _build_corpus(request.param, str(out))
    return str(out)


@pytest.fixture(scope="module")
def rand_oracle(rand_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(rand_dir, t + '.parquet')}'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", OPS)
def test_random_corpus_matches_registry_oracle(spark, rand_dir, rand_oracle, name):
    spec = all_queries()[name]
    got = spec.fn(spark, rand_dir)
    got_pdf = got.toPandas()
    spark.catalog.clearCache()
    exp_pdf = rand_oracle.execute(spec.oracle).df()
    d_got = table_digest(list(got_pdf.columns), pandas_rows(got_pdf))
    d_exp = table_digest(list(exp_pdf.columns), pandas_rows(exp_pdf))
    assert sorted(got_pdf.columns) == sorted(exp_pdf.columns)
    assert d_got == d_exp, (
        f"{name}: digest mismatch — spark {len(got_pdf)} rows, "
        f"oracle {len(exp_pdf)} rows"
    )
