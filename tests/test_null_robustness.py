"""Null-robustness: production-scale corpora contain NULL text / NULL
embeddings; every operator must run (not crash in an Arrow stage or an
ANSI array index) with semantics matching its own oracle:

- DROP ops (explode-/pair-/Arrow-loop-based): null rows contribute
  nothing — split(NULL) → NULL → unnest/explode drops it in BOTH
  engines; a null embedding can reach no pair or neighbor list.
- SURVIVE ops (per-doc projections): the row is emitted with NULL
  metrics — the oracle's SELECT over documents emits it too.

The driver testdata has no nulls, so the oracle gate can never catch
the classic failures — np.array(list(...)) over a None, None.split()
in a batch loop, Spark's DESCENDING sequence(0, -1) indexing w[-1] on
a 1-token doc — which this file locks down.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_fal_spark.registry import all_queries

# null rows must be absent from the output's id columns
DROP_OPS = [
    "d_ngram_jaccard_pairs",
    "d_minhash_lsh_pairs",
    "d_lsh_levenshtein_refine",
    "d_containment_pairs",
    "d_winnow_neardup",
    "d_bloom_prefilter",
    "d_decontaminate",
    "d_dup_ngram_fraction",
    "t_tfidf_top_terms",
    "t_lm_surprise_fraction",
    "t_rolling_fingerprint",
    "t_top_bigrams",
    "t_vocab_coverage",
    "t_unk_replace",
    "d_embedding_neardup_pairs",
    "d_embedding_neardup_lsh",
    "s_knn_bruteforce",
    "s_knn_ivf",
    "s_knn_int8",
    "s_knn_lsh_bucketed",
    "s_knn_lsh_multitable",
    "s_label_centroid_distance",
    "m_decode_pipeline",
    "m_frame_sample",
    "m_chunk_dedup",
]
# the null row is emitted with NULL metrics (oracle-matching projection)
SURVIVE_OPS = [
    "d_exact_dedup",
    "d_keep_best_per_key",
    "d_simhash",
    "t_token_stats",
    "t_quality_score",
    "t_langid_naive",
    "t_fingerprint",
    "t_repetition_stats",
    "t_gopher_quality",
    "m_binary_metadata",
    "t_token_bpe",
    "t_pack_sequences",
]

NULL_DOC_IDS = {1, 5}
NULL_VEC_IDS = {1, 4, 6, 7, 8}  # null, null, NaN, Inf, null-element


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("nulls")
    texts = [
        "a b c d e f g h the a of", None, "", "g h i j k l the a of",
        "a b c d e f g h the a of", None, "m n o p q r s t u v w x",
        "single",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en", None, "en", "de", "en", "fr", "en", "en"]),
                "source": pa.array(["s0", "s1", None, "s0", "s1", "s0", "s1", "s0"]),
                "n_chars": pa.array([23, None, 0, 23, 23, None, 23, 6], pa.int64()),
            }
        ),
        os.path.join(str(out), "documents.parquet"),
    )
    vecs = [[float(i % 7) / 7 for i in range(64)], None, [0.2] * 64,
            [0.3] * 64, None, [0.1] * 64,
            [float("nan")] * 64, [float("inf")] + [0.1] * 63,
            # NULL element: exists() three-valued-logic trap — must be
            # dropped by BOTH engines (see similarity.FINITE_EMB)
            [0.1, None] + [0.1] * 62]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
            }
        ),
        os.path.join(str(out), "embeddings.parquet"),
    )
    return str(out)


_ID_COLS = {
    "doc_id": NULL_DOC_IDS,
    "train_doc_id": NULL_DOC_IDS,
    "bench_doc_id": NULL_DOC_IDS,
    "doc_a": NULL_DOC_IDS,
    "doc_b": NULL_DOC_IDS,
    "vec_id": NULL_VEC_IDS,
    "vec_a": NULL_VEC_IDS,
    "vec_b": NULL_VEC_IDS,
    "query_id": NULL_VEC_IDS,
    "neighbor_id": NULL_VEC_IDS,
}


@pytest.mark.parametrize("name", DROP_OPS)
def test_null_rows_dropped(spark, null_dir, name):
    df = all_queries()[name].fn(spark, null_dir)
    rows = df.collect()
    spark.catalog.clearCache()
    for col, bad in _ID_COLS.items():
        if col in df.columns:
            leaked = {r[col] for r in rows} & bad
            assert not leaked, f"{name}: null-origin rows leaked via {col}: {leaked}"


@pytest.mark.parametrize("name", SURVIVE_OPS)
def test_null_rows_survive_as_null_metrics(spark, null_dir, name):
    # contract: runs without crashing; per-doc projections keep the rows
    rows = all_queries()[name].fn(spark, null_dir).collect()
    spark.catalog.clearCache()
    assert rows


def test_single_token_doc_bigrams(spark, null_dir):
    """sequence(0, size-2) must not descend into w[-1] on 1-token docs
    (Spark's sequence(0,-1) = [0,-1]; DuckDB's generate_series = empty)."""
    rows = all_queries()["t_top_bigrams"].fn(spark, null_dir).collect()
    bigs = {r["bigram"] for r in rows}
    assert not any("single" in b for b in bigs)


# --- oracle parity ON null/non-finite corpora -------------------------------

EMB_PARITY_OPS = [
    "d_embedding_neardup_lsh",
    "d_embedding_neardup_pairs",
    "s_knn_bruteforce",
    "s_knn_lsh_bucketed",
    "s_knn_lsh_multitable",
    "s_knn_ivf",
    "s_knn_int8",
    "s_label_centroid_distance",
    "s_text_vector_join",
]


@pytest.fixture(scope="module")
def capped_null_dir(tmp_path_factory):
    """64 finite vectors in ONE tight cluster (= exactly LSH_BUCKET_CAP)
    plus null/NaN/Inf rows: the invalid rows must NOT count toward any
    bucket cap in either engine — the review-flagged divergence where
    the oracle's CASE bucketed null rows into bucket 0 and tipped the
    cap."""
    import numpy as np

    out = tmp_path_factory.mktemp("capped_nulls")
    rng = np.random.default_rng(5)
    center = rng.standard_normal(64).astype(np.float32)
    vecs = [list(center + rng.standard_normal(64).astype(np.float32) * 0.005)
            for _ in range(64)]
    vecs += [None, [float("nan")] * 64, [float("inf")] + [0.1] * 63,
             [0.1, None] + [0.1] * 62]  # null-element vector, also invalid
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
            }
        ),
        os.path.join(str(out), "embeddings.parquet"),
    )
    texts = [f"doc {i} words here" for i in range(len(vecs))]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(vecs)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(vecs)),
                "source": pa.array(["s0"] * len(vecs)),
                "n_chars": pa.array([10] * len(vecs), pa.int64()),
            }
        ),
        os.path.join(str(out), "documents.parquet"),
    )
    return str(out)


@pytest.mark.parametrize("name", EMB_PARITY_OPS)
def test_embedding_oracle_parity_with_invalid_rows(spark, capped_null_dir, name):
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import duckdb
    from check import pandas_rows, table_digest

    spec = all_queries()[name]
    got = spec.fn(spark, capped_null_dir).toPandas()
    spark.catalog.clearCache()
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{capped_null_dir}/{t}.parquet'"
        )
    exp = con.execute(spec.oracle).df()
    con.close()
    assert table_digest(list(got.columns), pandas_rows(got)) == table_digest(
        list(exp.columns), pandas_rows(exp)
    )
