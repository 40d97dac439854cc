"""Scale-cap semantics of the dedup family.

SHINGLE_DOC_CAP and LSH_BUCKET_CAP bound the one quadratic blowup a
100 TB corpus can hit (hot shingles / degenerate buckets). The caps are
part of the defined semantics (mirrored in the DuckDB oracles); these
tests pin the containment property that makes them safe to apply:
capping only ever REMOVES pairs — it never invents or rescores one.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from dbt_fal_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    SHINGLE_DOC_CAP,
    d_minhash_lsh_pairs,
    d_neardup_components,
    d_ngram_jaccard_pairs,
)


def _shingles(text: str) -> set[str]:
    w = text.split(" ")
    return {" ".join(t) for t in zip(w, w[1:], w[2:])}


def _exact_jaccard_pairs(docs: list[tuple[int, str]], threshold: float = 0.5):
    """Uncapped ground truth, computed independently in Python."""
    sets = {i: _shingles(t) for i, t in docs if len(t.split(" ")) >= 3}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if not inter:
            continue
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= threshold:
            out[(a, b)] = j
    return out


@pytest.fixture(scope="module")
def capped_corpus_dir(spark, tmp_path_factory):
    """documents.parquet containing both blowups:

    - a hot shingle ("alpha beta gamma") present in SHINGLE_DOC_CAP+16
      docs whose remaining text is unique filler,
    - a duplicate cluster of LSH_BUCKET_CAP+6 identical docs,
    - two genuine near-dup pairs that must survive both caps.
    """
    rows = []
    hot = "alpha beta gamma"
    for i in range(SHINGLE_DOC_CAP + 16):
        filler = " ".join(f"u{i}w{j}" for j in range(8))
        rows.append((1000 + i, f"{hot} {filler}"))
    big = "dup cluster body " + " ".join(f"c{j}" for j in range(10))
    for i in range(LSH_BUCKET_CAP + 6):
        rows.append((2000 + i, big))
    # surviving near-dup pairs: high overlap, unique vocabulary
    rows.append((1, "quick brown fox jumps over the lazy dog tonight"))
    rows.append((2, "quick brown fox jumps over the lazy dog today"))
    rows.append((3, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    rows.append((4, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "test",
            "embedding": None,
        }
    )
    d = tmp_path_factory.mktemp("capped_sf")
    pdf[["doc_id", "text", "lang", "source"]].to_parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_capped_jaccard_is_subset_of_exact(spark, capped_corpus_dir):
    sf_dir, rows = capped_corpus_dir
    exact = _exact_jaccard_pairs(rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in d_ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    # containment: nothing is invented, and surviving pairs keep a score
    # <= their exact value (numerator can only shrink under the cap)
    for pair, j in got.items():
        assert pair in exact
        assert j <= exact[pair] + 1e-12
    # pairs with no frequent shingle are untouched, identical score
    assert got[(1, 2)] == pytest.approx(exact[(1, 2)])
    assert got[(3, 4)] == pytest.approx(exact[(3, 4)])
    # hot-shingle-only pairs are gone: doc pairs 1000.. share ONLY the hot
    # 3-gram, whose jaccard would be < 0.5 anyway; the dup cluster (2000..)
    # still surfaces here (its shingles are in cap+6 docs > cap? yes —
    # every shingle of the identical cluster exceeds the cap, so none meet)
    assert not any(1000 <= a < 2000 and 1000 <= b < 2000 for a, b in got)
    assert not any(2000 <= a < 3000 for a, b in got)


def test_lsh_bucket_cap_drops_degenerate_cluster_only(spark, capped_corpus_dir):
    sf_dir, rows = capped_corpus_dir
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in d_minhash_lsh_pairs(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    # the giant identical cluster never emits pairs (every band bucket
    # holds cap+6 members)...
    assert not any(2000 <= a < 3000 for a, b in pairs)
    # ...while small duplicate pairs keep surfacing
    assert (3, 4) in pairs
    # and no pair exists that does not share at least one band signature
    # in the UNCAPPED world (subset of exact candidates): identical docs
    # always collide, distinct-vocabulary docs collide with prob ~2^-128
    for a, b in pairs:
        texts = dict((i, t) for i, t in rows)
        assert _shingles(texts[a]) & _shingles(texts[b])


def test_components_exclude_capped_cluster(spark, capped_corpus_dir):
    sf_dir, rows = capped_corpus_dir
    comp = {
        r["doc_id"]: (r["canonical_id"], r["component_size"])
        for r in d_neardup_components(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    # every doc is labeled
    assert set(comp) == {i for i, _ in rows}
    # the capped giant cluster degenerates to singletons (edges cut on
    # both engine and oracle sides alike)
    for i, _ in rows:
        if 2000 <= i < 3000:
            assert comp[i] == (i, 1)
    # genuine small dup pairs still merge
    assert comp[4][0] == 3 and comp[3][1] == 2


def _exact_containment_pairs(docs, threshold=0.8):
    """Uncapped containment ground truth, independent Python."""
    sets = {i: _shingles(t) for i, t in docs if len(t.split(" ")) >= 3}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if not inter:
            continue
        c = inter / min(len(sets[a]), len(sets[b]))
        if c >= threshold:
            out[(a, b)] = c
    return out


def test_capped_containment_is_subset_of_exact(spark, capped_corpus_dir):
    """The bucket-emission plan (groupBy shingle -> capped doc list ->
    ordered-pair HOF) must honor the same cap contract as the join
    formulation it replaced: capping only removes pairs."""
    from dbt_fal_spark.operators.dedup import d_containment_pairs

    sf_dir, rows = capped_corpus_dir
    exact = _exact_containment_pairs(rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in d_containment_pairs(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    for pair, c in got.items():
        assert pair in exact
        assert c <= exact[pair] + 1e-12
    # clean duplicate pairs keep their exact (1.0) containment
    assert got[(3, 4)] == pytest.approx(exact[(3, 4)])
    # the giant identical cluster is capped out entirely
    assert not any(2000 <= a < 3000 for a, b in got)


def test_minhash_estimate_tracks_exact_jaccard(spark, capped_corpus_dir):
    """Estimator accuracy (the MinHash analogue of test_sketch's HLL
    accuracy contract): for every emitted pair, the 16-permutation
    agreement estimate must sit within 3σ of the exact Jaccard
    (σ = sqrt(j(1−j)/16) ≈ 0.125 at j=0.5) — a hash-mixing or
    permutation bug would blow this immediately, while staying
    invisible to the engine-vs-oracle equivalence check (both engines
    would compute the same wrong estimate)."""
    sf_dir, rows = capped_corpus_dir
    sets = {i: _shingles(t) for i, t in rows if len(t.split(" ")) >= 3}
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in d_minhash_lsh_pairs(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert got, "no pairs emitted"
    for (a, b), est in got.items():
        inter = len(sets[a] & sets[b])
        exact = inter / (len(sets[a]) + len(sets[b]) - inter)
        sigma = max((exact * (1 - exact) / 16) ** 0.5, 1e-9)
        assert abs(est - exact) <= 3 * sigma + 1e-9, (a, b, est, exact)
    # identical docs estimate exactly 1.0 (all 16 minima agree)
    assert got[(3, 4)] == 1.0


def _winnow_fps(text: str) -> set[int]:
    """Uncapped ground-truth fingerprint set, independent Python."""
    k, base, mod, sample = 8, 257, 2147483647, 64
    out = set()
    for i in range(len(text) - k + 1):
        h = 0
        for c in text[i : i + k]:
            h = (h * base + ord(c)) % mod
        if h % sample == 0:
            out.add(h)
    return out


def _exact_winnow_pairs(docs, min_shared=3):
    fps = {i: _winnow_fps(t) for i, t in docs}
    out = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        n = len(fps[a] & fps[b])
        if n >= min_shared:
            out[(a, b)] = n
    return out


@pytest.fixture(scope="module")
def winnow_corpus_dir(spark, tmp_path_factory):
    """Long docs (winnowing samples ~1/64 of char windows, so shared
    fingerprints need thousands of shared chars): a dup cluster of
    _WN_DOC_CAP+6 identical bodies plus one genuine near-dup pair."""
    from dbt_fal_spark.operators.dedup import _WN_DOC_CAP

    body = " ".join(f"word{j}alpha{j % 7}" for j in range(220))  # ~2.9k chars
    rows = [(2000 + i, body) for i in range(_WN_DOC_CAP + 6)]
    common = " ".join(f"tok{j}beta{j % 5}" for j in range(220))
    rows.append((1, common + " unique ending one here"))
    rows.append((2, common + " a different closing run"))
    rows.append((3, "short unrelated text that shares nothing at all"))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "test",
        }
    )
    d = tmp_path_factory.mktemp("winnow_sf")
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_capped_winnow_is_subset_of_exact(spark, winnow_corpus_dir):
    """_WN_DOC_CAP contract (same as SHINGLE_DOC_CAP's): dropping
    over-cap fingerprint buckets only removes pairs / shrinks counts —
    never invents a pair — and pairs built purely from rare
    fingerprints keep their exact shared count."""
    from dbt_fal_spark.operators.dedup import d_winnow_neardup

    sf_dir, rows = winnow_corpus_dir
    exact = _exact_winnow_pairs(rows)
    # fixture sanity: the near-dup pair really shares >= 3 sampled prints
    assert exact.get((1, 2), 0) >= 3
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_fingerprints"]
        for r in d_winnow_neardup(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    for pair, n in got.items():
        assert pair in exact
        assert n <= exact[pair]
    # the over-cap identical cluster emits NOTHING (every fingerprint
    # bucket holds cap+6 docs)
    assert not any(2000 <= a < 3000 for a, b in got)
    # the rare-fingerprint near-dup pair survives with its exact count
    assert got[(1, 2)] == exact[(1, 2)]


def test_embedding_exact_pairs_corpus_guard(spark, monkeypatch):
    """d_embedding_neardup_pairs refuses full-corpus quadratic work
    (VERDICT r11 finding 2): above EMB_EXACT_MAX_ROWS vectors it raises
    pointing at the subquadratic LSH sibling, unless exact=True opts in.
    Under the cap the behavior is unchanged."""
    import pytest

    import dbt_fal_spark.operators.dedup as D
    from tests.conftest import SF_DIR

    # under the cap: runs fine (default cap is far above any test SF)
    n_ok = D.d_embedding_neardup_pairs(spark, SF_DIR).count()
    assert n_ok >= 0

    # simulate an over-cap corpus: the guard fires before any tile work
    monkeypatch.setattr(D, "EMB_EXACT_MAX_ROWS", 1)
    with pytest.raises(ValueError, match=r"d_embedding_neardup_lsh"):
        D.d_embedding_neardup_pairs(spark, SF_DIR)
    # explicit opt-in bypasses the guard and matches the default result
    assert D.d_embedding_neardup_pairs(spark, SF_DIR, exact=True).count() == n_ok
