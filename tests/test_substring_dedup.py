"""Ground truth for the exact substring-level dedup family
(d_substring_spans / d_substring_dup_fraction / d_substring_dedup_clean,
VERDICT r12 item 3 — Lee et al. 2022 ExactSubstr semantics).

The oracle gate proves Spark and DuckDB agree; these prove the SHARED
semantics are right, against an independent pure-Python reference on
seeded random corpora engineered to contain verbatim copies, partial
copies, within-doc repeats, and span-free/degenerate docs. The family
has NO cap (every stage is linear — see the module comment in
curation.py), so the property tested is full equivalence, which is
strictly stronger than the capped-subset property the capped operators
carry.
"""

from __future__ import annotations

import random

import pandas as pd

from dbt_fal_spark.operators.curation import (
    SPAN_K,
    d_substring_dedup_clean,
    d_substring_dup_fraction,
    d_substring_spans,
)

VOCAB = [f"w{i}" for i in range(60)]


def make_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    n = rng.randint(8, 20)
    for i in range(n):
        length = rng.randint(1, 50)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(length))))
    # every corpus gets: an exact duplicate pair (full-coverage docs),
    # a doc embedding a verbatim chunk of doc 0 mid-text (partial span),
    # and a doc repeating its own first SPAN_K tokens (within-doc dup)
    docs.append((n, docs[0][1]))
    chunk = " ".join(docs[0][1].split(" ")[:SPAN_K + 3])
    pad = lambda m: " ".join(rng.choice(VOCAB) for _ in range(m))  # noqa: E731
    docs.append((n + 1, pad(7) + " " + chunk + " " + pad(7)))
    head = " ".join(docs[1][1].split(" ")[:SPAN_K])
    docs.append((n + 2, head + " " + pad(6) + " " + head))
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


def py_dup_positions(docs, k=SPAN_K):
    """Reference: duplicated k-gram start positions (1-based), a k-gram
    being duplicated iff it occurs >= 2 times corpus-wide (within-doc
    repeats included)."""
    from collections import Counter

    grams = {}
    for i, t in docs:
        w = t.split(" ")
        grams[i] = [" ".join(w[j : j + k]) for j in range(max(len(w) - k + 1, 0))]
    freq = Counter(g for gs in grams.values() for g in gs)
    return {
        i: [p + 1 for p, g in enumerate(gs) if freq[g] >= 2]
        for i, gs in grams.items()
    }


def py_spans(docs, k=SPAN_K):
    """Reference: merge overlapping/adjacent [pos, pos+k-1] intervals."""
    out = []
    for i, positions in py_dup_positions(docs, k).items():
        cur = None
        for p in positions:
            if cur is not None and p <= cur[1] + 1:
                cur = (cur[0], max(cur[1], p + k - 1))
            else:
                if cur is not None:
                    out.append((i, cur[0], cur[1], cur[1] - cur[0] + 1))
                cur = (p, p + k - 1)
        if cur is not None:
            out.append((i, cur[0], cur[1], cur[1] - cur[0] + 1))
    return sorted(out)


def py_clean(docs, k=SPAN_K):
    """Reference: text rebuilt from tokens outside every duplicated
    span; fully-covered docs drop out."""
    out = {}
    for i, t in docs:
        w = t.split(" ")
        covered = set()
        for p in py_dup_positions([d for d in docs], k)[i]:
            covered.update(range(p, p + k))
        kept = [tok for j, tok in enumerate(w, start=1) if j not in covered]
        if kept:
            out[i] = (" ".join(kept), len(kept), len(w) - len(kept))
    return out


def test_spans_match_reference(spark, tmp_path):
    for seed in (7, 23, 1009):
        docs = make_corpus(seed)
        sf = write_corpus(spark, tmp_path / str(seed), docs)
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in d_substring_spans(spark, sf).collect()
        )
        assert got == py_spans(docs), f"seed {seed}"
        spark.catalog.clearCache()


def test_dup_fraction_matches_reference_and_covers_all_docs(spark, tmp_path):
    docs = make_corpus(42)
    sf = write_corpus(spark, tmp_path, docs)
    rows = {r.doc_id: r for r in d_substring_dup_fraction(spark, sf).collect()}
    spark.catalog.clearCache()
    # EVERY doc reports (span-free docs report zeros) — the filtering
    # decision needs a row per doc
    assert set(rows) == {i for i, _ in docs}
    spans = py_spans(docs)
    for i, t in docs:
        n_tok = len(t.split(" "))
        dup = sum(s[3] for s in spans if s[0] == i)
        n_sp = sum(1 for s in spans if s[0] == i)
        r = rows[i]
        assert (r.n_tokens, r.dup_tokens, r.n_spans) == (n_tok, dup, n_sp)
        assert r.dup_fraction == dup / n_tok
    # the engineered exact-duplicate pair is fully covered
    dup_pair = [i for i, _ in docs[-3:-2]] + [0]
    for i in dup_pair:
        assert rows[i].dup_fraction == 1.0


def test_clean_matches_reference(spark, tmp_path):
    docs = make_corpus(99)
    sf = write_corpus(spark, tmp_path, docs)
    got = {
        r.doc_id: (r.text_clean, r.n_kept, r.n_removed)
        for r in d_substring_dedup_clean(spark, sf).collect()
    }
    spark.catalog.clearCache()
    assert got == py_clean(docs)
    # fully-duplicated docs (the exact pair) are absent from the output
    n = len(docs) - 3
    assert 0 not in got and n not in got


def test_degenerate_shapes(spark, tmp_path):
    """Docs shorter than SPAN_K emit no grams (and report zero dup);
    a corpus with no duplication at all yields no spans and cleans to
    itself."""
    docs = [
        (0, "a"),  # shorter than k
        (1, " ".join(f"u{i}" for i in range(12))),  # unique tokens
        (2, " ".join(f"v{i}" for i in range(SPAN_K - 1))),  # len k-1
    ]
    sf = write_corpus(spark, tmp_path, docs)
    assert d_substring_spans(spark, sf).count() == 0
    fr = {r.doc_id: r for r in d_substring_dup_fraction(spark, sf).collect()}
    assert all(fr[i].dup_tokens == 0 and fr[i].dup_fraction == 0.0 for i, _ in docs)
    cl = {r.doc_id: r.text_clean for r in d_substring_dedup_clean(spark, sf).collect()}
    assert cl == {i: t for i, t in docs}
    spark.catalog.clearCache()


def test_adjacent_islands_merge(spark, tmp_path):
    """Two dup k-grams whose intervals merely TOUCH (next start == prev
    end + 1) merge into one contiguous duplicated region."""
    k = SPAN_K
    a = " ".join(f"x{i}" for i in range(k))  # gram A
    b = " ".join(f"y{i}" for i in range(k))  # gram B, disjoint tokens
    filler = " ".join(f"f{i}" for i in range(8))
    docs = [
        (0, a + " " + b),  # A at 1..k, B at k+1..2k — touching intervals
        (1, a + " " + filler + " " + b),  # both grams occur again, apart
    ]
    sf = write_corpus(spark, tmp_path, docs)
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in d_substring_spans(spark, sf).collect()
    )
    spark.catalog.clearCache()
    # doc 0: one merged span covering all 2k tokens; doc 1: two spans
    assert (0, 1, 2 * k) in spans
    assert sum(1 for s in spans if s[0] == 0) == 1
    assert sum(1 for s in spans if s[0] == 1) == 2


# ---------------------------------------------------------------------------
# keep-first variant (r14): remove every k-gram occurrence EXCEPT the
# corpus-wide first (minimal (doc_id, pos)) — RefinedWeb's
# keep-one-canonical-copy stance vs Lee et al.'s cut-every-occurrence.
# ---------------------------------------------------------------------------


def py_keep_first_clean(docs, k=SPAN_K):
    """Reference: like py_clean, but a position is removed only when
    covered by a k-gram occurrence that is NOT its gram's first
    occurrence (first = lexicographic min (doc_id, pos))."""
    from collections import Counter

    grams = {}
    for i, t in docs:
        w = t.split(" ")
        grams[i] = [" ".join(w[j : j + k]) for j in range(max(len(w) - k + 1, 0))]
    freq = Counter(g for gs in grams.values() for g in gs)
    first = {}
    for i, gs in sorted(grams.items()):
        for p, g in enumerate(gs, start=1):
            if g not in first:
                first[g] = (i, p)
    out = {}
    for i, t in docs:
        w = t.split(" ")
        covered = set()
        for p, g in enumerate(grams[i], start=1):
            if freq[g] >= 2 and first[g] != (i, p):
                covered.update(range(p, p + k))
        kept = [tok for j, tok in enumerate(w, start=1) if j not in covered]
        if kept:
            out[i] = (" ".join(kept), len(kept), len(w) - len(kept))
    return out


def test_keep_first_matches_reference(spark, tmp_path):
    from dbt_fal_spark.operators.curation import d_substring_dedup_keep_first

    for seed in (7, 99, 1009):
        docs = make_corpus(seed)
        sf = write_corpus(spark, tmp_path / str(seed), docs)
        got = {
            r.doc_id: (r.text_clean, r.n_kept, r.n_removed)
            for r in d_substring_dedup_keep_first(spark, sf).collect()
        }
        spark.catalog.clearCache()
        assert got == py_keep_first_clean(docs), f"seed {seed}"


def test_keep_first_canonical_copy_survives(spark, tmp_path):
    """The engineered exact-duplicate pair (doc 0, doc n): keep-first
    preserves doc 0 VERBATIM (every gram's first occurrence is doc 0's)
    and drops doc n entirely; cut-every (dedup_clean) drops both. Also:
    keep-first never removes more than cut-every does, doc for doc."""
    from dbt_fal_spark.operators.curation import (
        d_substring_dedup_clean,
        d_substring_dedup_keep_first,
    )

    docs = make_corpus(42)
    n = len(docs) - 3
    sf = write_corpus(spark, tmp_path, docs)
    kf = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in d_substring_dedup_keep_first(spark, sf).collect()
    }
    ce = {
        r.doc_id: r.n_removed for r in d_substring_dedup_clean(spark, sf).collect()
    }
    spark.catalog.clearCache()
    assert kf[0] == (docs[0][1], 0)  # canonical copy intact
    assert n not in kf  # the later duplicate drops out
    assert 0 not in ce  # cut-every drops BOTH members of the pair
    for i, removed in kf.items():
        assert removed[1] <= ce.get(i, len(docs[i][1].split(" ")))


def test_keep_first_within_doc_repeat(spark, tmp_path):
    """A doc repeating its own leading k tokens keeps the FIRST
    occurrence and cuts the second (within-doc keep-first), when the
    gram occurs nowhere earlier in the corpus."""
    from dbt_fal_spark.operators.curation import d_substring_dedup_keep_first

    k = SPAN_K
    head = " ".join(f"h{i}" for i in range(k))
    filler = " ".join(f"f{i}" for i in range(6))
    docs = [(0, head + " " + filler + " " + head)]
    sf = write_corpus(spark, tmp_path, docs)
    rows = d_substring_dedup_keep_first(spark, sf).collect()
    spark.catalog.clearCache()
    assert len(rows) == 1
    r = rows[0]
    assert r.text_clean == head + " " + filler
    assert (r.n_kept, r.n_removed) == (2 * k + 6 - k, k)


def test_keep_first_degenerate_shapes(spark, tmp_path):
    """No duplication → keep-first cleans to identity, same as
    cut-every; sub-k docs pass through."""
    from dbt_fal_spark.operators.curation import d_substring_dedup_keep_first

    docs = [
        (0, "a"),
        (1, " ".join(f"u{i}" for i in range(12))),
        (2, " ".join(f"v{i}" for i in range(SPAN_K - 1))),
    ]
    sf = write_corpus(spark, tmp_path, docs)
    got = {
        r.doc_id: r.text_clean
        for r in d_substring_dedup_keep_first(spark, sf).collect()
    }
    spark.catalog.clearCache()
    assert got == {i: t for i, t in docs}
