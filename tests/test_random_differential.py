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
    # full documents-family sweep
    "d_winnow_neardup",
    "t_token_stats",
    "t_token_bpe",
    "t_quality_score",
    "t_langid_naive",
    "t_lang_profile",
    "t_fingerprint",
    "t_rolling_fingerprint",
    "t_top_bigrams",
    "t_vocab_coverage",
    "t_unk_replace",
    "t_stratified_sample",
    "t_repetition_stats",
    "t_gopher_quality",
    # r13 families: the identical-doc cluster + hot-shingle shapes are
    # heavy substring-duplication corpora, and the skewed word soup
    # gives the LM gate a full common/rare transition spectrum
    "d_substring_spans",
    "d_substring_dup_fraction",
    "d_substring_dedup_clean",
    "t_lm_surprise_fraction",
    "t_domain_mix_sample",
    "m_binary_metadata",
    "m_decode_pipeline",
    "m_frame_sample",
    "m_chunk_dedup",
    "s_knn_ivf",
    "s_knn_int8",
    "s_knn_lsh_bucketed",
    "s_label_centroid_distance",
    "s_text_vector_join",
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
    # whitespace edges: split-on-space yields EMPTY tokens for doubled /
    # leading / trailing spaces in BOTH engines — these docs push empty
    # tokens through every shingle/token/hash path
    texts.append("a  b   c " + soup(5))
    texts.append(" leading")
    texts.append("single")
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


# --- events family ----------------------------------------------------------

EVENT_OPS = [
    "e_sessionize",
    "e_asof_purchase_attribution",
    "e_purchase_gap_stats",
    "e_daily_active_users",
    "e_funnel_conversion",
    "e_hourly_rollup",
    # e_rolling_7d_revenue reads ORDERS, not events — outside this harness
    "e_forecast_daily_by_type",
    "e_json_props_stats",
    "e_anomaly_events",
    "e_user_activity_pivot",
]


def _build_events(seed: int, out: str) -> None:
    """Random event stream with engineered boundary shapes: session gaps
    EXACTLY at the threshold, same-timestamp as-of ties, same-timestamp
    same-user duplicate events, and day-boundary-midnight rows."""
    import pandas as pd

    rng = random.Random(seed + 1000)
    types = ["click", "signup", "error", "view", "purchase"]
    rows = []
    eid = 0

    def add(ts, user, etype, value=None):
        nonlocal eid
        eid += 1
        rows.append(
            (
                eid,
                pd.Timestamp(ts),
                user,
                etype,
                value if value is not None else round(rng.uniform(0.5, 100.0), 2),
                '{"k": %d}' % rng.randint(0, 99),
            )
        )

    base = pd.Timestamp("2024-01-01 00:00:00")
    for _ in range(260):
        add(
            base
            + pd.Timedelta(
                seconds=rng.randint(0, 29 * 24 * 3600), microseconds=rng.randint(0, 999999)
            ),
            rng.randint(1, 6),
            rng.choice(types),
        )
    # session-gap boundary: consecutive events exactly 30:00 apart (the
    # classic sessionize threshold) and one microsecond either side
    t0 = pd.Timestamp("2024-01-05 08:00:00")
    add(t0, 7, "click")
    add(t0 + pd.Timedelta(minutes=30), 7, "click")
    add(t0 + pd.Timedelta(minutes=60, microseconds=1), 7, "click")
    # as-of tie: click at the EXACT purchase timestamp plus an earlier one
    tp = pd.Timestamp("2024-01-10 12:00:00")
    add(tp - pd.Timedelta(minutes=5), 8, "click")
    add(tp, 8, "click")
    add(tp, 8, "purchase", value=50.0)
    # duplicate (user, ts) rows and a midnight row
    tdup = pd.Timestamp("2024-01-12 00:00:00")
    add(tdup, 9, "view")
    add(tdup, 9, "view")
    add(tdup, 9, "purchase", value=10.0)
    # single-day event_type: degenerate least-squares group (zero
    # denominator) — both engines must emit the IEEE NULL/NaN forecast
    add(pd.Timestamp("2024-01-15 09:00:00"), 4, "flash")
    add(pd.Timestamp("2024-01-15 10:00:00"), 5, "flash")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(out, "events.parquet"), index=False)


@pytest.fixture(scope="module", params=[5, 83])
def rand_events_dir(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"randev_{request.param}")
    _build_events(request.param, str(out))
    return str(out)


@pytest.fixture(scope="module")
def rand_events_oracle(rand_events_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(rand_events_dir, 'events.parquet')}'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_OPS)
def test_random_events_match_registry_oracle(spark, rand_events_dir, rand_events_oracle, name):
    spec = all_queries()[name]
    got_pdf = spec.fn(spark, rand_events_dir).toPandas()
    spark.catalog.clearCache()
    exp_pdf = rand_events_oracle.execute(spec.oracle).df()
    assert sorted(got_pdf.columns) == sorted(exp_pdf.columns)
    d_got = table_digest(list(got_pdf.columns), pandas_rows(got_pdf))
    d_exp = table_digest(list(exp_pdf.columns), pandas_rows(exp_pdf))
    assert d_got == d_exp, (
        f"{name}: digest mismatch — spark {len(got_pdf)} rows, "
        f"oracle {len(exp_pdf)} rows"
    )


# --- orders family (percentile/tie boundaries) ------------------------------

ORDERS_OPS = [
    "q_orders_daily_pivot",
    "q_customer_running_total",
    "q_priority_distinct_customers",
    "q_cube_status_priority",
    "q_paginate_orders",
    "q_profile_orders",
    "q_grouping_sets_revenue",
    "q_first_last_order_value",
    "q_pivot_priority_by_status",
    "q_status_set_per_priority",
    "q_revenue_trend_by_priority",
    "q_order_date_parts",
    "q_histogram_totalprice",
    "q_range_join_price_band",
    "q_mad_outlier_orders",
    "q_conditional_aggs",
    "e_rolling_7d_revenue",
    "q_repeat_customers_intersect",
    "q_date_filter_projection",
]


def _build_orders(seed: int, out: str) -> None:
    """Random orders with the tie/boundary shapes percentile, windowed,
    and histogram queries are most likely to diverge on: repeated
    totalprice values (quantile interpolation ties), several orders per
    (customer, date) (running-total / first-last ties), histogram
    bucket-edge prices, and a duplicated calendar day across statuses."""
    import pandas as pd

    rng = random.Random(seed + 2000)
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    key = 0

    def add(cust, date, price, status=None, prio=None):
        nonlocal key
        key += 1
        rows.append(
            (
                key,
                cust,
                status or rng.choice(statuses),
                float(price),
                pd.Timestamp(date),
                prio or rng.choice(prios),
            )
        )

    base = pd.Timestamp("1995-01-01")
    for _ in range(220):
        add(
            rng.randint(1, 25),
            base + pd.Timedelta(days=rng.randint(0, 2000)),
            round(rng.uniform(1000, 499999), 2),
        )
    # repeated price — quantile/median ties across engines
    for _ in range(9):
        add(rng.randint(1, 25), base + pd.Timedelta(days=rng.randint(0, 2000)), 250000.0)
    # same (customer, date) multiple orders — running-total / first-last ties
    d = base + pd.Timedelta(days=700)
    for p in (111.11, 222.22, 333.33):
        add(3, d, p)
    # histogram bucket edges (q_histogram buckets are price-range based)
    for p in (1000.0, 100000.0, 250000.0, 499999.99):
        add(rng.randint(1, 25), base + pd.Timedelta(days=rng.randint(0, 2000)), p)
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(out, "orders.parquet"), index=False)


@pytest.fixture(scope="module", params=[3, 59])
def rand_orders_dir(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"randord_{request.param}")
    _build_orders(request.param, str(out))
    return str(out)


@pytest.fixture(scope="module")
def rand_orders_oracle(rand_orders_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{os.path.join(rand_orders_dir, 'orders.parquet')}'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORDERS_OPS)
def test_random_orders_match_registry_oracle(spark, rand_orders_dir, rand_orders_oracle, name):
    spec = all_queries()[name]
    got_pdf = spec.fn(spark, rand_orders_dir).toPandas()
    spark.catalog.clearCache()
    exp_pdf = rand_orders_oracle.execute(spec.oracle).df()
    assert sorted(got_pdf.columns) == sorted(exp_pdf.columns)
    d_got = table_digest(list(got_pdf.columns), pandas_rows(got_pdf))
    d_exp = table_digest(list(exp_pdf.columns), pandas_rows(exp_pdf))
    assert d_got == d_exp, (
        f"{name}: digest mismatch — spark {len(got_pdf)} rows, "
        f"oracle {len(exp_pdf)} rows"
    )


# --- customer/orders/lineitem trio (FK edges + predicate boundaries) --------

TRIO_OPS = [
    "q01_pricing_summary",
    "q03_topk_order_revenue",
    "q04_late_shipment_priority",
    "q06_filtered_revenue",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q22_lapsed_rich_customers",
    "q_customer_order_stats",
    "q_topk_orders_per_segment",
    "q_lapsed_customers_except",
    "q_latest_order_per_customer",
    "q_gini_customer_value",
    "q_customer_value_deciles",
    "q_customer_value_percentile",
    "q_quantity_quartiles",
    "q_corr_stats_by_flag",
    "q_unpivot_segment_metrics",
    "q_generic_tests",
    "q_corr_stats_by_flag",
]


def _build_trio(seed: int, out: str) -> None:
    """FK-consistent customer/orders/lineitem with the divergence-prone
    edges: customers with NO orders (q13 zero-groups, q22 NOT EXISTS),
    discounts at exactly 0.05/0.07 and quantities at exactly 24 (q06's
    double BETWEEN boundaries), shipdates exactly on the year-filter
    edges, one huge-quantity order straddling q18's HAVING > 250, equal
    acctbal ties for decile/percentile cuts, and shipdate == orderdate
    rows for q04's strict-inequality EXISTS."""
    import pandas as pd

    rng = random.Random(seed + 3000)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    flags = ["A", "N", "R"]
    lstat = ["O", "F"]

    n_cust = 24
    cust = {
        "c_custkey": list(range(1, n_cust + 1)),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": [i % 5 for i in range(1, n_cust + 1)],
        "c_acctbal": [round(rng.uniform(-999, 9999), 2) for _ in range(n_cust)],
        "c_mktsegment": [segs[i % 5] for i in range(1, n_cust + 1)],
    }
    # equal-acctbal ties at a decile cut + a zero and a negative balance
    cust["c_acctbal"][0] = cust["c_acctbal"][1] = cust["c_acctbal"][2] = 5000.0
    cust["c_acctbal"][3] = 0.0
    cust["c_acctbal"][4] = -1.0

    orders_rows = []
    okey = 0
    base = pd.Timestamp("1995-01-01")
    # customers 1..18 get orders; 19..24 have NONE
    for _ in range(160):
        okey += 1
        orders_rows.append(
            (
                okey,
                rng.randint(1, 18),
                rng.choice(statuses),
                round(rng.uniform(1000, 490000), 2),
                base + pd.Timedelta(days=rng.randint(0, 2400)),
                rng.choice(prios),
            )
        )
    # boundary orderdates: exactly on q04/q22 filter edges
    for d in ("1996-01-01", "1996-12-31", "1997-01-01", "2000-01-01"):
        okey += 1
        orders_rows.append(
            (okey, rng.randint(1, 18), "O", 50000.0, pd.Timestamp(d), prios[0])
        )

    li_rows = []
    for (ok, ck, st, tp, od, pr) in orders_rows:
        for ln in range(1, rng.randint(1, 5) + 1):
            ship = od + pd.Timedelta(days=rng.randint(-2, 90))
            li_rows.append(
                (
                    ok, rng.randint(1, 50), rng.randint(1, 20), ln,
                    float(rng.randint(1, 50)),
                    round(rng.uniform(900, 90000), 2),
                    rng.choice([0.0, 0.02, 0.05, 0.06, 0.07, 0.08, 0.1]),
                    round(rng.uniform(0.0, 0.08), 2),
                    rng.choice(flags), rng.choice(lstat), ship,
                )
            )
    # q06 boundary rows: quantity exactly 24 (excluded) and 23.99-ish,
    # shipdate exactly 1996-01-01 (included) and 1997-01-01 (excluded)
    first_ok = orders_rows[0][0]
    for qty, disc, ship in (
        (24.0, 0.05, "1996-01-01"),
        (23.0, 0.07, "1996-06-15"),
        (23.0, 0.05, "1997-01-01"),
        (10.0, 0.04, "1996-06-15"),
    ):
        li_rows.append(
            (first_ok, 1, 1, 90 + len(li_rows) % 7, qty, 10000.0, disc, 0.02,
             "N", "O", pd.Timestamp(ship))
        )
    # one order straddling q18's HAVING sum(qty) > 250: exactly 250 (out)
    # on one order, 251 (in) on another
    for target, total in ((orders_rows[1][0], 250.0), (orders_rows[2][0], 251.0)):
        li_rows.append(
            (target, 2, 2, 99, total, 20000.0, 0.0, 0.0, "N", "O",
             pd.Timestamp("1996-03-03"))
        )
    # shipdate == orderdate row: q04's l_shipdate > o_orderdate must NOT fire
    eq_ok, eq_od = orders_rows[3][0], orders_rows[3][4]
    li_rows.append((eq_ok, 3, 3, 98, 5.0, 1000.0, 0.0, 0.0, "N", "O", eq_od))
    # an entirely-constant returnflag group: correlation is 0/0 there and
    # both engines must emit IEEE NaN (q_corr_stats_by_flag)
    for i in range(5):
        li_rows.append(
            (orders_rows[4][0], 4, 4, 80 + i, 7.0, 700.0, 0.01, 0.01, "Z", "O",
             pd.Timestamp("1996-05-05"))
        )

    pd.DataFrame(cust).to_parquet(os.path.join(out, "customer.parquet"), index=False)
    od = pd.DataFrame(
        orders_rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    od["o_orderdate"] = od["o_orderdate"].astype("datetime64[us]")
    od.to_parquet(os.path.join(out, "orders.parquet"), index=False)
    li = pd.DataFrame(
        li_rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    li["l_linenumber"] = li["l_linenumber"].astype("int32")
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    li.to_parquet(os.path.join(out, "lineitem.parquet"), index=False)


@pytest.fixture(scope="module", params=[17, 71])
def rand_trio_dir(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"randtrio_{request.param}")
    _build_trio(request.param, str(out))
    return str(out)


@pytest.fixture(scope="module")
def rand_trio_oracle(rand_trio_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(rand_trio_dir, t + '.parquet')}'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TRIO_OPS)
def test_random_trio_matches_registry_oracle(spark, rand_trio_dir, rand_trio_oracle, name):
    spec = all_queries()[name]
    got_pdf = spec.fn(spark, rand_trio_dir).toPandas()
    spark.catalog.clearCache()
    exp_pdf = rand_trio_oracle.execute(spec.oracle).df()
    assert sorted(got_pdf.columns) == sorted(exp_pdf.columns)
    d_got = table_digest(list(got_pdf.columns), pandas_rows(got_pdf))
    d_exp = table_digest(list(exp_pdf.columns), pandas_rows(exp_pdf))
    assert d_got == d_exp, (
        f"{name}: digest mismatch — spark {len(got_pdf)} rows, "
        f"oracle {len(exp_pdf)} rows"
    )


# --- degenerate statistics (IEEE NaN parity) --------------------------------


@pytest.mark.parametrize(
    "tag,rows",
    [
        ("all_converted", [(i, i % 4 + 1, "purchase") for i in range(20)]),
        ("one_variant_empty",
         [(i, 1 + 2 * (i % 3), "click" if i % 3 else "purchase") for i in range(15)]),
    ],
)
def test_ab_test_degenerate_matches_oracle(spark, tmp_path, tag, rows):
    """All-converted (stderr 0 → 0/0) and empty-variant (c/0) shapes must
    produce the oracle's IEEE NaN, not an ANSI division error."""
    import pandas as pd

    d = tmp_path / tag
    d.mkdir()
    ep = pd.DataFrame(
        [(eid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=eid), u, t, 1.0, "{}")
         for eid, u, t in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    ep["ts"] = ep["ts"].astype("datetime64[us]")
    ep.to_parquet(str(d / "events.parquet"), index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    spec = all_queries()["q_ab_test_proportions"]
    got = spec.fn(spark, str(d)).toPandas()
    exp = con.execute(spec.oracle).df()
    con.close()
    assert table_digest(list(got.columns), pandas_rows(got)) == table_digest(
        list(exp.columns), pandas_rows(exp)
    )


def test_revenue_trend_single_day_group_matches_oracle(spark, tmp_path):
    """A priority whose orders all share one date has a zero LS
    denominator — the oracle's IEEE doubles give NaN, not an error."""
    import pandas as pd

    d = tmp_path / "trend"
    d.mkdir()
    rows = [
        (1, 1, "O", 1000.0, pd.Timestamp("1995-06-01"), "1-URGENT"),
        (2, 1, "O", 2000.0, pd.Timestamp("1995-06-01"), "1-URGENT"),
        (3, 2, "F", 1500.0, pd.Timestamp("1995-06-01"), "2-HIGH"),
        (4, 2, "F", 1500.0, pd.Timestamp("1995-07-01"), "2-HIGH"),
    ]
    op = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                                     "o_totalprice", "o_orderdate", "o_orderpriority"])
    op["o_orderdate"] = op["o_orderdate"].astype("datetime64[us]")
    op.to_parquet(str(d / "orders.parquet"), index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    spec = all_queries()["q_revenue_trend_by_priority"]
    got = spec.fn(spark, str(d)).toPandas()
    exp = con.execute(spec.oracle).df()
    con.close()
    assert table_digest(list(got.columns), pandas_rows(got)) == table_digest(
        list(exp.columns), pandas_rows(exp)
    )


# --- full star schema (region/nation/supplier/part + facts) -----------------

STAR_OPS = [
    "q05_region_nation_revenue",
    "q_region_rollup_revenue",
    "q_part_string_funcs",
    "q16_parts_not_recently_shipped",
    "q02_min_cost_part_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q_revenue_share_by_nation",
    "q_salted_join_supplier_volume",
]


def _build_star(seed: int, out: str) -> None:
    """FK-consistent full star schema with every query's predicate
    domains populated AND their boundaries: brands at q19's size-range
    edges, p_type exactly 'PROMO' and PROMO-substring variants, a part
    with one tiny-quantity lineitem for q17's 0.2·avg threshold,
    parts shipped only before vs after q16's 2001 cutoff, returnflag
    'R' rows for q10, and ship dates on the quarter edges of q14/q15."""
    import pandas as pd

    rng = random.Random(seed + 4000)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pd.DataFrame(
        {"r_regionkey": pd.array(range(5), dtype="int32"), "r_name": regions}
    ).to_parquet(os.path.join(out, "region.parquet"), index=False)
    n_nat = 8
    pd.DataFrame(
        {
            "n_nationkey": pd.array(range(n_nat), dtype="int32"),
            "n_name": [f"NATION_{i}" for i in range(n_nat)],
            "n_regionkey": pd.array([i % 5 for i in range(n_nat)], dtype="int32"),
        }
    ).to_parquet(os.path.join(out, "nation.parquet"), index=False)
    n_sup = 10
    pd.DataFrame(
        {
            "s_suppkey": range(1, n_sup + 1),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, n_sup + 1)],
            "s_nationkey": pd.array([i % n_nat for i in range(1, n_sup + 1)], dtype="int32"),
            "s_acctbal": [round(rng.uniform(-100, 9000), 2) for _ in range(n_sup)],
        }
    ).to_parquet(os.path.join(out, "supplier.parquet"), index=False)
    brands = ["Brand#12", "Brand#23", "Brand#34", "Brand#17", "Brand#2"]
    types = ["PROMO", "ECONOMY", "STANDARD", "PROMO ANODIZED", "SMALL ECONOMY"]
    names = ["red widget", "small ring", "green gear", "red bolt", "blue cap"]
    n_part = 24
    # sizes hit q19's range BOUNDARIES: 1, 5, 6, 10, 11, 15, 16...
    sizes = [1, 5, 6, 10, 11, 15, 16, 20] * 3
    pd.DataFrame(
        {
            "p_partkey": range(1, n_part + 1),
            "p_name": [names[i % 5] for i in range(n_part)],
            "p_brand": [brands[i % 5] for i in range(n_part)],
            "p_type": [types[i % 5] for i in range(n_part)],
            "p_size": pd.array(sizes[:n_part], dtype="int32"),
            "p_retailprice": [round(900 + i * 7.5, 2) for i in range(n_part)],
        }
    ).to_parquet(os.path.join(out, "part.parquet"), index=False)
    n_cust = 16
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
    pd.DataFrame(
        {
            "c_custkey": range(1, n_cust + 1),
            "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
            "c_nationkey": pd.array([i % n_nat for i in range(1, n_cust + 1)], dtype="int32"),
            "c_acctbal": [round(rng.uniform(-500, 9000), 2) for _ in range(n_cust)],
            "c_mktsegment": [segs[i % 5] for i in range(n_cust)],
        }
    ).to_parquet(os.path.join(out, "customer.parquet"), index=False)

    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders_rows = []
    base = pd.Timestamp("1995-01-01")
    for ok in range(1, 140):
        orders_rows.append(
            (
                ok,
                rng.randint(1, n_cust),
                rng.choice(statuses),
                round(rng.uniform(1000, 400000), 2),
                base + pd.Timedelta(days=rng.randint(0, 1400)),
                rng.choice(prios),
            )
        )
    od = pd.DataFrame(
        orders_rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    od["o_orderdate"] = od["o_orderdate"].astype("datetime64[us]")
    od.to_parquet(os.path.join(out, "orders.parquet"), index=False)

    flags = ["A", "N", "R"]
    li_rows = []
    for (ok, ck, st, tp, odate, pr) in orders_rows:
        for ln in range(1, rng.randint(1, 4) + 1):
            li_rows.append(
                (
                    ok, rng.randint(1, n_part), rng.randint(1, n_sup), ln,
                    float(rng.randint(5, 50)),
                    round(rng.uniform(900, 80000), 2),
                    rng.choice([0.0, 0.02, 0.05, 0.07, 0.1]),
                    round(rng.uniform(0.0, 0.08), 2),
                    rng.choice(flags), rng.choice(["O", "F"]),
                    odate + pd.Timedelta(days=rng.randint(0, 90)),
                )
            )
    # q17: Brand#12 part with many qty-30 lines and ONE tiny-qty line
    # (5 < 0.2·avg would need avg > 25 — engineered exactly)
    tiny_part = 1  # p_partkey 1 is Brand#12 (i=0)
    for i in range(8):
        li_rows.append((i + 1, tiny_part, 1, 90, 30.0, 5000.0, 0.0, 0.0, "N", "O",
                        pd.Timestamp("1996-02-01")))
    li_rows.append((9, tiny_part, 1, 91, 2.0, 400.0, 0.0, 0.0, "N", "O",
                    pd.Timestamp("1996-02-02")))
    # q16: a part shipped ONLY after the 2001 cutoff (excluded) and one
    # shipped only long before (included)
    li_rows.append((10, 2, 2, 92, 10.0, 1000.0, 0.0, 0.0, "N", "O",
                    pd.Timestamp("2001-06-01")))
    # q14/q15 quarter edges
    for ship in ("1996-09-01", "1996-09-30 23:59:59", "1996-10-01",
                 "1996-01-01", "1996-03-31 23:59:59", "1996-04-01"):
        li_rows.append((11, rng.randint(1, n_part), rng.randint(1, n_sup),
                        93 + len(li_rows) % 5, 10.0, 2000.0, 0.05, 0.02, "N", "O",
                        pd.Timestamp(ship)))
    li = pd.DataFrame(
        li_rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    li["l_linenumber"] = li["l_linenumber"].astype("int32")
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    li.to_parquet(os.path.join(out, "lineitem.parquet"), index=False)


@pytest.fixture(scope="module", params=[29, 101])
def rand_star_dir(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"randstar_{request.param}")
    _build_star(request.param, str(out))
    return str(out)


@pytest.fixture(scope="module")
def rand_star_oracle(rand_star_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(rand_star_dir, t + '.parquet')}'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", STAR_OPS)
def test_random_star_matches_registry_oracle(spark, rand_star_dir, rand_star_oracle, name):
    spec = all_queries()[name]
    got_pdf = spec.fn(spark, rand_star_dir).toPandas()
    spark.catalog.clearCache()
    exp_pdf = rand_star_oracle.execute(spec.oracle).df()
    assert sorted(got_pdf.columns) == sorted(exp_pdf.columns)
    d_got = table_digest(list(got_pdf.columns), pandas_rows(got_pdf))
    d_exp = table_digest(list(exp_pdf.columns), pandas_rows(exp_pdf))
    assert d_got == d_exp, (
        f"{name}: digest mismatch — spark {len(got_pdf)} rows, "
        f"oracle {len(exp_pdf)} rows"
    )
