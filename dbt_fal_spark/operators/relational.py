"""Relational operator surface (SURVEY.md §2.G).

The reference delegates every join/aggregate/window/set-op to the target
warehouse (it implements zero relational operators itself — SURVEY §2.G);
its test projects define the required query shapes:
- CTE + multi-join + min/max/count/sum aggregation
  (reference: projects/adapter/cli_tests/projects/002_jaffle_shop/models/customers.sql)
- left join + conditional case-when pivot
  (reference: .../models/orders_daily.sql)
- date cast + filter projection (reference: .../models/forecast_filter.sql)
- generic not_null/unique tests
  (reference: projects/adapter/cli_tests/projects/000_fal_run/models/schema.yml:26-40)

Here they run on Catalyst. Every query is expressed declaratively
(DataFrame API / Spark SQL) so predicate pushdown, column pruning, and
broadcast-join selection come from the optimizer, not hand-scheduling.

Scale notes (100 TB design):
- Money aggregates go through DECIMAL(18,4) per-row casts → exact,
  order-independent partial aggregation (see functions/numeric.py).
- Dimension tables (region, nation, supplier, part, customer at small SF)
  are broadcast; fact-fact joins (orders⋈lineitem) shuffle on the join key
  and AQE handles skew.
- Window functions partition by high-cardinality keys (custkey, user_id),
  so state per partition stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dbt_fal_spark.functions.numeric import (
    O_CHARGE,
    O_DISC_PRICE,
    charge,
    davg,
    dec,
    disc_price,
    dsum,
    money,
    o_davg,
    o_dsum,
    rate,
)
from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# TPC-H-style analytics
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           CAST(sum({O_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({O_CHARGE}) AS DOUBLE) AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "tpch"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide hash aggregation with 8 aggregates over 2 group keys.

    Plan: parquet scan with shipdate pushdown → partial HashAggregate
    (map-side, decimal-exact) → shuffle on 6 distinct groups → final agg.
    At 100 TB the partial agg reduces ~all rows before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_topk_order_revenue",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           CAST(sum({O_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "topk", "tpch"),
)
def q03_topk_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → fact join → agg → global top-k.

    customer(filtered) is broadcast to the orders scan; orders⋈lineitem
    shuffles on orderkey. The LIMIT is a TakeOrderedAndProject — each
    partition keeps only its local top-10, so no global sort materializes.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n_name, CAST(sum({O_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "tpch"),
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join, local-supplier revenue by nation.

    region→nation→supplier are tiny → broadcast all three; the only
    shuffles are the two fact joins. Catalyst reorders the join tree so
    the region filter prunes nations before any fact is touched.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q06_filtered_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "tpch"),
)
def q06_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — the pushdown benchmark.

    All four predicates reach the parquet reader (min/max row-group skip);
    only 4 columns are read. Verify with .explain(): PushedFilters list.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Jaffle-shop-style surface (the reference's own test queries)
# ---------------------------------------------------------------------------

@query(
    "q_orders_daily_pivot",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           count(*) AS n_orders,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
           {o_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS open_amount,
           {o_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_amount,
           {o_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS pending_amount,
           {o_dsum('o_totalprice')} AS total_amount
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
    """,
    tags=("pivot", "jaffle"),
)
def q_orders_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders_daily.sql analog: conditional case-when pivot over status
    (reference: 002_jaffle_shop/models/orders_daily.sql:17-32 does the same
    with a Jinja loop over payment methods)."""
    orders = load_table(spark, sf_dir, "orders")

    def n_status(s: str, alias: str):
        return F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(alias)

    def amt_status(s: str, alias: str):
        return (
            F.sum(dec(F.when(F.col("o_orderstatus") == s, F.col("o_totalprice")).otherwise(0.0)))
            .cast("double")
            .alias(alias)
        )

    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            n_status("O", "n_open"),
            n_status("F", "n_finished"),
            n_status("P", "n_pending"),
            amt_status("O", "open_amount"),
            amt_status("F", "finished_amount"),
            amt_status("P", "pending_amount"),
            dsum("o_totalprice", "total_amount"),
        )
    )


@query(
    "q_customer_order_stats",
    oracle=f"""
    SELECT c_custkey, c_name, c_mktsegment,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS most_recent_order,
           count(o_orderkey) AS number_of_orders,
           {o_dsum('o_totalprice')} AS customer_lifetime_value
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name, c_mktsegment
    """,
    tags=("join", "aggregate", "jaffle"),
)
def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers.sql analog: left join + min/max/count/sum per customer
    (reference: 002_jaffle_shop/models/customers.sql:19-41). Customers with
    no orders keep NULL aggregates — left-join semantics preserved."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("most_recent_order"),
            F.count("o_orderkey").alias("number_of_orders"),
            dsum("o_totalprice", "customer_lifetime_value"),
        )
    )


@query(
    "q_date_filter_projection",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS ds,
           o_orderkey,
           o_totalprice AS amount
    FROM orders
    WHERE o_totalprice > 1000 AND o_orderstatus = 'O'
    """,
    tags=("filter", "jaffle"),
)
def q_date_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forecast_filter.sql analog: date cast + predicate + projection
    (reference: 002_jaffle_shop/models/forecast_filter.sql:9-16)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_totalprice") > 1000) & (F.col("o_orderstatus") == "O"))
        .select(
            F.col("o_orderdate").cast("date").alias("ds"),
            "o_orderkey",
            F.col("o_totalprice").alias("amount"),
        )
    )


@query(
    "q_generic_tests",
    oracle="""
    SELECT 'orders_o_orderkey_unique' AS test_name,
           count(*) - count(DISTINCT o_orderkey) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_o_custkey_not_null' AS test_name,
           count(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
    FROM orders
    UNION ALL
    SELECT 'lineitem_l_quantity_not_null' AS test_name,
           count(CASE WHEN l_quantity IS NULL THEN 1 END) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'customer_c_custkey_unique' AS test_name,
           count(*) - count(DISTINCT c_custkey) AS violations
    FROM customer
    """,
    tags=("tests",),
)
def q_generic_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt generic tests (not_null / unique) as assertion queries
    (reference: 000_fal_run/models/schema.yml:26-40 declares them; dbt
    compiles them to violation-count SQL). A model passes when violations=0."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def unique_test(df: DataFrame, col: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("test_name"),
            (F.count(F.lit(1)) - F.countDistinct(F.col(col))).alias("violations"),
        )

    def not_null_test(df: DataFrame, col: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("test_name"),
            F.count(F.when(F.col(col).isNull(), 1)).alias("violations"),
        )

    # r16 optimization round: a batched-orders variant (both orders
    # tests in ONE aggregate + explode) was measured and REJECTED — the
    # countDistinct's distinct-rewrite Expand triples the rows through
    # the aggregate, costing more than the extra narrow scan it saves at
    # every scale (A/B at sf0.1: 0.24 s -> 0.38 s min). Kept as-is.
    return (
        unique_test(orders, "o_orderkey", "orders_o_orderkey_unique")
        .unionAll(not_null_test(orders, "o_custkey", "orders_o_custkey_not_null"))
        .unionAll(not_null_test(li, "l_quantity", "lineitem_l_quantity_not_null"))
        .unionAll(unique_test(cust, "c_custkey", "customer_c_custkey_unique"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "q_topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) t
    WHERE rn <= 5
    """,
    tags=("window", "topk"),
)
def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window — the canonical pattern.
    Tie-break on o_orderkey keeps the result deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_customer_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum per customer — per-key window state stays
    bounded, so this scales by partitioning on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("double").alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# Set operations / distinct
# ---------------------------------------------------------------------------

@query(
    "q_repeat_customers_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("setop",),
)
def q_repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 1997."""
    orders = load_table(spark, sf_dir, "orders")

    def active(y0: str, y1: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return active("1996", "1997").intersect(active("1997", "1998"))


@query(
    "q_lapsed_customers_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("setop", "anti-join"),
)
def q_lapsed_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with no orders since 2000 (≡ anti-join)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(recent)


@query(
    "q_priority_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("distinct",),
)
def q_priority_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT per group (expand+two-phase agg in Spark).
    At 100 TB prefer approx_count_distinct unless exactness is required."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_region_rollup_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {o_dsum('o_totalprice')} AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("rollup",),
)
def q_region_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# String functions
# ---------------------------------------------------------------------------

@query(
    "q_part_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substring(p_name, 1, 10) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           length(p_name) AS name_len
    FROM part
    WHERE p_type LIKE '%ECONOMY%' OR p_name LIKE 'red%'
    """,
    tags=("string",),
)
def q_part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String projection surface: upper/lower/substring/concat/length/LIKE —
    all JVM-side codegen'd expressions, no UDFs."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("%ECONOMY%") | F.col("p_name").like("red%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 10).alias("name_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").alias("name_len"),
        )
    )


@query(
    "q_pii_masked_customers",
    oracle="""
    SELECT md5(c_name) AS surrogate_key,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS acctbal_band,
           c_mktsegment,
           c_nationkey
    FROM customer
    """,
    tags=("string", "pii", "curation"),
)
def q_pii_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-safe dimension export — the masking pass every shared
    training-data/analytics extract needs (GDPR-style pseudonymization):
    direct identifiers become a deterministic md5 surrogate (joinable
    across extracts, irreversible), embedded digits are redacted, and
    the quasi-identifying numeric is GENERALIZED to coarse bands (the
    k-anonymity move — exact balances re-identify, bands aggregate).
    All JVM-side codegen'd expressions (md5 / regexp_replace / CASE):
    map-only, zero shuffles, scales with executors; the Spark
    regexp_replace replaces all matches, mirrored by DuckDB's 'g'
    flag."""
    cust = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return cust.select(
        F.md5(F.col("c_name").cast("binary")).alias("surrogate_key"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        band.alias("acctbal_band"),
        "c_mktsegment",
        "c_nationkey",
    )


# ---------------------------------------------------------------------------
# Semi / anti joins, correlated subqueries (TPC-H Q4/Q13/Q16/Q22 shapes)
# ---------------------------------------------------------------------------

@query(
    "q04_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi"),
)
def q04_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join. The semi join never
    materializes matched lineitem rows (probe-side short circuit), and the
    date filter is pushed to the orders parquet scan.
    Reference delegates EXISTS entirely to the warehouse (SURVEY §2.G)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    late = window.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    tags=("join", "outer", "aggregate"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers,
    two-level aggregation (per-customer count, then histogram). count(col)
    skips the NULLs the outer join introduces — the 0-order bucket falls
    out naturally."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_parts_not_recently_shipped",
    oracle="""
    SELECT p_brand, count(*) AS n_parts, min(p_retailprice) AS min_price
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
    GROUP BY p_brand
    """,
    tags=("join", "anti"),
)
def q16_parts_not_recently_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts with no shipment since 2001: NOT IN → LEFT ANTI join
    (l_partkey is never null here, so the null-semantics trap of NOT IN
    doesn't bite). The shipdate filter pushes to the parquet scan, so the
    anti join probes a sliver of the fact table."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.filter(F.col("l_shipdate") >= "2001-01-01")
    never = part.join(recent, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
    return never.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
    )


@query(
    "q22_lapsed_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {o_davg('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nationkey,
           count(*) AS numcust,
           {o_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
    tags=("join", "anti", "subquery"),
)
def q22_lapsed_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global avg balance,
    computed exactly in decimal then divided in double — deterministic in
    both engines) broadcast into the filter, then NOT EXISTS → LEFT ANTI
    against orders placed since 2000 (customers gone quiet). The scalar is a 1-row cross join, not a collect() —
    the whole plan stays lazy/distributed."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "a"))
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    lapsed = rich.join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return lapsed.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal", "totacctbal"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / CUBE, percentiles, ordered set aggregation, regression
# ---------------------------------------------------------------------------

@query(
    "q_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           {o_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with GROUPING() markers — all four
    grouping sets in ONE shuffle (Catalyst expands then partially
    aggregates map-side). Complements q_region_rollup_revenue (ROLLUP)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders", "revenue")


@query(
    "q_paginate_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tags=("pagination", "topk"),
)
def q_paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: page 3 of the orders leaderboard (ORDER BY
    a total order, OFFSET 40 LIMIT 20). Spark executes this as
    TakeOrdered(60) then a driver-side drop of the first 40 — fine for
    dashboard-depth pages; the deterministic tiebreak (orderkey) is what
    makes pages stable across runs and engines. For deep pagination at
    100 TB use keyset predicates (WHERE (price, key) < last_seen) so the
    scan prunes instead of ranking the world."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


# Per-column stable string rendering for min/max: NULL-double cells hash
# differently across comparator implementations, so the profile emits one
# always-populated VARCHAR min/max pair per column instead, rendered through
# casts that are bit-identical in Spark and DuckDB. ONE kind table drives
# BOTH engines' rendering, so adding/retyping a profiled column cannot
# silently diverge the two sides.
_PROFILE_COLS = {
    "o_orderkey": "int",
    "o_custkey": "int",
    "o_totalprice": "money",
    "o_orderstatus": "str",
    "o_orderpriority": "str",
    "o_orderdate": "date",
}
_KIND_ORACLE = {
    "int": "CAST({v} AS VARCHAR)",
    "money": "CAST(CAST({v} AS DECIMAL(18,2)) AS VARCHAR)",
    "date": "CAST(CAST({v} AS DATE) AS VARCHAR)",
    "str": "{v}",
}


def _profile_oracle_render(c: str, v: str) -> str:
    return _KIND_ORACLE[_PROFILE_COLS[c]].format(v=v)


def _profile_spark_render(c: str, agg):  # min/max Column -> stable string
    kind = _PROFILE_COLS[c]
    if kind == "money":
        return agg.cast("decimal(18,2)").cast("string")
    if kind == "date":
        return agg.cast("date").cast("string")
    return agg.cast("string")  # int / str: plain string cast


@query(
    "q_profile_orders",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {_profile_oracle_render(c, f"min({c})")} AS min_val,
           {_profile_oracle_render(c, f"max({c})")} AS max_val
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
    tags=("profiling", "data-quality"),
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality summary a pipeline runs before
    trusting a new drop: per-column null count, distinct count, min/max.
    ONE scan computes every column's aggregates in a single wide agg row
    (Catalyst evaluates all of them in the same partial/final pair);
    the row then unpivots to the long (column_name, stats) form
    dashboards want. min/max are rendered to always-populated strings via
    type-stable casts so the long form has no mixed NULL-typed cells. The
    oracle spells the same stats as per-column UNION ALL branches. At
    100 TB this exact shape holds — profiling is one pass, never one pass
    per column; switch count(DISTINCT) to approx_count_distinct when
    exactness isn't contractual."""
    orders = load_table(spark, sf_dir, "orders")
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        aggs.append(_profile_spark_render(c, F.min(F.col(c))).alias(f"mn_{c}"))
        aggs.append(_profile_spark_render(c, F.max(F.col(c))).alias(f"mx_{c}"))
    wide = orders.agg(*aggs)
    branches = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    stack = (
        f"stack({len(_PROFILE_COLS)}, {branches}) "
        "as (column_name, n_nulls, n_distinct, min_val, max_val)"
    )
    return wide.select(F.col("n_rows"), F.expr(stack)).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val",
    )


@query(
    "q_grouping_sets_revenue",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           {o_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two one-dimension rollups plus the
    grand total, WITHOUT the (status, priority) cross cells a CUBE would
    also compute. One shuffle for all three sets (Catalyst's Expand then
    partial agg); at 100 TB you enumerate exactly the sets a dashboard
    needs instead of paying for the full cube lattice."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "revenue",
        )
    )


@query(
    "q_first_last_order_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_totalprice) OVER w AS first_order_value,
           last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order_value,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order_value
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "navigation"),
)
def q_first_last_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions per customer: first / last / 2nd order
    value. last_value and nth_value need the full-partition frame
    (UNBOUNDED FOLLOWING) — with the default running frame last_value
    degenerates to the current row, the classic window-frame trap, spelled
    out identically in both engines. One shuffle; DISTINCT collapses the
    per-row window results to one row per customer in the same exchange's
    output."""
    orders = load_table(spark, sf_dir, "orders")
    run = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = run.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(run).alias("first_order_value"),
            F.last("o_totalprice").over(full).alias("last_order_value"),
            F.nth_value("o_totalprice", 2).over(full).alias("second_order_value"),
        )
        .distinct()
    )


@query(
    "q_pivot_priority_by_status",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(f'''{o_dsum(f"CASE WHEN o_orderstatus = '{s}' THEN o_totalprice ELSE 0 END")} AS revenue_{s}''' for s in ("O", "F", "P"))},
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot", "aggregate"),
)
def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True relational PIVOT (`.pivot()` with an explicit value list, not
    hand-written case-when): revenue per priority pivoted across order
    statuses. The explicit value list matters at scale — without it Spark
    runs an extra distinct-values job before it can even plan. Physically
    identical to conditional aggregation (one shuffle), which is exactly
    what the oracle spells out."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["O", "F", "P"]
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(
            F.sum(dec("o_totalprice")).cast("double"),
            F.count(F.lit(1)),
        )
    )
    # pivot with 2 aggs yields columns '<val>_<aggname>'; normalize + total
    cols = [F.col("o_orderpriority")]
    total = None
    for s in statuses:
        rev = [c for c in pivoted.columns if c.startswith(f"{s}_") and "sum" in c.lower()][0]
        cnt = [c for c in pivoted.columns if c.startswith(f"{s}_") and "count" in c.lower()][0]
        cols.append(F.coalesce(F.col(f"`{rev}`"), F.lit(0.0)).alias(f"revenue_{s}"))
        total = F.coalesce(F.col(f"`{cnt}`"), F.lit(0)) if total is None else total + F.coalesce(F.col(f"`{cnt}`"), F.lit(0))
    cols.append(total.alias("n_orders"))
    return pivoted.select(*cols)


@query(
    "q_quantity_quartiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median,
           quantile_cont(l_quantity, 0.75) AS q75,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def q_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: same linear interpolation on the sorted
    values; quantities are small integers stored as doubles, so the
    interpolated midpoints are exact in both engines). At 100 TB swap in
    approx_percentile (t-digest, single pass, mergeable sketches)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_status_set_per_priority",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), chr(31)) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "collect"),
)
def q_status_set_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set aggregation into a deterministic, comparable form — collect_set
    arrival order differs run to run, so sort_array makes the result
    reproducible, and array_join flattens it to a scalar string so the
    result row is hashable by any downstream comparator (pandas
    canonicalizers choke on list cells). The oracle sorts and joins its
    list() the same way."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        # unit-separator join: unambiguous even if a value ever contains ','
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), "\x1f").alias("statuses"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "q_revenue_trend_by_priority",
    oracle="""
    WITH xy AS (
      SELECT o_orderpriority,
             CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(o_totalprice AS DECIMAL(12,2)) AS y
      FROM orders
    ), s AS (
      SELECT o_orderpriority,
             count(*) AS n,
             sum(x) AS sx,
             sum(x * x) AS sxx,
             sum(y) AS sy,
             sum(CAST(x AS DECIMAL(18,0)) * y) AS sxy
      FROM xy GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_day
    FROM s
    """,
    tags=("aggregate", "regression"),
)
def q_revenue_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares revenue trend from exact closed-form sums:
    slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), every Σ in integer/decimal math
    so partial aggregation is order-independent, with ONE double division
    at the end. The distributed-safe version of regr_slope (whose double
    running sums are shuffle-order-dependent). Mirrors the reference's
    per-series model-fit workload shape (orders_forecast.py) as pure SQL."""
    orders = load_table(spark, sf_dir, "orders")
    xy = orders.select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        money("o_totalprice").alias("y"),
    )
    s = xy.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    # single-day group ⇒ denominator 0: the oracle's IEEE doubles give
    # NaN (numerator provably 0 too) where Spark's ANSI division errors
    slope = F.when(den == 0.0, F.expr("double('NaN')")).otherwise(num / den)
    return s.select("o_orderpriority", "n", slope.alias("slope_per_day"))


@query(
    "q02_min_cost_part_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey,
           min(c.l_suppkey) AS best_suppkey,
           min(p.p_brand) AS brand,
           min(c.unit_cost) AS unit_cost
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size <= 15
    GROUP BY c.l_partkey
    """,
    tags=("join", "subquery", "argmin"),
)
def q02_min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin via aggregate-then-rejoin (the
    correlated `= (SELECT min ...)` decorrelated by hand into the form
    Catalyst executes it as anyway). unit_cost is a single double
    division per row — no float summation — and ties collapse through
    min(), so the result is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # persist: costs feeds the per-part min AND the argmin equality join —
    # without it the (partkey, suppkey) aggregation runs twice
    costs = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    ).persist()
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    small = part.filter(F.col("p_size") <= 15)
    return (
        costs.alias("c")
        .join(
            best.alias("b"),
            (F.col("c.l_partkey") == F.col("b.l_partkey"))
            & (F.col("c.unit_cost") == F.col("b.best_cost")),
        )
        .join(F.broadcast(small).alias("p"), F.col("p.p_partkey") == F.col("c.l_partkey"))
        .groupBy(F.col("c.l_partkey").alias("partkey"))
        .agg(
            F.min("c.l_suppkey").alias("best_suppkey"),
            F.min("p.p_brand").alias("brand"),
            F.min("c.unit_cost").alias("unit_cost"),
        )
    )


@query(
    "q_customer_value_deciles",
    oracle="""
    SELECT decile,
           count(*) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM (
      SELECT c_acctbal,
             ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    ) t
    GROUP BY decile
    """,
    tags=("window", "ntile"),
)
def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing over a TOTAL order (custkey tiebreak — without
    it bucket assignment at equal balances would be engine/partition
    dependent) — WITHOUT the single-partition ntile window: an exact
    distributed rank (range-repartition + per-partition row_number +
    partition-size prefix-sum, functions/rank.py) feeds SQL-standard
    ntile arithmetic on driver-side constants. Same answer as
    ``ntile(10) OVER (ORDER BY ...)`` (the oracle runs exactly that),
    but every stage is parallel — the plan that survives 100×."""
    from dbt_fal_spark.functions.rank import (
        global_row_number_with_total,
        ntile_from_rank,
    )

    cust = load_table(spark, sf_dir, "customer")
    ranked, n = global_row_number_with_total(
        cust.select("c_acctbal", "c_custkey"),
        ["c_acctbal", "c_custkey"],
        out_col="__i",
    )
    return (
        ranked.select("c_acctbal", ntile_from_rank("__i", n, 10).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@query(
    "q_customer_value_deciles_ranged",
    oracle="""
    WITH r AS (
      SELECT c_acctbal,
             row_number() OVER (ORDER BY c_acctbal, c_custkey) AS i,
             count(*) OVER () AS n
      FROM customer
    ),
    b AS (
      SELECT r.c_acctbal AS bv
      FROM r, (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) t(k)
      WHERE (r.i - 1) * 10 < r.n * t.k AND r.n * t.k <= r.i * 10
    )
    SELECT decile,
           count(*) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM (
      SELECT c.c_acctbal,
             1 + (SELECT count(*) FROM b WHERE b.bv < c.c_acctbal) AS decile
      FROM customer c
    ) t
    GROUP BY decile
    """,
    tags=("decile", "range-join", "broadcast"),
)
def q_customer_value_deciles_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based deciles via boundary broadcast — the 100 TB histogram
    pattern the r6 verdict asked to demonstrate: compute the 9 exact
    decile boundary VALUES once (elements at ranks ceil(n·k/10) of the
    distributed rank, functions/rank.py — 9 scalars collected), then
    bucket the table MAP-SIDE with a codegen'd comparison chain against
    the broadcast boundaries. Unlike ntile (rank-based; splits ties),
    value-deciles put equal balances in the same bucket — the contract
    dashboards usually want — and the fact-table pass has ZERO shuffles
    before the final 10-group aggregate. Exact (boundaries from the
    exact rank, not approx_percentile), so the oracle is hash-checked
    like every other entry."""
    from dbt_fal_spark.functions.rank import global_row_number_with_total

    cust = load_table(spark, sf_dir, "customer")
    out_schema = "decile long, n_customers long, min_bal double, max_bal double"
    ranked, n = global_row_number_with_total(
        cust.select("c_acctbal", "c_custkey"),
        ["c_acctbal", "c_custkey"],
        out_col="__i",
    )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    # rank of the k-th boundary: ceil(n·k/10); duplicates kept (small n)
    ranks = [-(-n * k // 10) for k in range(1, 10)]
    vals = {
        r["__i"]: r["c_acctbal"]
        for r in ranked.filter(F.col("__i").isin(sorted(set(ranks)))).collect()
    }
    bounds = [vals[r] for r in ranks]  # 9 scalars — the broadcast side
    decile = F.lit(1)
    for b in bounds:
        decile = decile + F.when(F.col("c_acctbal") > F.lit(b), 1).otherwise(0)
    return (
        cust.select("c_acctbal", decile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@query(
    "q_order_date_parts",
    oracle="""
    SELECT extract(year FROM o_orderdate) AS y,
           extract(quarter FROM o_orderdate) AS q,
           extract(month FROM o_orderdate) AS m,
           count(*) AS n_orders,
           min(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)) AS month_end,
           min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start
    FROM orders
    GROUP BY 1, 2, 3
    """,
    tags=("date", "aggregate"),
)
def q_order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface: extract year/quarter/month, last_day,
    date_trunc — functions whose semantics agree between engines (unlike
    dayofweek, whose origin differs: Spark counts Sunday=1, DuckDB
    Sunday=0 — deliberately excluded from the cross-engine contract)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.last_day("o_orderdate")).alias("month_end"),
        F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias("month_start"),
    )
