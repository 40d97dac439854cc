"""Second wave of TPC-H-shaped relational queries.

Widens the §2.G query surface (SURVEY.md: the reference delegates ALL
relational work to the warehouse — `A/cli_tests/projects/002_jaffle_shop/
models/*.sql` is the proof its users run multi-join/agg/subquery SQL) with
the classic shapes not yet in `relational.py`: bi-dimensional volume
joins (Q7), ratio-of-conditional-aggregates (Q8, Q14), LIKE-filtered
profit rollups (Q9), returned-item top-k (Q10), argmax-of-aggregate (Q15),
decorrelated per-group AVG thresholds (Q17), HAVING-membership semi-joins
(Q18), and disjunctive multi-column predicates (Q19).

The driver's tables lack `partsupp` and commit/receipt dates, so Q11/Q12/
Q20/Q21 are not expressible on this testdata; the shapes they exercise
(global-scalar HAVING, case-pivot, multi-EXISTS) are covered by
q22_lapsed_rich_customers, q_orders_daily_pivot, and q04/q16.

Determinism: money aggregates go through exact DECIMAL factors
(functions/numeric.py); quantities are integral doubles, so their sums /
averages are order-independent in float64 and comparisons against
`0.2 * avg` are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_fal_spark.functions.numeric import (
    O_DISC_PRICE,
    dec,
    disc_price,
    dsum,
    o_dsum,
)
from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table


@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             CAST({O_DISC_PRICE} AS DECIMAL(18,4)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "tpch"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations by direction and year.

    Plan: both nation dims are broadcast twice (supplier side, customer
    side) with the name filters pushed below the join, so the fact joins
    only carry rows from the two nations; the OR-pair predicate prunes
    after both broadcasts. Shuffles: lineitem⋈orders, ⋈customer — both
    on their natural keys; the final agg has ~2·years groups.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(dec(disc_price())).cast("double").alias("revenue"))
    )


@query(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           (CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
            / CAST(sum(volume) AS DOUBLE)) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST({O_DISC_PRICE} AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "ratio", "tpch"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue in AMERICA.

    Ratio of two conditional decimal sums per year — both sums come out
    of ONE hash aggregate (no second pass over the joined facts). part
    (filtered to one p_type) broadcasts into the lineitem scan first, the
    most selective prune; region/nation dims broadcast; the CASE
    numerator sums only the supplier-nation slice (NULL else-branch, so
    a year with no NATION_3 sales yields NULL — same as the oracle).
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.select("n_nationkey", "n_regionkey")
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = dec(disc_price())
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(reg), n1.n_regionkey == reg.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q09_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(volume) AS DOUBLE) AS profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST({O_DISC_PRICE} AS DECIMAL(18,4)) AS volume
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "tpch"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (sans partsupp — no supply cost in this testdata):
    revenue on LIKE-matched parts by supplier nation and order year.

    The LIKE '%red%' filter cannot prune row groups (no prefix), but it
    still runs in the scan stage before the broadcast join fans rows out.
    supplier+nation broadcast; one shuffle to orders, one to the agg.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            dec(disc_price()).alias("volume"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("volume").cast("double").alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(sum({O_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.

    Both fact filters (quarter, returnflag) push to the scans; nation
    broadcasts; the LIMIT compiles to TakeOrderedAndProject so only 20
    rows per partition survive the final exchange.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (CAST(100 AS DOUBLE)
            * CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST({O_DISC_PRICE} AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(sum(CAST({O_DISC_PRICE} AS DECIMAL(18,4))) AS DOUBLE)) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("ratio", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.

    Single scan, single agg producing both the conditional numerator and
    the total denominator — the ratio is computed once on the driver-side
    single-row result. part broadcasts into the shipdate-pruned scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = dec(disc_price())
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST({O_DISC_PRICE} AS DECIMAL(18,4))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    tags=("subquery", "argmax", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    argmax-of-aggregate via a scalar subquery.

    The per-supplier revenue relation is |suppliers|-sized, so the max
    is a broadcast single-row join (no unpartitioned window). Equality
    compares exact decimals, never doubles.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # persist: rev feeds the max subquery AND the equality join — without
    # it the filtered lineitem aggregation runs twice
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec(disc_price())).alias("total_rev")
    ).persist()
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.max_rev)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT ({o_dsum('l_extendedprice')} / CAST(7 AS DOUBLE)) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (
        SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
    tags=("subquery", "correlated", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to sub-20%-of-average-quantity orders.

    The correlated AVG subquery is decorrelated into a per-part aggregate
    joined back on partkey — the plan Catalyst itself produces for the
    SQL form, written explicitly here. The per-part aggregate runs over
    the UNFILTERED lineitem (the subquery's scope), then the brand filter
    prunes via broadcast join. Quantities are integral doubles → sums and
    averages are exact, so the 0.2·avg threshold is bit-identical to the
    oracle's.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2).cast("double") * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7).cast("double")).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("subquery", "having", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totaling > 250 units.

    The HAVING-membership subquery becomes a left-semi join on orderkey:
    the grouped quantity filter reduces lineitem to a key set first, and
    only qualifying orders re-join the facts. Quantity sums are exact
    (integral doubles), so the > 250 cut is engine-independent.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"), orders.o_orderkey == F.col("bk"), "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {o_dsum(O_DISC_PRICE)} AS revenue, count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("filter", "disjunction", "tpch"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-conjuncts across both join sides.

    Catalyst extracts the common single-side implications — part rows
    must match one of the three (brand, size) conjuncts, lineitem rows
    one of the quantity ranges — and pushes those weaker disjunctions to
    each scan, so the broadcast join sees pre-pruned inputs before the
    full cross-side OR is applied.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        dsum(disc_price(), "revenue"), F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "q_customer_value_percentile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pr,
           cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd
    FROM customer
    """,
    tags=("window", "rank"),
)
def q_customer_value_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per market segment — the relative-rank
    window family (deciles are covered by q_customer_value_deciles; this
    is the continuous variant). Both functions are exact rational values
    ((rank−1)/(n−1), peers/n) computed identically in both engines; the
    tie-broken ORDER BY makes ranks deterministic. One shuffle on the
    partition key, rank computed during the partition-local sort.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
