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
Q20/Q21 cannot run verbatim. r12 (VERDICT r11 item 4) adds ADAPTED
variants that preserve each query's exact PLAN SHAPE on the available
columns — q11 (global-scalar HAVING over a region-filtered value rollup,
lineitem value standing in for partsupp stock value), q12 (two-bucket
case-pivot over a derived ship-latency dimension standing in for
l_shipmode, with commit/receipt lateness replaced by the shipdate-vs-
orderdate+60d proxy q04 established), q20 (nested correlated aggregate
threshold per (supplier, part) over name-prefix-filtered parts, semi-
joined up to region suppliers), and q21 (multi-EXISTS / NOT-EXISTS
waiting-supplier query — see q21's docstring for why the Spark plan uses
the single-scan aggregate rewrite instead of the triple self-join the
SQL spells).

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
    money,
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


# ---------------------------------------------------------------------------
# r12: the four hardest remaining TPC-H plan shapes, adapted to this
# testdata (no partsupp / commit / receipt columns — see module docstring)
# ---------------------------------------------------------------------------

_O_PART_VALUE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))"
)


@query(
    "q11_important_parts",
    oracle=f"""
    WITH sup AS (
      SELECT s_suppkey
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA'
    ), v AS (
      SELECT l_partkey, sum({_O_PART_VALUE}) AS vdec
      FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(vdec AS DOUBLE) AS part_value
    FROM v
    WHERE vdec * 1000 > (SELECT sum(vdec) FROM v)
    """,
    tags=("tpch", "aggregate", "scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted): per-part value over one region's
    suppliers, HAVING value > fraction-of-global — the global-scalar
    HAVING decorrelation. Shipped lineitem value (extendedprice ×
    quantity) stands in for partsupp stock value; the region chain
    replaces Q11's single-nation filter.

    Plan: supplier⋈nation⋈region collapses to a ~20-row broadcast key
    list, so lineitem is scanned ONCE, filtered by the broadcast
    semi-side, and aggregated per part (map-side partial agg first).
    The per-part rollup (|part| rows, not |lineitem|) is persisted and
    the global total is a scalar re-aggregation OF THE CACHE — without
    the persist Catalyst re-runs the whole join+agg for the total
    branch (verified via explain: two lineitem scans). The total comes
    back as a 1-row broadcast crossJoin, the repo's standard
    broadcast-scalar pattern. Threshold compares DECIMAL-exact values
    scaled by an integer (value*1000 > total): bit-identical in both
    engines; the DOUBLE cast happens only on output.

    Cache lifetime: like every persist() site in this package, the
    cached rollup lives until the caller clears it — the bench/check
    harnesses call ``spark.catalog.clearCache()`` between queries, and
    long-lived API sessions should do the same after consuming the
    result (ADVICE r12).
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    li = load_table(spark, sf_dir, "lineitem")
    sup = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    value = dec(money("l_extendedprice") * F.col("l_quantity").cast("decimal(12,2)"))
    # persist the per-part rollup: the global-total branch otherwise
    # re-runs the whole lineitem join+agg (the repo's standard
    # broadcast-scalar pattern — same as the triangle-count totals)
    v = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("vdec"))
        .persist()
    )
    total = v.agg(F.sum("vdec").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("vdec") * 1000 > F.col("total"))
        .select("l_partkey", F.col("vdec").cast("double").alias("part_value"))
    )


@query(
    "q12_latency_priority_pivot",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS latency_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("tpch", "pivot", "join"),
)
def q12_latency_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted): conditional two-bucket pivot of order
    priorities per shipping class. The derived ship-latency dimension
    (shipdate vs orderdate+60d — q04's lateness proxy) stands in for
    l_shipmode; the commit/receipt window becomes a shipdate year.

    Plan: the year filter is pushed to the lineitem scan; the join
    shuffles both sides on orderkey (orders is too big to broadcast at
    real scale — Catalyst broadcasts it at test SF automatically, AQE
    decides at runtime); the CASE counts fold into ONE hash aggregate
    over a 2-row group space with map-side partials, so the post-join
    exchange carries 2 rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "latency_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")),
        )
        .groupBy("latency_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    agg AS (
      SELECT l_suppkey, l_partkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS q97,
             sum(l_quantity) AS qall
      FROM lineitem JOIN red ON l_partkey = p_partkey
      GROUP BY l_suppkey, l_partkey
    ), qual AS (
      SELECT DISTINCT l_suppkey FROM agg
      WHERE qall >= 60 AND q97 > 0.5 * qall
    )
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
    tags=("tpch", "semi", "correlated"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers in one region whose 1997
    shipments of name-prefix-filtered parts dominate (>50%, with a
    volume floor) their all-time shipments of that part — the nested
    correlated-aggregate threshold (Q20's `ps_availqty > 0.5 * SUM(...)`)
    decorrelated into a grouped conditional aggregate, then rolled up
    through IN-subquery semi-joins exactly like the original.

    Plan: the 'red%' part list (~2.5% of part) broadcasts into the
    lineitem scan; the (supplier, part) aggregate is ONE shuffle whose
    conditional q97/qall sums replace Q20's correlated re-scan of the
    fact (Spark-first: never express a correlated aggregate as a
    re-scan when a CASE inside the same groupBy computes it). The
    qualifying-supplier set collapses to ≤100 keys → broadcast
    LEFT SEMI into the supplier dim, nation/region broadcast on top.
    Quantities are integral doubles: sums are exact in float64 and
    0.5·qall is a power-of-two scale — the threshold is bit-identical
    across engines.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    in97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    qual = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("q97"),
            F.sum("l_quantity").alias("qall"),
        )
        .filter((F.col("qall") >= 60) & (F.col("q97") > 0.5 * F.col("qall")))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE r_name = 'AFRICA'
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
    tags=("tpch", "anti", "semi", "self-join"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted): suppliers in one region who were the
    SOLE late shipper on a finished multi-supplier order. Lateness is
    the shipdate-vs-orderdate+60d proxy (no receipt/commit columns).

    The oracle spells the canonical EXISTS / NOT-EXISTS triple
    self-join. The Spark plan deliberately does NOT: three scans of the
    100 TB fact with two orderkey self-shuffles is the classic Q21
    trap. Per order, `EXISTS l2 (other supplier)` ⇔ the order has ≥ 2
    distinct suppliers, and `NOT EXISTS l3 (other LATE supplier)` ⇔ the
    order's late-supplier set is exactly {l1's supplier} (l1 itself is
    late) ⇔ it has exactly 1 distinct late supplier. Both counts come
    from a WINDOW over l_orderkey (`size(collect_set(...))`, whole-
    partition frame — set size bounded by suppliers-per-order, single
    digits), NOT a groupBy-and-join-back: the first r12 cut aggregated
    per order and re-joined, which executed the lineitem⋈orders join
    TWICE (PLAN_AUDIT caught 14 scans / 2 SMJs). The window inherits
    the join output's orderkey partitioning-and-sort, so the whole
    query is: one scan of each fact, the one orderkey join exchange
    pair, zero extra window exchange, then broadcast
    supplier⋈nation⋈region and a |supplier|-group aggregate. count(*)
    over qualifying l1 LINES matches the canonical query's row
    semantics.
    """
    from pyspark.sql import Window as W

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = W.partitionBy("l_orderkey")
    counted = lines.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    sole_late = counted.filter(
        F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    reg_supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        sole_late.join(F.broadcast(reg_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
