"""Extended TPC-H-family queries over the reduced testdata star schema.

Complements queries.py's q1/q3/q4/q5/q6/q10/q12/q14/q18/q19/q22 with the
remaining TPC-H plan shapes. The testdata schema omits partsupp,
l_commitdate/l_receiptdate and the comment columns, so q2/q9/q11/q16/
q20/q21 are *adapted*: lineitem serves as the part↔supplier
association and date/comment predicates are re-targeted — each
docstring states the delta. What is preserved is the physical plan
family each query exists to exercise (correlated min/max per group,
two-sided nation pair join, market-share conditional aggregate,
left-join count distribution, agg-HAVING semi joins, exists/not-exists
self-association) — that is what matters for the 100 TB design review.

Cross-engine hash-parity conventions follow queries.py: money math in
DECIMAL(18,4) (2dp × 2dp products are exact at scale 4; sums stay
< 2^53 so the final decimal→double cast is exact in both engines),
years cast to BIGINT, every top-k given a total order.

Broadcast policy: explicit broadcast() hints only on constant-size
sides (nation=25, region=5, 1-row scalar aggregates). Sides that scale
with SF (filtered part/supplier/customer) are left to AQE, which
broadcasts them when their runtime size allows and falls back to
shuffle join when it doesn't - a forced hint would OOM at 1000x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalakerulegeneration_spark.catalog import load_sf_tables

# exact 4dp revenue: see queries.py q3 note on the 2^53 / int128 rounding
_REV = (
    "cast(cast(l_extendedprice as decimal(18,6)) * (1 - cast(l_discount as decimal(18,6)))"
    " as decimal(18,4))"
)
_REV_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))"
    " AS DECIMAL(18,4))"
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp, so 'supplied parts' =
    distinct (l_partkey, l_suppkey) pairs from lineitem, and min
    supply cost becomes max supplier account balance). For every
    LARGE-type part of size ≤ 25, the best EUROPE supplier that has
    shipped it. Exercises the correlated per-group argmax: dedup'd association
    → broadcast dims → ranked window, never a driver loop."""
    t = load_sf_tables(spark, sf_dir, ("part", "supplier", "lineitem", "nation", "region"))
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    parts = t["part"].where((F.col("p_size") <= 25) & (F.col("p_type") == "LARGE"))
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
    )
    j = (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").alias("best_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("best_acctbal"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_ORACLE = """
SELECT p_partkey, p_brand, s_suppkey, s_name, best_acctbal, n_name
FROM (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal AS best_acctbal, n_name,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 25 AND p_type = 'LARGE' AND r_name = 'EUROPE'
)
WHERE rn = 1
ORDER BY best_acctbal DESC, p_partkey ASC
LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, both directions,
    by year. Supplier/customer nation tags come from two broadcast
    copies of the (25-row) nation dim; the nation-pair disjunction is
    applied after both tags are attached, per the spec."""
    t = load_sf_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue"))
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of PROMO-part order volume inside
    region ASIA, per order year. Customer nation restricts to the
    region; supplier nation is the share dimension. Both volume sums
    are exact DECIMAL(18,4); the share is one double division of two
    exactly-reproducible doubles, so no rounding fudge is needed."""
    t = load_sf_tables(
        spark, sf_dir, ("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["part"].where(F.col("p_type") == "PROMO"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.expr(_REV)
    zero = F.lit(0).cast("decimal(18,4)")
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
        .cast("double")
        .alias("nation_volume"),
        F.sum(vol).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


Q8_ORACLE = f"""
SELECT o_year, nation_volume, total_volume, nation_volume / total_volume AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(sum(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV_SQL}
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
         CAST(sum({_REV_SQL}) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  GROUP BY CAST(year(o_orderdate) AS BIGINT)
)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so profit omits the
    ps_supplycost·quantity term and is pure discounted revenue).
    Nation-of-supplier × order-year profit on parts whose name
    contains 'widget'. The part filter is a broadcast pre-filtered
    dim; lineitem→orders is the only big join."""
    t = load_sf_tables(spark, sf_dir, ("part", "supplier", "lineitem", "orders", "nation"))
    j = (
        t["lineitem"]
        .join(t["part"].where(F.col("p_name").contains("widget")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(F.expr(_REV)).cast("double").alias("sum_profit"))
    )


Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: value of a part = discounted revenue
    shipped by NATION_3 suppliers instead of partsupp stock value).
    Parts whose value exceeds 0.1% of the nation's total — the
    scalar-aggregate-broadcast HAVING pattern: the grand total is a
    1-row broadcast joined onto the per-part aggregate, never a
    second scan of the fact table (the per-part agg is reused)."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    nation_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    # nation_supp scales with SF (|supplier|/25): no forced hint, AQE
    # broadcasts it while it fits and shuffles when it doesn't
    base = t["lineitem"].join(
        nation_supp, F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum(F.expr(_REV)).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").cast("double").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("total_value") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


Q11_ORACLE = f"""
WITH nation_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
), per_part AS (
  SELECT l_partkey, sum({_REV_SQL}) AS value_dec
  FROM lineitem JOIN nation_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(sum(value_dec) AS DOUBLE) FROM per_part) * 0.001
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, including
    zero-order customers — the LEFT OUTER join + double aggregation.
    First groupBy rides the join's hash partitioning on custkey; the
    second agg's input is one row per customer."""
    t = load_sf_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in a quarter. The
    per-supplier aggregate is computed once and self-compared against
    its broadcast 1-row max — revenue stays DECIMAL(18,4) through the
    equality so ties are exact, cast to double only for output."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(_REV)).alias("total_revenue_dec"))
    )
    mx = rev.agg(F.max("total_revenue_dec").alias("max_revenue_dec"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue_dec") == F.col("max_revenue_dec"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey, sum({_REV_SQL}) AS total_revenue_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier↔part association comes from
    shipped lineitems instead of partsupp, and the excluded-supplier
    subquery is dropped with the missing comment column). Distinct
    supplier count per (brand, type, size) for non-Brand#5 parts in
    five sizes. countDistinct after a distinct pair projection keeps
    the shuffle at association grain, not lineitem grain."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "part"))
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 10, 20, 30, 40)
    )
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 10, 20, 30, 40)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) for Brand#1 parts were
    not taken. The correlated per-part average is a groupBy reusing
    the same scan, broadcast back onto the brand-filtered lines —
    no per-row subquery execution."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#1").select("p_partkey")
    thresh = (
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(F.expr("cast(l_quantity as decimal(18,6))")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                )
            ).alias("qty_thresh")
        )
    )
    small = li.join(thresh, F.col("l_partkey") == F.col("p_partkey")).where(
        F.col("l_quantity") < F.col("qty_thresh")
    )
    return small.agg(
        (
            F.sum(F.expr("cast(l_extendedprice as decimal(18,6))")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


Q17_ORACLE = """
WITH brand_lines AS (
  SELECT l_partkey AS p_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE)) AS qty_thresh
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN brand_lines ON l_partkey = p_partkey
WHERE l_quantity < qty_thresh
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: 'has excess stock' becomes 'shipped
    more than 150 units of red-named parts in 1997', partsupp/availqty
    being absent). Agg-with-HAVING feeding a LEFT SEMI join against
    the supplier dim, nation-filtered — the shape AQE turns into a
    broadcast semi join once the HAVING collapses the fact side."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    red_parts = t["part"].where(F.col("p_name").startswith("red")).select("p_partkey")
    shippers = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr("cast(l_quantity as decimal(18,6))")).alias("qty_dec"))
        .where(F.col("qty_dec") > 150)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 150
  )
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: with no commit/receipt dates, 'the
    supplier who failed the order' becomes 'the only supplier with a
    returned line on a multi-supplier F-status order'). The classic
    formulation is EXISTS + NOT EXISTS self-joins on lineitem; at
    scale that is two extra shuffles of the fact table, so the plan
    here reduces lineitem ONCE to (order, supplier, any-returned) grain
    and derives both existence tests from per-order WINDOW aggregates
    over that grain — a single linear chain (two countDistinct over raw
    lines would Expand-multiply the fact table; a separate per-order
    aggregate would consume the pair frame twice, forcing a persist or
    a duplicate scan). One fact-table shuffle total; the window rides
    the aggregation's existing hash partitioning on l_orderkey."""
    t = load_sf_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    pair = t["lineitem"].groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_ret")
    )
    w = Window.partitionBy("l_orderkey")
    fails = (
        pair.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_ret_supp", F.sum("has_ret").over(w))
        .where(
            (F.col("has_ret") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_ret_supp") == 1)
        )
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        fails.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


EXT_REGISTRY: dict = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_ORACLE),
    "q7_volume_shipping": (q7_volume_shipping, Q7_ORACLE),
    "q8_market_share": (q8_market_share, Q8_ORACLE),
    "q9_product_profit": (q9_product_profit, Q9_ORACLE),
    "q11_important_parts": (q11_important_parts, Q11_ORACLE),
    "q13_customer_distribution": (q13_customer_distribution, Q13_ORACLE),
    "q15_top_supplier": (q15_top_supplier, Q15_ORACLE),
    "q16_supplier_part_counts": (q16_supplier_part_counts, Q16_ORACLE),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_ORACLE),
    "q20_promotion_suppliers": (q20_promotion_suppliers, Q20_ORACLE),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_ORACLE),
}
