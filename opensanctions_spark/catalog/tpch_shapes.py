"""The remaining TPC-H plan shapes, adapted to the synthetic star schema.

The testdata carries no ``partsupp`` table and a trimmed column set
(TESTDATA.md), so the TPC-H queries that need them (Q2/Q9/Q11 supply
cost, Q12/Q21 commit/receipt dates, Q22 phone codes) are re-shaped onto
the available columns — each keeps the *distinctive plan shape* that
made the original a planner exhibit:

- Q2  groupwise-min + rejoin (correlated MIN subquery decorrelation)
- Q7  two-nation volume: same dimension broadcast twice, disjunctive
      cross-filter, year rollup
- Q8  market-share ratio: conditional numerator over a 7-table join
- Q9  profit by (nation, year): expression over two fact-dim joins
- Q11 global scalar-subquery threshold (two-pass aggregate, HAVING)
- Q15 groupwise-max over an aggregated view + equality rejoin
- Q17 per-group AVG correlated subquery, decorrelated to a broadcast
- Q19 OR-of-ANDs disjunctive predicate, pushed through a fact-dim join
- Q22 anti-join against facts + global-average scalar subquery

All money/quantity math runs through DECIMAL so Spark and DuckDB agree
bit-for-bit (threshold comparisons are cross-multiplied into integer
decimal arithmetic — never a float divide on the comparison path), then
casts to DOUBLE at the output boundary only.

Reference anchor: the reference engine has no relational benchmark suite
(SURVEY §6); these are plan-quality exhibits for the Spark engine's
optimizer surface, graded against BASELINE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register

DEC = "decimal(18,2)"


def _dec(c: str):
    """Engine-identical money decimal: round(x*100) collapses the
    DOUBLE->DECIMAL cast divergence (Spark rounds via the shortest
    decimal string, DuckDB via the binary value — the q1 sf1 finding)
    onto the same integer cents in both engines, then exact division
    restores the DECIMAL(18,2) the downstream arithmetic expects."""
    return (
        F.round(F.col(c) * 100).cast("decimal(20,0)") / 100
    ).cast(DEC)


_REVENUE_SQL = (
    "CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))"
    " * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))"
)


def _revenue():
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
cand AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name
  FROM pairs
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 25
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name
FROM cand
WHERE s_acctbal = (
  SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = cand.p_partkey
)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the cheapest qualifying supplier.

    The correlated ``MIN`` subquery decorrelates into a groupwise-min
    aggregate joined back on (partkey, acctbal) — in Spark a window
    ``min over (partition by p_partkey)`` keeps it to ONE shuffle on
    p_partkey instead of the aggregate+self-join's two. Suppliers link
    to parts through distinct lineitem pairs (no partsupp table); the
    distinct rides the same p_partkey-compatible shuffle. region/nation/
    supplier/part are all dimension-sized → broadcast; the only big
    input is the lineitem pair scan (2 columns read)."""
    from pyspark.sql import Window

    pairs = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .drop("_min_bal")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.

    The same nation dimension joins twice under different roles (supplier
    side / customer side) — aliased broadcasts, so neither instance
    shuffles. The disjunctive nation filter can't prune either side
    alone; it applies after both broadcasts. The one real shuffle is
    lineitem⋈orders on orderkey; supplier/customer/nation hang off it
    as broadcasts. Filter on l_shipdate is pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_8")
            )
            | (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("_yr"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("_yr").cast("long").alias("yr"),
            "revenue",
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                          THEN {_REVENUE_SQL} ELSE 0 END) AS DOUBLE)
            / CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
GROUP BY year(o_orderdate)
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue in a region.

    The selective customer→nation→region chain (EUROPE ≈ 1/5) prunes
    ``orders`` BEFORE the fact-fact lineitem⋈orders join — stated
    explicitly because Catalyst does not reorder joins without CBO
    (plan-gated) — so the single shuffle moves ~5× fewer orders rows;
    the ECONOMY part filter prunes lineitem the same way on its side.
    Hard broadcast hints only on nation/region (bounded dims); part /
    supplier / customer scale with SF and carry NO hint (SCALE.md §3) —
    AQE broadcasts them at test scale and degrades gracefully at 100×.
    The ratio is a conditional aggregate — numerator and denominator in
    ONE pass (same trick as q14), not two scans."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue()
    national = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    # semi-join reduction to a literal: the region→nation chain is a
    # bounded dimension (≤25 keys at ANY scale), collected once so the
    # customer prune is a pure pushed filter. As a join output its size
    # estimate would be a PRODUCT (no CBO) — the planner then broadcast
    # 1.5M orders rows instead of the 30k EU customers (measured).
    eu_keys = [
        r["c_nk"]
        for r in n1.join(
            F.broadcast(region), F.col("c_rk") == region.r_regionkey
        ).select("c_nk").collect()
    ]
    cust_eu = cust.filter(cust.c_nationkey.isin(eu_keys)).select("c_custkey")
    # merge hint: same product-estimate trap as q3 — without it the
    # planner broadcasts the filtered lineitem chain instead of the far
    # smaller pruned-orders side
    pruned_orders = orders.join(
        cust_eu, orders.o_custkey == cust_eu.c_custkey
    ).hint("merge")
    supp_n = supp.join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk")).select(
        "s_suppkey", "supp_nation"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(pruned_orders, li.l_orderkey == pruned_orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("_yr"))
        .agg(
            (
                F.sum(national).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .select(F.col("_yr").cast("long").alias("yr"), "mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(SUM({_REVENUE_SQL}
                - CAST(CAST(ROUND(p_retailprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
                  * CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE)
           AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year).

    The testdata has no partsupp.ps_supplycost, so unit cost is proxied
    as p_retailprice per unit — preserving Q9's defining shape: a profit
    *expression* spanning columns from two different dimensions (part
    cost, lineitem revenue) aggregated across a fact-fact join, with a
    non-selective LIKE filter on the part name that must still prune
    through the broadcast. The expression is pure DECIMAL multiply/
    subtract — a decimal *division* here would round at engine-specific
    scales and break the cross-engine hash."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("_yr"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .select("nation", F.col("_yr").cast("long").alias("yr"), "profit")
    )


@register(
    "q11_important_parts",
    oracle=f"""
WITH part_value AS (
  SELECT l_partkey,
         SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
             * CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
FROM part_value
WHERE value * 1000 > (SELECT SUM(value) FROM part_value)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one nation's
    traded value (no partsupp → value = extendedprice×quantity from
    lineitem).

    The defining shape is the global scalar subquery in HAVING: the
    per-part aggregate is computed ONCE, reused for both the global sum
    and the threshold filter (Spark: a 1-row aggregate crossJoin'd back
    — broadcast nested loop, no second scan of lineitem). The threshold
    compare is cross-multiplied (value×1000 > total) so it stays in
    exact DECIMAL on both engines."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = _dec("l_extendedprice") * _dec("l_quantity")
    part_value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("_value"))
    )
    total = part_value.agg(F.sum("_value").alias("_total"))
    return (
        part_value.crossJoin(F.broadcast(total))
        .filter(F.col("_value") * 1000 > F.col("_total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("_value").cast("double").alias("value"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REVENUE_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    Groupwise-max over an aggregated view, then an equality rejoin —
    the view is computed once and persisted through both uses (the max
    probe is a 1-row broadcast back onto it, not a recompute). Revenue
    stays DECIMAL end-to-end so the equality against MAX is exact —
    float revenue here would be a correctness bug, not a perf choice.
    Returns all tied suppliers (like the spec's view formulation)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("_rev"))
    top = revenue.agg(F.max("_rev").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH stats AS (
  SELECT l_partkey AS sk,
         SUM(CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#11'
  GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN stats ON sk = l_partkey
WHERE p_brand = 'Brand#11'
  AND CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)) * 5 * cnt < sum_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.

    The correlated ``0.2 * AVG(l_quantity)`` subquery decorrelates into
    a per-part aggregate joined back to the same filtered scan. The
    brand filter broadcasts into BOTH uses, so the per-part stats frame
    is tiny → broadcast back (no shuffle of the lineitem side). The
    threshold is cross-multiplied — ``qty × 5 × cnt < sum_qty`` ⟺
    ``qty < 0.2 × avg`` — keeping the comparison in exact integer/
    DECIMAL arithmetic on both engines (a float AVG would make the
    boundary rows engine-dependent)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    stats = li.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(stats), F.col("l_partkey") == F.col("sk"))
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides.

    The planner exhibit: the disjunction mixes part columns (brand,
    size) with lineitem columns (quantity), so no single conjunct can
    be fully pushed to either scan — but the *derivable* per-side
    disjunctions can: part gets ``brand IN (...) AND size BETWEEN 1 AND
    15`` (making the broadcast build side tiny) and lineitem gets
    ``quantity BETWEEN 1 AND 30``, both pushed explicitly since
    Catalyst does not infer cross-side disjunction residuals. The full
    OR-of-ANDs then evaluates post-join on the survivors."""
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(1, 15)
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH pos AS (
  SELECT SUM(CAST(CAST(ROUND(c_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS total, COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS nation,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(CAST(ROUND(c_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey, pos
WHERE CAST(CAST(ROUND(c_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)) * cnt > total
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no *recent* orders, by
    nation (no phone column → the country code becomes the nation
    dimension; the synthetic data gives every customer at least one
    order ever, so "idle" means no order since 2000).

    Two planner exhibits in one: the global-average scalar subquery
    (1-row aggregate, broadcast nested-loop back onto the scan — the
    above-average compare is cross-multiplied ``acctbal × cnt > total``
    to stay exact) and the NOT EXISTS anti-join against the fact table,
    which runs AFTER the cheap scalar filter has cut the probe side.
    The anti-join build side is just o_custkey (column-pruned scan)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("total"), F.count("*").alias("cnt")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("total"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
