"""Relational catalog queries: scans, filters, aggregations, joins, top-k.

These exercise the generic operator surface of SURVEY §2 (P*, A2-A7, A12,
J3/J8/J10/J12/J13, T2/T3) on the synthetic star schema, and double as the
bench headliners. Money aggregations run through DECIMAL so Spark and the
DuckDB oracle agree bit-for-bit (order-independent exact sums), then cast
back to DOUBLE.
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


@register(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
      AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
      AS sum_base_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
      / 10000 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
           * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS DOUBLE)
      / 1000000 AS sum_charge,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
      / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
      / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single scan + hash aggregate.

    Plan shape to verify at scale: filter and projection pushed to the
    parquet scan, partial aggregation map-side, one shuffle on the 6-value
    grouping key. No skew hazard (tiny key space + partial agg).

    Money math is integer cents (``round(x·100)`` before any arithmetic):
    a DOUBLE→DECIMAL cast rounds via the shortest decimal string on the
    JVM but via the binary value in DuckDB, a sub-ulp divergence that
    stays invisible at small scale and surfaced at sf1 when the ×10 sums
    crossed a double-ulp boundary (round-2 finding) — ``round(x·100)``
    multiplies first, which collapses both engines onto the same
    integer, and every sum thereafter is exact at any scale factor."""
    li = load(spark, sf_dir, "lineitem")

    def cents(c: str) -> Column:
        return F.round(F.col(c) * 100).cast("long")

    disc_e4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    charge_e6 = disc_e4 * (F.lit(100) + cents("l_tax"))
    # sums go through DECIMAL(38,0): ~4e11 per charge row would overflow
    # an int64 accumulator around sf10 (DuckDB's SUM(BIGINT) is already
    # 128-bit HUGEINT)
    dec = "decimal(38,0)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")).cast("double") / 100).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100).alias("sum_base_price"),
            (F.sum(disc_e4.cast(dec)).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(charge_e6.cast(dec)).cast("double") / 1000000).alias("sum_charge"),
            (F.sum(cents("l_quantity")).cast("double") / 100
             / F.count("*").cast("double")).alias("avg_qty"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100
             / F.count("*").cast("double")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT
  l_orderkey,
  CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
           * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join + top-k (T2 ordering, T3 limit).

    The selective customer dimension (BUILDING ≈ 1/5) joins onto orders
    BEFORE the fact-fact join, so the orderkey shuffle moves ~5× fewer
    orders rows — Catalyst does not reorder joins without CBO, so the
    pruning join order is stated explicitly (plan-gated). No hard
    broadcast hint on customer: it scales with SF (SCALE.md §3 policy) —
    AQE broadcasts it at test scale and falls back to a partitioned join
    at 100×. Top-k by (revenue, orderkey) is a total order →
    deterministic."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    # the merge hint pins the fact-fact join to SMJ: without it the
    # planner's join-size fallback (a PRODUCT of the input sizes) makes
    # the pruned orders side look enormous and it broadcasts 3M+ filtered
    # lineitem rows instead — measured 2.05 s vs 0.98 s at sf1. SMJ on
    # orderkey is also the only shape that survives 100×.
    pruned_orders = orders.join(cust, orders.o_custkey == cust.c_custkey).hint("merge")
    return (
        li.join(pruned_orders, li.l_orderkey == pruned_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "j3_adjacency_region_revenue",
    oracle="""
SELECT
  r_name AS region,
  n_name AS nation,
  CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def j3_adjacency_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-adjacency traversal (J3/J4 analogue): orders→customer→nation→
    region is exactly the entity→referenced-entity expansion of
    ``zavod/zavod/entity.py:185`` / ``zavod/zavod/exporters/simplecsv.py:78-88``,
    depth 3. nation/region broadcast (tiny dims); customer broadcasts at
    this scale and hash-joins at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "j10_dangling_anti_join",
    oracle="""
SELECT c_custkey AS entity_id, c_name AS name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def j10_dangling_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J10): entities never referenced — the dangling-reference
    check of ``zavod/zavod/validators/__init__.py:15-27`` flipped onto the
    star schema (customers with no orders)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("entity_id"), F.col("c_name").alias("name"))
    )


@register(
    "j12_semi_join_gate",
    oracle="""
SELECT n_name AS nation, COUNT(*) AS n_active_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY n_name
""",
)
def j12_semi_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join gate (J12): the publishable-ID set gate of
    ``zavod/zavod/runner/util.py:50-80`` — keep only entities present in a
    qualifying set, never duplicating (semi, not inner)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    active = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return (
        active.join(F.broadcast(nation), active.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_active_customers"))
    )


@register(
    "j8_same_id_equijoin",
    oracle="""
SELECT c_custkey AS shared_key, c_name AS customer_name, s_name AS supplier_name,
       CAST(CAST(CAST(ROUND(c_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)) + CAST(CAST(ROUND(s_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)) AS DOUBLE) AS combined_balance
FROM customer JOIN supplier ON c_custkey = s_suppkey
""",
)
def j8_same_id_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-ID equi-join (J8): subject↔target with identical id, the QID
    fast-path of ``zavod/zavod/runner/local_enricher.py:98-102``."""
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    return (
        cust.join(supp, cust.c_custkey == supp.s_suppkey)
        .select(
            F.col("c_custkey").alias("shared_key"),
            F.col("c_name").alias("customer_name"),
            F.col("s_name").alias("supplier_name"),
            (_dec("c_acctbal") + _dec("s_acctbal")).cast("double").alias("combined_balance"),
        )
    )


@register(
    "j13_lookup_join",
    oracle="""
SELECT n_name AS nation,
  CASE r_name
    WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM' WHEN 'ASIA' THEN 'AS'
    WHEN 'EUROPE' THEN 'EU' WHEN 'MIDDLE EAST' THEN 'ME' ELSE 'XX'
  END AS region_code
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
)
def j13_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datapatch lookup (J13): value→normalized-value rewrite tables
    (``zavod/zavod/runtime/lookups.py:16-83``) rendered as a broadcast map /
    CASE WHEN — constant-folded by Catalyst, zero shuffle."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    lookup = {"AFRICA": "AF", "AMERICA": "AM", "ASIA": "AS", "EUROPE": "EU", "MIDDLE EAST": "ME"}
    mapping = F.create_map(*[F.lit(x) for kv in lookup.items() for x in kv])
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(mapping[F.col("r_name")], F.lit("XX")).alias("region_code"),
        )
    )


@register(
    "j13_lookup_module",
    oracle="""
SELECT n_name AS nation,
  CASE
    WHEN contains(lower(trim(r_name)), 'middle') THEN 'ME'
    WHEN lower(trim(r_name)) = 'africa' THEN 'AF'
    WHEN lower(trim(r_name)) = 'america' THEN 'AM'
    WHEN lower(trim(r_name)) = 'asia' THEN 'AS'
    WHEN lower(trim(r_name)) = 'europe' THEN 'EU'
    ELSE 'XX'
  END AS region_code
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
)
def j13_lookup_module(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 rebuilt on the reusable datapatch module
    (``opensanctions_spark/functions/lookups.py``): the YAML lookup schema
    of ``zavod/zavod/runtime/lookups.py:16-83`` — exact ``match`` options
    plus a weighted ``contains`` option — loaded with ``load_lookups`` and
    compiled to one CASE WHEN chain. Constant-folded by Catalyst: the only
    exchange in the plan is the broadcast of the 5-row region dim."""
    from opensanctions_spark.functions.lookups import load_lookups

    lookups = load_lookups(
        """
lookups:
  region_code:
    normalize: true
    lowercase: true
    options:
      - contains: middle
        weight: 5
        value: ME
      - match: africa
        value: AF
      - match: america
        value: AM
      - match: asia
        value: AS
      - match: europe
        value: EU
"""
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    code = lookups["region_code"].value_column(F.col("r_name"), default=F.lit("XX"))
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_name").alias("nation"), code.alias("region_code"))
    )


@register(
    "a2_entity_counts",
    oracle="""
SELECT n_name AS nation, c_mktsegment AS segment, COUNT(*) AS n_entities
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
""",
)
def a2_entity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics facets (A2): count by schema/country analogue
    (``zavod/zavod/exporters/statistics.py:93-126``)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_entities"))
    )


@register(
    "a3_fill_rate",
    oracle="""
SELECT o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
  CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS fill_rate
FROM orders
GROUP BY o_orderpriority
""",
)
def a3_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property fill rate (A3): entities-with-attribute / entities-per-group
    (``zavod/zavod/exporters/statistics.py:54-70``) — two counts in one pass
    instead of the reference's two scans."""
    orders = load(spark, sf_dir, "orders")
    high = F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        F.sum(high).alias("n_high_value"),
        (F.sum(high).cast("double") / F.count("*").cast("double")).alias("fill_rate"),
    )


@register(
    "a5_last_change",
    oracle="""
SELECT o_custkey AS entity_id,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_change,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_seen,
       COUNT(*) AS n_events
FROM orders
GROUP BY o_custkey
""",
)
def a5_last_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_changed / first_seen rollup (A5/A6):
    ``zavod/zavod/exporters/statistics.py:122-126`` + FtM min/max seen."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("entity_id")).agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_change"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_seen"),
        F.count("*").alias("n_events"),
    )


@register(
    "a7_issue_counts",
    oracle="""
SELECT event_type AS level, COUNT(*) AS n_issues
FROM events
GROUP BY event_type
ORDER BY n_issues DESC, level
""",
)
def a7_issue_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Issue-log aggregation by level (A7,
    ``zavod/zavod/runtime/issues.py:94-101``) with facet ordering (T2)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("level"))
        .agg(F.count("*").alias("n_issues"))
        .orderBy(F.col("n_issues").desc(), F.col("level"))
    )


@register(
    "a12_assertions",
    oracle="""
WITH counts AS (
  SELECT n_name AS nation, COUNT(*) AS n_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT nation, n_customers,
  n_customers >= 10 AS pass_min,
  n_customers <= 500 AS pass_max,
  (n_customers >= 10 AND n_customers <= 500) AS pass
FROM counts
""",
)
def a12_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assertion validation (A12): min/max thresholds over aggregate facets
    (``zavod/zavod/validators/assertions.py:28-183``); `pass_min=false`
    corresponds to the reference's fatal path."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    counts = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )
    return counts.select(
        "nation",
        "n_customers",
        (F.col("n_customers") >= 10).alias("pass_min"),
        (F.col("n_customers") <= 500).alias("pass_max"),
        ((F.col("n_customers") >= 10) & (F.col("n_customers") <= 500)).alias("pass"),
    )


@register(
    "t2_t3_facet_topk",
    oracle="""
SELECT p_brand AS facet, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(ROUND(p_retailprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM part
GROUP BY p_brand
ORDER BY n DESC, facet
LIMIT 15
""",
)
def t2_t3_facet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet ordering + cap (T2/T3): count desc with deterministic
    tie-break, limited — ``zavod/zavod/exporters/statistics.py:13,29``."""
    part = load(spark, sf_dir, "part")
    return (
        part.groupBy(F.col("p_brand").alias("facet"))
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("p_retailprice")).cast("double").alias("total_price"),
        )
        .orderBy(F.col("n").desc(), F.col("facet"))
        .limit(15)
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) > 250
)
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       b.total_qty
FROM big b
JOIN orders ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: full lineitem
    aggregate, HAVING filter, then join back to orders+customer. The
    HAVING cut makes the agg output tiny, so it broadcasts into the
    orders join — the aggregate-then-broadcast shape that avoids
    re-shuffling the fact table a second time at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 250)
        .select("l_orderkey", F.col("_qty").cast("double").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _dec("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name AS nation,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
                * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, nation
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue from orders where the
    supplier and customer share a nation, restricted to one region.

    The join-ordering exhibit, round-5 shape: the bounded region→nation
    chain collapses to a literal key set (≤25 at ANY scale) pushed as an
    ``isin`` filter into BOTH the supplier and customer scans — valid for
    customers because c_nationkey must equal an ASIA s_nationkey — so
    the supplier join prunes lineitem ~1/region-count BEFORE the
    fact-fact orderkey shuffle, and the customer join prunes orders the
    same way. No hard broadcast hints on the SF-scaling tables
    (supplier/customer — SCALE.md §3); the shuffle_hash hint pins the
    fact-fact join against the no-CBO product-estimate trap (see q3 —
    unhinted, the planner broadcasts 6M lineitem rows; measured 2.1 s
    vs 1.5 s at sf1, and the hash build beats merge's double sort by
    ~5%). Round-4's broadcast-everything plan was 1.22 s at sf1 but
    hard-broadcast two SF-scaling dimensions — a driver OOM, not an AQE
    fallback, at 100× — so the 0.3 s is the price of the shape that
    survives scale-up."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    asia = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    asia_keys = [r["n_nationkey"] for r in asia.collect()]
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(asia_keys))
        .select("s_suppkey", "s_nationkey")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(asia_keys))
        .select("c_custkey", "c_nationkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    pruned_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).hint("shuffle_hash")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            pruned_orders,
            (li.l_orderkey == pruned_orders.o_orderkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
                * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       n_name AS nation
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item ranking: lost revenue per customer
    from returned lineitems in one quarter-pair, top-20.

    The selective l_returnflag filter pushes to the lineitem scan
    (dictionary-encoded column → row-group pruning at scale), the date
    window prunes orders before its join, and the final top-k is
    TakeOrderedAndProject — no full sort of the aggregate."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
                  * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
     / CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
                * (1 - CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))) AS DOUBLE)
     AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional-aggregate ratio: the share of one
    month's revenue from PROMO-type parts. One broadcast join (part is
    the dimension), one scan of the date-pruned lineitem slice, both
    numerator and denominator in a single aggregate — the
    CASE-inside-SUM pattern that avoids a second pass or a self-join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "w1_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
""",
)
def w1_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window extension (the reference has no frame-spec windows —
    SURVEY §2.7): exact running revenue per customer in (orderdate,
    orderkey) order. Decimal accumulation keeps the cumulative sum
    order-exact; one shuffle on o_custkey, sort within partitions."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "rollup_revenue",
    oracle="""
SELECT COALESCE(n_name, 'ALL') AS nation,
       CAST(COALESCE(year(o_orderdate), -1) AS BIGINT) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (nation → year → grand total) in ONE pass —
    the multi-granularity statistics the reference computes with separate
    counters per facet (``zavod/zavod/exporters/statistics.py:93-126``),
    expressed as Spark's ROLLUP so partial aggregation covers every level
    in the same shuffle. Null grouping levels are labeled explicitly so
    the cross-engine hash is dtype-stable."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("_yr"), "o_totalprice")
    )
    return (
        joined.rollup("n_name", "_yr")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("_yr"), F.lit(-1)).cast("long").alias("yr"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "approx_distinct_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS hll_within_5pct
FROM events
GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting (HLL++) next to the exact count: the
    oracle asserts the sketch lands within its 5% rsd envelope. At 100 TB
    the exact distinct is a full shuffle of the key universe; the sketch
    is a fixed-size merge — this query records that both paths exist and
    the approximation contract holds. HLL++ is deterministic (no RNG), so
    the boolean is stable across runs."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            # rsd=0.02: measured ≤0.4% error at both test SFs, so the 5%
            # contract holds with wide margin (rsd=0.05 breached it at
            # sf0.1 — 6.7% on 1500 distinct)
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.05)
            ).alias("hll_within_5pct"),
        )
    )


@register(
    "approx_quantile_contract",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS gk_within_rank_eps
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna, ``percentile_approx``) with
    the rank-error contract verified exactly: the sketch's p50 must be an
    order statistic whose rank window overlaps ``0.5*n ± (eps*n + 1)``
    (eps = 1/accuracy = 1e-3). Companion to ``approx_distinct_users`` —
    at 100 TB the exact quantile needs a full sort per group while the GK
    sketch is a fixed-size mergeable map-side aggregate; this query keeps
    both paths live and proves the bound on real data. GK has no RNG, so
    the boolean is deterministic. The rank check joins the (broadcast,
    group-count-sized) sketch row back and counts strict / non-strict
    comparisons, i.e. the value's minimum and maximum possible rank."""
    li = load(spark, sf_dir, "lineitem")
    eps = 0.001
    sk = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, int(1 / eps)).alias("p50_gk"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("l_extendedprice") < F.col("p50_gk")).cast("long")).alias(
                "rank_lo"
            ),
            F.sum((F.col("l_extendedprice") <= F.col("p50_gk")).cast("long")).alias(
                "rank_hi"
            ),
        )
    )
    slack = F.col("n") * F.lit(eps) + F.lit(1.0)
    target = F.col("n") * F.lit(0.5)
    ok = (F.col("rank_lo") <= target + slack) & (F.col("rank_hi") >= target - slack)
    return ranks.select("l_returnflag", "n", ok.alias("gk_within_rank_eps"))


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
v AS (SELECT user_id, MIN(t) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.t) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id AND e.t > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.t) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id AND e.t > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT v.user_id,
       v.t_view AS view_us,
       COALESCE(c.t_click, -1) AS click_us,
       COALESCE(p.t_purchase, -1) AS purchase_us,
       p.t_purchase IS NOT NULL AS completed
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis (view → click → purchase, strictly
    ordered in time, earliest-completion semantics): three stage-wise
    min-aggregations, each conditioned on the previous stage's timestamp.
    Every stage is a groupBy on user_id — the same key end-to-end, so at
    100 TB the whole funnel is ONE partitioning reused across stages
    (timestamps compared in integer microseconds to stay engine-exact)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("t_view").alias("view_us"),
            F.coalesce(F.col("t_click"), F.lit(-1)).alias("click_us"),
            F.coalesce(F.col("t_purchase"), F.lit(-1)).alias("purchase_us"),
            F.col("t_purchase").isNotNull().alias("completed"),
        )
    )


@register(
    "w2_rolling_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rolling_3
FROM orders
""",
)
def w2_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame analytic window (ROWS 2 PRECEDING): 3-order rolling
    revenue per customer — the sliding-frame spec the reference never
    needs but an analytics engine must have; decimal accumulation keeps
    the frame sum exact regardless of evaluation order."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("rolling_3"),
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped priority check: correlated EXISTS as a left-semi
    join (the returned-lineitem probe side is filtered *before* the join
    so the semi-join builds on the reduced set), then a tiny-key hash agg.

    Plan shape at scale: date filter pushed to the orders scan; one
    shuffle pair for the semi-join on l_orderkey; partial agg map-side."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))
             * CAST(CAST(ROUND(l_discount * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS qualifying
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast: the pure pushdown exhibit — every
    predicate is scan-eligible, the projection is two columns, and the
    whole query is one map-side partial sum + a single-row final agg.
    `.explain` shows PushedFilters on shipdate/discount/quantity and a
    two-column ReadSchema; there is no shuffle of data rows at all."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("qualifying"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order distribution: left OUTER join with
    a pushed non-join predicate on the right side, per-customer count
    (COUNT(col) null-skipping semantics preserved), then a second tiny
    re-aggregation on the count value.

    Plan shape at scale: the first shuffle carries (custkey) for join +
    agg on the same key — Catalyst reuses the partitioning, so the
    per-customer count adds no extra exchange; the distribution agg
    shuffles only #distinct-count values."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    per_cust = (
        cust.join(orders, "c_custkey", "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_variety",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier variety (adapted: no partsupp table in
    the synthetic schema, lineitem carries the part↔supplier pairs):
    grouped COUNT(DISTINCT) with a broadcast dimension join and a NOT IN
    exclusion as a broadcast left-anti join on the filtered supplier set.

    Plan shape at scale: part and the excluded-supplier list broadcast
    (both dimension-sized); lineitem never shuffles for either join —
    the only exchange is the distinct-aggregate on the grouping key."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    ).select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size")
    excluded = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(part, "l_partkey")
        .join(excluded, "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "events_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload extraction: the JSON `props` column parsed
    with get_json_object (JVM Jackson path evaluation, no Python) and
    aggregated — the telemetry-payload pattern. Integer sums are exact in
    any engine. At scale the JSON parse is map-side inside codegen; the
    shuffle carries only (event_type, partial agg)."""
    from opensanctions_spark.catalog import load_events

    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_variant_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
GROUP BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The telemetry extraction again through Spark 4 VariantType: props
    parsed ONCE into the compact binary variant encoding
    (``try_parse_json``) and fields read with ``variant_get``. Same answer
    as ``events_json_extract``; the plan difference is what matters at
    scale — N ``get_json_object`` calls re-parse the string N times per
    row, while a variant column is parsed once and each field access is a
    binary offset lookup, which is the path you'd persist
    (``props_variant``) for repeated queries over 100 TB of telemetry."""
    from opensanctions_spark.catalog import load_events

    ev = load_events(spark, sf_dir)
    v = F.try_parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "pivot_status_counts",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders,
       CAST(COALESCE(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS f_total
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (cross-tab): order counts per priority × status plus one
    pivoted decimal sum. The status domain is declared explicitly, so the
    pivot is a single-pass aggregate with no extra values-discovery job
    — at scale exactly one shuffle on the grouping key, each pivot cell a
    conditional partial aggregate."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("f_orders"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("o_orders"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("p_orders"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "F",
                        F.col("o_totalprice").cast(DEC),
                    )
                ),
                F.lit(0).cast(DEC),
            )
            .cast("double")
            .alias("f_total"),
        )
    )


@register(
    "w3_rank_family",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def w3_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic ranking family in one window: rank, dense_rank,
    ntile, percent_rank, cume_dist per market segment (total order —
    acctbal desc, custkey tiebreak — so every function is deterministic).
    One shuffle on the partition key; all five functions share a single
    sort."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "sketch_merge_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS merged_within_5pct
FROM events
GROUP BY event_type
""",
)
def sketch_merge_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Datasketches HLL): stage 1
    builds one sketch per (event_type, day) — the shape of a sketch
    column maintained incrementally per archive partition — and stage 2
    merges the stored sketches with hll_union_agg and estimates. The
    oracle asserts the two-level merge lands within 5% of the exact
    count.

    This is the 100 TB pattern the single-pass approx_count_distinct
    can't give you: per-partition sketches are persisted once (bytes per
    partition, not rows), and any cross-partition rollup — per dataset,
    per month, whole archive — is a fixed-size union over stored state
    instead of a re-scan of the raw data."""
    from opensanctions_spark.catalog import load_events

    ev = load_events(spark, sf_dir)
    per_day = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("merged_within_5pct"),
    )


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l_linestatus AS shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-mode audit (linestatus stands in for
    shipmode — the testdata carries no shipmode column): two-way
    conditional aggregation over the orders join, the date window pushed
    to the lineitem scan. Both priority buckets come out of ONE pass —
    the reference computes pairs of counts the same single-scan way
    (``zavod/zavod/exporters/statistics.py:54-70``)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q20_excess_suppliers",
    oracle="""
WITH pair AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_suppkey, l_partkey
),
per_part AS (
  SELECT l_partkey,
         CAST(SUM(qty_c) AS BIGINT) AS part_qty_c,
         COUNT(*) AS n_suppliers
  FROM pair GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT pair.l_suppkey
  FROM pair JOIN per_part USING (l_partkey)
  WHERE pair.qty_c * per_part.n_suppliers > 2 * per_part.part_qty_c
)
SELECT s_name, n_name AS nation
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested semi-join: suppliers who DOMINATE the
    supply of some 'red' part (pair quantity > 2× the part's mean pair
    quantity — the correlated scalar threshold Q20 expresses with a
    correlated subquery, decorrelated here into an aggregate + join; no
    partsupp table exists, so shipped quantity stands in for availqty).
    All quantity math is integer cents so the threshold comparison is a
    pure integer cross-multiply — no division, no float. Plan: part
    filter broadcast into the lineitem join, one (supp, part) agg, the
    tiny per-part stats joined back, DISTINCT suppliers semi-joined into
    the supplier dim with the nation broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    qty_c = F.sum(F.round(F.col("l_quantity") * 100).cast("long")).cast("long")
    pair = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(qty_c.alias("qty_c"))
    )
    per_part = pair.groupBy("l_partkey").agg(
        F.sum("qty_c").cast("long").alias("part_qty_c"),
        F.count("*").alias("n_suppliers"),
    )
    dominant = (
        pair.join(per_part, "l_partkey")
        .filter(
            F.col("qty_c") * F.col("n_suppliers") > 2 * F.col("part_qty_c")
        )
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        supp.join(dominant, "s_suppkey", "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM li
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
),
stats AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM li GROUP BY l_orderkey
),
late_stats AS (
  SELECT l_orderkey, COUNT(*) AS n_late FROM late GROUP BY l_orderkey
),
waiting AS (
  SELECT late.l_suppkey, late.l_orderkey
  FROM late
  JOIN stats USING (l_orderkey)
  JOIN late_stats USING (l_orderkey)
  WHERE stats.n_supp > 1 AND late_stats.n_late = 1
),
ranked AS (
  SELECT s_name, COUNT(*) AS numwait,
         row_number() OVER (ORDER BY COUNT(*) DESC, s_name) AS rank
  FROM waiting JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY s_name
)
SELECT s_name, numwait, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: the classic
    correlated EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier) pair, DECORRELATED into per-order counts —
    n_supp > 1 ∧ n_late = 1 is exactly the EXISTS/NOT-EXISTS conjunction
    for a supplier already late on the order, but costs one aggregation
    of the fact table instead of two additional self-joins (the shape
    Catalyst's own decorrelation produces, written explicitly so the
    oracle pins the equivalence). 'Late' = shipped > 90 days after the
    order date (the testdata has no commit/receipt dates)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").filter(
                F.col("o_orderstatus") == "F"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = (
        li.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    stats = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    late_stats = late.groupBy("l_orderkey").agg(F.count("*").alias("n_late"))
    waiting = (
        late.join(stats, "l_orderkey")
        .join(late_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load(spark, sf_dir, "supplier")
    counts = (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("numwait").desc(), "s_name")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )
