"""Pipeline catalog queries: the statement/entity engine on synthetic data.

Exercises the reference-shaped pipeline operators (SURVEY A1/A6/A8, J1/J2/
J6, D0-D3, P1/P2/P5, F8, T4/T5, F12) against the star-schema test tables
per FIXTURES.md §F-6: customers/suppliers are melted into the canonical
statements IR, then every downstream operator is a DataFrame plan whose
DuckDB oracle is spelled out longhand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register
from opensanctions_spark.model.melt import melt_customers, melt_suppliers, finish_statements
from opensanctions_spark.model.registry import common_schema_rank_column
from opensanctions_spark.operators.assembly import assemble_properties
from opensanctions_spark.operators.consolidate import drop_prefix_values
from opensanctions_spark.operators.delta import entity_hash, version_diff
from opensanctions_spark.operators.resolve import canonical_map
from opensanctions_spark.operators.timestamps import propagate_first_seen
from opensanctions_spark.session import materialize

RUN_TIME = "2026-08-13T00:00:00"
PREV_TIME = "2026-08-01T00:00:00"
ALIAS_TIME = "2026-08-12T00:00:00"


def _customer_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melted customer statements + Person-schema alias statements for every
    third entity — exercises multi-valued props and schema widening.

    ONE scan: the alias row rides in the same stack() projection as the
    base properties (null value for non-alias entities → dropped by the
    P5 guard), instead of a second scan + union — at 100 TB the emit
    stage reads the source exactly once."""
    cust = load(spark, sf_dir, "customer")
    stacked = cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        F.expr(
            "stack(5, "
            "'name', c_name, 'LegalEntity', '{run}', "
            "'country', cast(c_nationkey as string), 'LegalEntity', '{run}', "
            "'balance', cast(c_acctbal as string), 'LegalEntity', '{run}', "
            "'segment', c_mktsegment, 'LegalEntity', '{run}', "
            "'name', if(c_custkey % 3 = 0, upper(c_name), null), 'Person', '{alias}'"
            ") as (prop, value, schema, first_seen)".format(
                run=RUN_TIME, alias=ALIAS_TIME
            )
        ),
    )
    return finish_statements(stacked, dataset="customers")


_STMTS_SQL = """
  SELECT 'c-' || c_custkey AS entity_id, 'name' AS prop, c_name AS value,
         'LegalEntity' AS sch, '{run}' AS first_seen, '{run}' AS last_seen,
         (c_custkey % 4 = 0) AS external
  FROM customer
  UNION ALL
  SELECT 'c-' || c_custkey, 'country', CAST(c_nationkey AS VARCHAR),
         'LegalEntity', '{run}', '{run}', (c_custkey % 4 = 0)
  FROM customer
  UNION ALL
  SELECT 'c-' || c_custkey, 'balance', CAST(c_acctbal AS VARCHAR),
         'LegalEntity', '{run}', '{run}', (c_custkey % 4 = 0)
  FROM customer
  UNION ALL
  SELECT 'c-' || c_custkey, 'segment', c_mktsegment,
         'LegalEntity', '{run}', '{run}', (c_custkey % 4 = 0)
  FROM customer
  UNION ALL
  SELECT 'c-' || c_custkey, 'name', upper(c_name),
         'Person', '{alias}', '{run}', (c_custkey % 4 = 0)
  FROM customer WHERE c_custkey % 3 = 0
""".format(run=RUN_TIME, alias=ALIAS_TIME)


@register(
    "a1_entity_assembly",
    oracle=f"""
WITH stmts AS ({_STMTS_SQL}),
per_prop AS (
  SELECT entity_id, prop,
         string_agg(value, ',' ORDER BY value) AS vals,
         max(CASE sch WHEN 'Person' THEN 3 ELSE 2 END) AS rank,
         min(first_seen) AS fs, max(last_seen) AS ls
  FROM stmts
  GROUP BY entity_id, prop
)
SELECT entity_id AS canonical_id,
       CASE max(rank) WHEN 3 THEN 'Person' ELSE 'LegalEntity' END AS entity_schema,
       string_agg(prop || '=' || vals, ';' ORDER BY prop) AS props_str,
       COUNT(*) AS n_props,
       min(fs) AS first_seen,
       max(ls) AS last_seen
FROM per_prop
GROUP BY entity_id
""",
)
def a1_entity_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core statement→entity aggregation (A1 + A6 + schema widening).

    LegalEntity base statements plus Person alias statements widen every
    third entity to Person via the lattice-rank max — the Spark rendering
    of ``zavod/zavod/store.py:36-74`` + ``zavod/zavod/entity.py:155-162``,
    one shuffle, no Python in the row path. The explicit canonical_id
    repartition serves BOTH aggregations (subset clustering) — see
    operators/assembly.py."""
    per_prop = assemble_properties(
        _customer_statements(spark, sf_dir).repartition("canonical_id")
    )
    return (
        per_prop.groupBy("canonical_id")
        .agg(
            F.max_by("schema", common_schema_rank_column(F.col("schema"))).alias("entity_schema"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws("=", F.col("prop"), F.array_join(F.col("values"), ","))
                    )
                ),
                ";",
            ).alias("props_str"),
            F.count("*").alias("n_props"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
    )


@register(
    "s9_p2_statement_filters",
    oracle=f"""
WITH stmts AS ({_STMTS_SQL})
SELECT prop, COUNT(*) AS n_internal
FROM stmts
WHERE NOT external AND value IS NOT NULL AND len(value) > 0
GROUP BY prop
""",
)
def s9_p2_statement_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statement-source filters (S9/P2/P5): read the statement store,
    drop `external` enrichment candidates
    (``zavod/zavod/archive/__init__.py:292-296``) and empty values."""
    stmts = _customer_statements(spark, sf_dir).withColumn(
        "external", F.col("entity_id").substr(F.lit(3), F.lit(99)).cast("long") % 4 == 0
    )
    return (
        stmts.filter(~F.col("external"))
        .filter(F.col("value").isNotNull() & (F.length("value") > 0))
        .groupBy("prop")
        .agg(F.count("*").alias("n_internal"))
    )


@register(
    "p1_target_filter",
    oracle="""
SELECT 'c-' || c_custkey AS entity_id,
       CASE c_mktsegment WHEN 'BUILDING' THEN 'sanction'
                         WHEN 'AUTOMOBILE' THEN 'crime' ELSE 'other' END AS topic,
       c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS is_target
FROM customer
""",
)
def p1_target_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived target flag (P1): topics ∩ RISK_TOPICS ≠ ∅
    (``zavod/zavod/entity.py:164-167``), with topics synthesized from the
    market segment. The array_intersect runs JVM-side."""
    cust = load(spark, sf_dir, "customer")
    topic = (
        F.when(F.col("c_mktsegment") == "BUILDING", "sanction")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "crime")
        .otherwise("other")
    )
    risks = F.array(F.lit("sanction"), F.lit("crime"))
    return cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        topic.alias("topic"),
        (F.size(F.array_intersect(F.array(topic), risks)) > 0).alias("is_target"),
    )


@register(
    "j1_timestamp_join",
    oracle=f"""
SELECT o_orderkey AS entity_id,
       CASE WHEN o_orderkey % 10 <> 0 THEN '{PREV_TIME}' ELSE '{RUN_TIME}' END AS first_seen,
       (o_orderkey % 10 = 0) AS is_new
FROM orders
""",
)
def j1_timestamp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_seen propagation (J1): current statements left-join the
    previous version's (id → first_seen) index, coalescing misses to the
    run time (``zavod/zavod/runtime/timestamps.py:26-56``). Every tenth
    order is "new" in this synthetic previous version."""
    orders = load(spark, sf_dir, "orders")
    sid = F.md5(F.concat_ws("|", F.lit("orders"), F.col("o_orderkey")))
    curr = orders.select(F.col("o_orderkey").alias("entity_id"), sid.alias("id"))
    prev = (
        orders.filter(F.col("o_orderkey") % 10 != 0)
        .select(sid.alias("id"), F.lit(PREV_TIME).alias("first_seen"))
    )
    out = propagate_first_seen(curr, prev, run_time=RUN_TIME)
    return out.select(
        "entity_id", "first_seen", (F.col("first_seen") == RUN_TIME).alias("is_new")
    )


@register(
    "d0_d1_version_delta",
    oracle="""
WITH classified AS (
  SELECT 'p-' || p_partkey AS entity_id,
    CASE WHEN p_partkey % 7 = 0 AND p_partkey % 11 <> 0 THEN 'ADD'
         WHEN p_partkey % 11 = 0 AND p_partkey % 7 <> 0 THEN 'DEL'
         WHEN p_partkey % 5 = 0 AND p_partkey % 7 <> 0 AND p_partkey % 11 <> 0 THEN 'MOD'
    END AS op
  FROM part
)
SELECT entity_id, op FROM classified WHERE op IS NOT NULL
""",
)
def d0_d1_version_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity content hash + ADD/MOD/DEL version diff (D0/D1):
    ``zavod/zavod/runtime/delta.py:46-102``. prev = parts w/o every 7th,
    curr = parts w/o every 11th with every 5th price bumped; the full-outer
    hash compare must recover exactly that closed form."""
    part = load(spark, sf_dir, "part")
    price = F.col("p_retailprice").cast("decimal(18,2)")

    def hashed(df: DataFrame, price_col) -> DataFrame:
        return df.select(
            F.concat(F.lit("p-"), F.col("p_partkey")).alias("canonical_id"),
            entity_hash(
                F.col("p_partkey").cast("string"),
                F.col("p_name"),
                F.col("p_brand"),
                price_col.cast("string"),
            ).alias("entity_hash"),
        )

    prev = hashed(part.filter(F.col("p_partkey") % 7 != 0), price)
    curr_price = F.when(F.col("p_partkey") % 5 == 0, price + 1).otherwise(price)
    curr = hashed(part.filter(F.col("p_partkey") % 11 != 0), curr_price)
    return version_diff(prev, curr, key="canonical_id").select(
        F.col("canonical_id").alias("entity_id"), "op"
    )


@register(
    "j6_canonical_map",
    oracle="""
SELECT 'c-' || c_custkey AS entity_id,
       'c-' || (c_custkey % 100) AS canonical_id
FROM customer
""",
)
def j6_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-find canonicalization (J6): connected components over POSITIVE
    judgement edges (``zavod/zavod/integration/dedupe.py:93-128``).
    Synthetic decisions chain customers sharing custkey mod 100 (chains of
    15 — forces multiple propagation rounds); NEGATIVE edges (mod 50) must
    be ignored. Canonical = min member, oracle = custkey % 100."""
    cust = load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_custkey") >= 100).select(
        F.col("c_custkey").alias("left_id"),
        (F.col("c_custkey") - 100).alias("right_id"),
        F.lit("POSITIVE").alias("judgement"),
    )
    neg = cust.filter(F.col("c_custkey") >= 50).select(
        F.col("c_custkey").alias("left_id"),
        (F.col("c_custkey") - 50).alias("right_id"),
        F.lit("NEGATIVE").alias("judgement"),
    )
    mapping = canonical_map(pos.unionByName(neg))
    # isolated nodes (none here, but semantics: identity mapping)
    all_nodes = cust.select(F.col("c_custkey").alias("entity_id"))
    return (
        all_nodes.join(mapping, "entity_id", "left")
        .select(
            F.concat(F.lit("c-"), F.col("entity_id")).alias("entity_id"),
            F.concat(
                F.lit("c-"), F.coalesce(F.col("canonical_id"), F.col("entity_id"))
            ).alias("canonical_id"),
        )
    )


@register(
    "graph_component_histogram",
    oracle="""
WITH comp AS (
  SELECT 'c-' || (c_custkey % 100) AS canonical_id, COUNT(*) AS n_members
  FROM customer GROUP BY c_custkey % 100
)
SELECT CAST(n_members AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM comp GROUP BY n_members
""",
)
def graph_component_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-cluster size distribution — the resolver-health diagnostic
    run after every xref ("how big did the merge clusters get"; a sudden
    mega-cluster means a bad judgement bridged unrelated entities, the
    failure mode the edge-dedupe ambiguity rules exist to stop). Layered
    on the full J6 canonicalization: connected components → members per
    canonical id → clusters per size. Two bounded aggregations after the
    CC labels — at 100 TB the histogram is label-size work, never
    edge-size."""
    mapping = j6_canonical_map(spark, sf_dir)
    sizes = mapping.groupBy("canonical_id").agg(
        F.count("*").alias("n_members")
    )
    return (
        sizes.groupBy(F.col("n_members").cast("long").alias("cluster_size"))
        .agg(F.count("*").cast("long").alias("n_clusters"))
    )


@register(
    "j6_incremental_resolver",
    oracle="""
SELECT 'c-' || c_custkey AS entity_id,
       'c-' || (c_custkey % 50) AS canonical_id
FROM customer
""",
)
def j6_incremental_resolver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-canonicalization (SURVEY §7.3 hard-part (b)): start
    from the mod-100 chain clusters of j6_canonical_map, then apply a
    batch of NEW judgements linking cluster k to cluster k+50 (k < 50).
    Only the touched components dissolve and re-solve; the closed form of
    the result is canonical = custkey % 50, which the oracle states
    directly — so the hash check proves incremental == full recompute."""
    from opensanctions_spark.operators.resolve import incremental_canonical_map

    cust = load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_custkey") >= 100).select(
        F.col("c_custkey").alias("left_id"),
        (F.col("c_custkey") - 100).alias("right_id"),
        F.lit("POSITIVE").alias("judgement"),
    )
    base = canonical_map(pos)
    all_nodes = cust.select(F.col("c_custkey").alias("entity_id"))
    mapping = (
        all_nodes.join(base, "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce(F.col("canonical_id"), F.col("entity_id")).alias(
                "canonical_id"
            ),
        )
        # the incremental solve consumes the snapshot three times
        # (touched-component probe, affected slice, untouched anti-join);
        # cut the base-CC join so it runs once (round 13)
        .transform(materialize, eager=False)
    )
    new = cust.filter(F.col("c_custkey") < 50).select(
        F.col("c_custkey").alias("left_id"),
        (F.col("c_custkey") + 50).alias("right_id"),
        F.lit("POSITIVE").alias("judgement"),
    )
    updated = incremental_canonical_map(mapping, new)
    return updated.select(
        F.concat(F.lit("c-"), F.col("entity_id")).alias("entity_id"),
        F.concat(F.lit("c-"), F.col("canonical_id")).alias("canonical_id"),
    )


@register(
    "k11_sql_load_prep",
    oracle=f"""
WITH stmts AS ({_STMTS_SQL}),
hashed AS (
  SELECT md5('customers' || '|' || entity_id || '|' || prop || '|' || value) AS id,
         entity_id, entity_id AS canonical_id, prop, sch AS schema, value,
         'customers' AS dataset
  FROM stmts WHERE sch = 'LegalEntity'
)
SELECT DISTINCT id, entity_id, canonical_id, prop, schema, value, dataset
FROM hashed
""",
)
def k11_sql_load_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-load sink preparation (K11, ``zavod/zavod/tools/load_db.py:15-41``):
    content-hash dedupe (D3) + the reference's column projection, fed a
    deliberately doubled statement stream — the upsert-safe frame
    ``write.jdbc`` ships to the RDBMS (driver jar not present here; the
    write itself is config)."""
    from opensanctions_spark.exporters.jdbc import prepare_statements_for_db

    cust = load(spark, sf_dir, "customer")
    stmts = melt_customers(cust)
    doubled = stmts.unionByName(stmts)
    prepared = prepare_statements_for_db(doubled)
    return prepared.select(
        "id", "entity_id", "canonical_id", "prop", "schema", "value", "dataset"
    )


@register(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(CAST(ROUND(l_quantity * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a 3-value (maximally skewed)
    grouping key: phase 1 shuffles on (key, salt16) so no reducer sees a
    whole hot key, phase 2 reduces ≤16 partials per key. The oracle is
    the plain groupBy — salting must be result-invariant. The explicit-
    plan fallback for skew AQE can't split (single-key aggregations)."""
    from opensanctions_spark.operators.skew import salted_sum_count

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.round(F.col("l_quantity") * 100).cast("decimal(20,0)") / 100)
        .cast("decimal(18,2)")
        .alias("qty"),
    )
    out = salted_sum_count(li, ["l_returnflag"], "qty", n_salts=16)
    return out.select(
        "l_returnflag",
        F.col("total").cast("double").alias("total"),
        "n_rows",
    )


@register(
    "skew_salted_join",
    oracle="""
SELECT l_returnflag AS flag,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY l_returnflag
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated equi-join, result-invariant vs the plain join
    oracle: the big (lineitem) side gets a deterministic 16-way salt, the
    dimension side is replicated across every salt bucket and broadcast,
    and the join key becomes (key, salt) — no reducer ever meets a whole
    hot key. The explicit-plan fallback for the skew AQE's splitter can't
    fix (broadcastable small side, pathologically hot big-side key — the
    mega-entity / stopword-token case called out in SCALE.md §2)."""
    from opensanctions_spark.operators.skew import replicate_broadcast_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    joined = replicate_broadcast_join(li, orders, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.round(F.col("l_extendedprice") * 100).cast("decimal(20,0)") / 100).cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "j2_canonical_rekey",
    oracle="""
SELECT 'c-' || (o_custkey % 100) AS canonical_id,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_custkey % 100
""",
)
def j2_canonical_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization join (J2): rewrite foreign keys through the
    resolver's canonical map (broadcast) then aggregate per canonical
    entity — ``zavod/zavod/tools/util.py:28-36``."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_custkey") >= 100).select(
        F.col("c_custkey").alias("left_id"),
        (F.col("c_custkey") - 100).alias("right_id"),
        F.lit("POSITIVE").alias("judgement"),
    )
    mapping = canonical_map(pos)
    m = F.broadcast(
        mapping.select(
            F.col("entity_id").alias("_ck"), F.col("canonical_id").alias("_canon")
        )
    )
    return (
        orders.join(m, orders.o_custkey == F.col("_ck"), "left")
        .withColumn("canon_key", F.coalesce(F.col("_canon"), F.col("o_custkey")))
        .groupBy(F.concat(F.lit("c-"), F.col("canon_key")).alias("canonical_id"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum((F.round(F.col("o_totalprice") * 100).cast("decimal(20,0)") / 100).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "d2_d3_union_dedupe",
    oracle=f"""
WITH cust_stmts AS ({_STMTS_SQL}),
supp_stmts AS (
  SELECT 's-' || s_suppkey AS entity_id, 'name' AS prop, s_name AS value FROM supplier
  UNION ALL
  SELECT 's-' || s_suppkey, 'country', CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT 's-' || s_suppkey, 'balance', CAST(s_acctbal AS VARCHAR) FROM supplier
),
unioned AS (
  SELECT 'customers' AS dataset,
         md5('customers' || '|' || entity_id || '|' || prop || '|' || value) AS id
  FROM cust_stmts
  UNION ALL
  SELECT 'suppliers',
         md5('suppliers' || '|' || entity_id || '|' || prop || '|' || value)
  FROM supp_stmts
)
SELECT dataset, COUNT(DISTINCT id) AS n_statements
FROM unioned
GROUP BY dataset
""",
)
def d2_d3_union_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection union + statement dedupe (D2/D3): union the leaf
    datasets' statements (``zavod/zavod/archive/__init__.py:299-303``) and
    collapse duplicate statement ids (``zavod/zavod/tools/util.py:39-62``).
    The customer alias statements collide with nothing, but upper-cased
    names equal to existing ids would — dropDuplicates on the content hash
    is the invariant."""
    cust_stmts = _customer_statements(spark, sf_dir)
    supp_stmts = melt_suppliers(load(spark, sf_dir, "supplier"))
    unioned = cust_stmts.unionByName(supp_stmts).dropDuplicates(["id"])
    return unioned.groupBy("dataset").agg(F.count("*").alias("n_statements"))


@register(
    "a8_t4_prefix_date_dedup",
    oracle="""
WITH vals AS (
  SELECT DISTINCT 'c-' || o_custkey AS canonical_id,
    substr(strftime(o_orderdate, '%Y-%m-%d'), 1,
           CASE WHEN o_orderkey % 3 = 0 THEN 4
                WHEN o_orderkey % 3 = 1 THEN 7 ELSE 10 END) AS value
  FROM orders
)
SELECT canonical_id, value
FROM vals v
WHERE NOT EXISTS (
  SELECT 1 FROM vals v2
  WHERE v2.canonical_id = v.canonical_id
    AND v2.value <> v.value
    AND starts_with(v2.value, v.value)
)
""",
)
def a8_t4_prefix_date_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-date simplification (A8/T4): drop ISO prefix dates subsumed
    by longer values for the same entity
    (``zavod/zavod/exporters/consolidate.py:48-90``). One desc-ordered
    window with lag — O(n log n), no self-join; the oracle spells the
    quadratic NOT EXISTS semantics."""
    orders = load(spark, sf_dir, "orders")
    cut = (
        F.when(F.col("o_orderkey") % 3 == 0, 4)
        .when(F.col("o_orderkey") % 3 == 1, 7)
        .otherwise(10)
    )
    vals = orders.select(
        F.concat(F.lit("c-"), F.col("o_custkey")).alias("canonical_id"),
        F.expr("date_format(o_orderdate, 'yyyy-MM-dd')").substr(F.lit(1), cut).alias("value"),
    )
    return drop_prefix_values(vals, keys=["canonical_id"])


@register(
    "f8_deterministic_ids",
    oracle="""
SELECT 'c-' || c_custkey AS entity_id,
       'osp-' || md5('customer' || '|' || c_custkey || '|' || c_name) AS stable_id,
       lower(regexp_replace(c_name, '[^a-zA-Z0-9]+', '-', 'g')) AS slug
FROM customer
""",
)
def f8_deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ids (F8): make_id = prefix + content hash over parts;
    make_slug (``zavod/zavod/context.py:504-531``)."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        F.concat(
            F.lit("osp-"),
            F.md5(F.concat_ws("|", F.lit("customer"), F.col("c_custkey"), F.col("c_name"))),
        ).alias("stable_id"),
        F.lower(F.regexp_replace(F.col("c_name"), "[^a-zA-Z0-9]+", "-")).alias("slug"),
    )


@register(
    "f12_t5_active_status",
    oracle="""
SELECT user_id,
       epoch_us(MIN(ts)) AS start_us,
       epoch_us(MAX(ts)) AS end_us,
       (MIN(ts) <= TIMESTAMP '2024-01-15 00:00:00'
        AND MAX(ts) >= TIMESTAMP '2024-01-15 00:00:00') AS active,
       COALESCE(epoch_us(MAX(CASE WHEN event_type = 'purchase' THEN ts END)),
                epoch_us(MAX(CASE WHEN event_type = 'click' THEN ts END)),
                epoch_us(MAX(ts))) AS effective_us
FROM events
GROUP BY user_id
""",
)
def f12_t5_active_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sanction active-status (F12: min(start) ≤ now ≤ max(end),
    ``zavod/zavod/helpers/sanctions.py:100-113``) + effective-date
    precedence chain (T5: coalesce over prioritized date props,
    ``zavod/zavod/stateful/positions.py:195-201``)."""
    events = load(spark, sf_dir, "events")
    now = F.lit("2024-01-15 00:00:00").cast("timestamp")
    purchase = F.when(F.col("event_type") == "purchase", F.col("ts"))
    click = F.when(F.col("event_type") == "click", F.col("ts"))
    return events.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
        ((F.min("ts") <= now) & (F.max("ts") >= now)).alias("active"),
        F.coalesce(
            F.unix_micros(F.max(purchase)),
            F.unix_micros(F.max(click)),
            F.unix_micros(F.max("ts")),
        ).alias("effective_us"),
    )


@register(
    "scd2_entity_history",
    oracle="""
WITH history AS (
  SELECT 'p-' || p_partkey AS entity_id, v.version,
         md5('p-' || p_partkey || '|' ||
             CASE WHEN v.version >= 2 AND p_partkey % 5 = 0
                  THEN p_retailprice + 1 ELSE p_retailprice END ||
             CASE WHEN v.version >= 3 AND p_partkey % 7 = 0
                  THEN '|rev' ELSE '' END) AS entity_hash
  FROM part, (SELECT UNNEST([1, 2, 3]) AS version) v
),
marked AS (
  SELECT entity_id, version, entity_hash,
         CASE WHEN lag(entity_hash) OVER w IS NULL
                OR entity_hash <> lag(entity_hash) OVER w
              THEN 1 ELSE 0 END AS is_new
  FROM history
  WINDOW w AS (PARTITION BY entity_id ORDER BY version)
),
starts AS (SELECT * FROM marked WHERE is_new = 1)
SELECT entity_id, entity_hash,
       version AS valid_from,
       lead(version) OVER w2 AS valid_to,
       lead(version) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY entity_id ORDER BY version)
""",
)
def scd2_entity_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity intervals over a three-version entity history
    (archive §1.5 as a queryable dimension): version 2 re-prices every
    5th part, version 3 revises every 7th — intervals collapse runs of
    identical D0 hashes into [valid_from, valid_to) with an is_current
    flag. One window partitioning, no joins."""
    from opensanctions_spark.operators.delta import scd2_intervals

    part = load(spark, sf_dir, "part")
    versions = spark.range(1, 4).select(F.col("id").cast("int").alias("version"))
    hist = part.crossJoin(F.broadcast(versions)).select(
        F.concat(F.lit("p-"), F.col("p_partkey")).alias("entity_id"),
        "version",
        F.md5(
            F.concat(
                F.lit("p-"), F.col("p_partkey"), F.lit("|"),
                F.when(
                    (F.col("version") >= 2) & (F.col("p_partkey") % 5 == 0),
                    F.col("p_retailprice") + 1,
                ).otherwise(F.col("p_retailprice")),
                F.when(
                    (F.col("version") >= 3) & (F.col("p_partkey") % 7 == 0),
                    F.lit("|rev"),
                ).otherwise(F.lit("")),
            )
        ).alias("entity_hash"),
    )
    return scd2_intervals(hist)


_CURATE_BUCKET100 = (
    "(4096 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    " + 256 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
    " + 16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100"
)


@register(
    "pipeline_curate_corpus",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, source, text,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
             AS n_tokens,
         md5(text) AS fp
  FROM documents
),
q AS (SELECT * FROM toks WHERE n_tokens BETWEEN 10 AND 1000),
exk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM q
  ) WHERE rn = 1
),
shingles AS (
  SELECT DISTINCT doc_id, sh AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM exk)
  )
),
perms AS (SELECT unnest(range(8)) AS k),
minhash AS (
  SELECT doc_id, k, MIN(substr(md5(shingle), k * 3 + 1, 8)) AS mh
  FROM shingles CROSS JOIN perms GROUP BY doc_id, k
),
mh_pairs AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS n_bands
  FROM minhash a JOIN minhash b
    ON a.k = b.k AND a.mh = b.mh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (SELECT left_id, right_id FROM mh_pairs WHERE n_bands >= 4),
sym AS (
  SELECT left_id AS a, right_id AS b FROM edges
  UNION SELECT right_id, left_id FROM edges
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
keep AS (
  SELECT e.doc_id, e.lang, e.source, e.n_tokens
  FROM exk e LEFT JOIN comp c ON e.doc_id = c.node
  WHERE COALESCE(c.component, e.doc_id) = e.doc_id
),
splitted AS (
  SELECT *,
         CASE WHEN {_CURATE_BUCKET100} < 80 THEN 'train'
              WHEN {_CURATE_BUCKET100} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM keep
),
cum AS (
  SELECT doc_id, lang, source, n_tokens, split,
         SUM(n_tokens) OVER (PARTITION BY split, lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM splitted
)
SELECT doc_id, lang, source, n_tokens, split,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 256 AS BIGINT) AS pack_offset
FROM cum
""",
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five-stage corpus-curation pipeline END TO END (quality gate →
    exact dedup → MinHash near-dedup with connected components → stable
    split → sequence packing) — ``plans/curate.py`` run as one job graph.
    Every stage is individually oracled elsewhere; this query pins the
    COMPOSITION: stage coupling (near-dedup runs on exact-dedup
    survivors; packing runs per (split, lang) stream) is where hand-wired
    pipelines silently drift. The oracle replays all five stages in one
    recursive-CTE SQL statement."""
    from opensanctions_spark.plans.curate import curate_corpus

    return curate_corpus(load(spark, sf_dir, "documents"))


def _curate_stage_sql(wave: str, src: str) -> str:
    """Shared per-wave SQL fragments: tokens/quality (t{w}, q{w}) and
    shingle→minhash-band CTEs over a given keeper CTE."""
    return f"""
t{wave} AS (
  SELECT doc_id, lang, source, text,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
             AS n_tokens,
         md5(text) AS fp
  FROM {src}
),
q{wave} AS (SELECT * FROM t{wave} WHERE n_tokens BETWEEN 10 AND 1000)
"""


def _minhash_sql(tag: str, src: str) -> str:
    return f"""
sh{tag} AS (
  SELECT DISTINCT doc_id, sh AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM {src})
  )
),
mh{tag} AS (
  SELECT doc_id, k, MIN(substr(md5(shingle), k * 3 + 1, 8)) AS mh
  FROM sh{tag} CROSS JOIN (SELECT unnest(range(8)) AS k) perms
  GROUP BY doc_id, k
)
"""


def _cc_sql(tag: str, mh: str) -> str:
    return f"""
mp{tag} AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS n_bands
  FROM {mh} a JOIN {mh} b
    ON a.k = b.k AND a.mh = b.mh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sym{tag} AS (
  SELECT left_id AS a, right_id AS b FROM mp{tag} WHERE n_bands >= 4
  UNION SELECT right_id, left_id FROM mp{tag} WHERE n_bands >= 4
),
reach{tag} AS (
  SELECT a, b FROM sym{tag}
  UNION
  SELECT r.a, s.b FROM reach{tag} r JOIN sym{tag} s ON r.b = s.a
),
comp{tag} AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach{tag} GROUP BY a
)
"""


_CURATE_INCREMENT_ORACLE = f"""
WITH RECURSIVE
w1 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
{_curate_stage_sql('1', 'w1').strip()},
exk1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM q1
  ) WHERE rn = 1
),
{_minhash_sql('1', 'exk1').strip()},
{_cc_sql('1', 'mh1').strip()},
keep1 AS (
  SELECT e.doc_id, e.fp
  FROM exk1 e LEFT JOIN comp1 c ON e.doc_id = c.node
  WHERE COALESCE(c.component, e.doc_id) = e.doc_id
),
fps AS (SELECT DISTINCT fp FROM keep1),
bands AS (SELECT m.* FROM mh1 m JOIN keep1 k ON m.doc_id = k.doc_id),
w2 AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
{_curate_stage_sql('2', 'w2').strip()},
fresh2 AS (SELECT * FROM q2 WHERE fp NOT IN (SELECT fp FROM fps)),
exk2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM fresh2
  ) WHERE rn = 1
),
{_minhash_sql('2', 'exk2').strip()},
vs_prior AS (
  SELECT DISTINCT n.doc_id
  FROM (
    SELECT b2.doc_id, b1.doc_id AS prior_id, COUNT(*) AS n_bands
    FROM mh2 b2 JOIN bands b1 ON b2.k = b1.k AND b2.mh = b1.mh
    GROUP BY b2.doc_id, b1.doc_id
  ) n WHERE n.n_bands >= 4
),
surv AS (SELECT * FROM exk2 WHERE doc_id NOT IN (SELECT doc_id FROM vs_prior)),
{_minhash_sql('s', 'surv').strip()},
{_cc_sql('s', 'mhs').strip()},
kept2 AS (
  SELECT e.doc_id, e.lang, e.source, e.n_tokens
  FROM surv e LEFT JOIN comps c ON e.doc_id = c.node
  WHERE COALESCE(c.component, e.doc_id) = e.doc_id
)
SELECT doc_id, lang, source, n_tokens,
       CASE WHEN {_CURATE_BUCKET100} < 80 THEN 'train'
            WHEN {_CURATE_BUCKET100} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM kept2
"""


@register("pipeline_curate_increment", oracle=_CURATE_INCREMENT_ORACLE)
def pipeline_curate_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental curation END TO END: wave 1 (even doc_ids) is batch-
    curated and reduced to its index (content fingerprints + MinHash band
    signatures); wave 2 (odd doc_ids) is curated AGAINST that index —
    fingerprint anti-join, per-prior-doc band-agreement probe, then
    wave-internal near-dedup. The oracle replays both waves longhand
    (two recursive-CTE component closures) — pinning that the increment
    admits exactly the documents a from-scratch run over the union would
    admit under the first-wave-wins keeper policy. See plans/curate.py
    for the O(wave) scale argument."""
    from opensanctions_spark.plans.curate import (
        curate_corpus,
        curate_increment,
        curation_index,
    )

    docs = load(spark, sf_dir, "documents")
    wave1 = docs.filter(F.col("doc_id") % 2 == 0)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1)
    curated1 = curate_corpus(wave1)
    fps, bands = curation_index(wave1, curated1)
    return curate_increment(wave2, fps, bands)


@register(
    "k2_statements_csv",
    oracle=f"""
WITH stmts AS ({_STMTS_SQL})
SELECT md5('customers' || '|' || entity_id || '|' || prop || '|' || value) AS id,
       entity_id,
       entity_id AS canonical_id,
       prop,
       sch AS "schema",
       value,
       'customers' AS dataset,
       CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS original_value,
       (entity_id LIKE 'c-%' AND CAST(substr(entity_id, 3) AS BIGINT) % 4 = 0)
         AS external,
       first_seen, last_seen
FROM stmts
WHERE value IS NOT NULL AND len(value) > 0
""",
)
def k2_statements_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 statements-CSV exporter as a standalone catalog exhibit
    (``zavod/zavod/exporters/statements.py:9-30``): the raw granular
    statement stream in the reference's exact column order — the same
    projection ``plans/run.py`` writes per release. Previously e2e-only;
    this pins the full 12-column surface (content-hash id, canonical_id
    mirror, provenance stamps, external flag) against a closed-form
    oracle. Map-only: one scan, one stack projection, zero shuffles.

    K12 (metadata index) deliberately stays e2e-pinned: its artifact is
    a driver-side JSON document (counts + resource listing), not a
    row-stream — ``tests/test_exporters.py`` pins the reference fields.
    """
    from opensanctions_spark.exporters import statements_csv

    ext = F.col("entity_id").substr(F.lit(3), F.lit(30)).cast("long") % 4 == 0
    stmts = _customer_statements(spark, sf_dir).withColumn("external", ext)
    return statements_csv(stmts)


@register(
    "s13_compaction_plan",
    oracle="""
WITH manifest AS (
  SELECT p_brand AS dataset,
         'pack-' || lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS path,
         CAST((p_partkey * 7919) % 8388608 + 1024 AS BIGINT) AS size_bytes
  FROM part
)
SELECT dataset, path, size_bytes,
       CAST(FLOOR(
         CAST(COALESCE(SUM(size_bytes) OVER (
           PARTITION BY dataset ORDER BY path
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS DOUBLE) / 67108864.0
       ) AS BIGINT) AS bucket
FROM manifest
""",
)
def s13_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive compaction planner (``operators/compaction.py``): a
    synthetic per-dataset file manifest (pseudo-sizes off p_partkey,
    zero-padded paths so lexicographic order is write order) planned
    into 64 MB next-fit buckets — one window over the manifest,
    partitioned by dataset. The 100 TB story: the window input is one
    row per FILE (manifest-proportional, never data-proportional) and
    each dataset's manifest plans independently."""
    from opensanctions_spark.operators.compaction import compaction_plan

    part = load(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    manifest = part.select(
        F.col("p_brand").alias("dataset"),
        F.concat(
            F.lit("pack-"), F.lpad(pk.cast("string"), 9, "0")
        ).alias("path"),
        ((pk * 7919) % 8388608 + 1024).cast("long").alias("size_bytes"),
    )
    return compaction_plan(
        manifest, target_bytes=64 * 1024 * 1024, dataset_col="dataset"
    )


@register(
    "t6_key_skew_profile",
    oracle="""
WITH counts AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS distinct_keys
  FROM counts
),
ranked AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key) AS rk
  FROM counts
)
SELECT r.key, r.cnt,
       CAST(FLOOR(CAST(r.cnt AS DOUBLE) * 1000000 / t.total_rows) AS BIGINT)
         AS share_ppm,
       CAST(FLOOR(CAST(r.cnt AS DOUBLE) * 1000 * t.distinct_keys
                  / t.total_rows) AS BIGINT) AS skew_permille,
       CAST(r.rk AS BIGINT) AS rk
FROM ranked r CROSS JOIN totals t
WHERE r.rk <= 20
""",
)
def t6_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile (``operators/profiling.py``) of the
    lineitem supplier key: exact top-20 counts with integer-ppm share
    and permille skew ratio vs the mean key load — the measurement that
    parameterizes every salting/skew-cap decision in the engine. The
    top-k compiles to TakeOrderedAndProject over the reduced per-key
    table (plan-gated), not a global window sort."""
    from opensanctions_spark.operators.profiling import key_skew_profile

    li = load(spark, sf_dir, "lineitem")
    return key_skew_profile(li, "l_suppkey", top_k=20)


@register(
    "store_view_adjacency",
    oracle="""
SELECT 'c-' || c_custkey AS person_id, c_name AS person_name,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_occupancies
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
WHERE c_nationkey = 1
GROUP BY 1, 2
""",
)
def store_view_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-shim reverse adjacency under a NON-identity linker (VERDICT
    r8 task 5): Occupancy edges point at merged-away REFERENT ids
    (``dupe-<custkey>``) that the linker resolves to the canonical
    persons — the exact resolved-duplicate shape where the round-9
    value-canonicalization fix applies (the reference store rewrites
    entity references via ``linker.get_canonical``,
    ``zavod/zavod/store.py:36-74``). The view walk counts each person's
    ``positionOccupancies`` reverse adjacency; without the fix every
    count collapses to 0 and the oracle mismatches.

    Scale note: the Store/View is the documented DRIVER-LOCAL analyzer
    compat surface (``store.py`` module docstring) — the heavy
    canonicalize+group runs distributed, only the bounded nation-1
    slice materializes on the driver, exactly what the reference's
    LevelDB store would hold."""
    from types import SimpleNamespace

    from opensanctions_spark.integration import Linker
    from opensanctions_spark.store import get_store

    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 1)
    orders = load(spark, sf_dir, "orders").join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    )
    person_stmts = cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        F.lit("Person").alias("schema"),
        F.lit("name").alias("prop"),
        F.col("c_name").alias("value"),
    )
    occ_stmts = orders.select(
        F.concat(F.lit("o-"), F.col("o_orderkey")).alias("entity_id"),
        F.lit("Occupancy").alias("schema"),
        F.lit("holder").alias("prop"),
        # the edge names the REFERENT id, not the canonical one
        F.concat(F.lit("dupe-"), F.col("o_custkey")).alias("value"),
    )
    stmts = finish_statements(
        person_stmts.unionByName(occ_stmts), dataset="store_adj_fixture"
    )
    mapping = cust.select(
        F.concat(F.lit("dupe-"), F.col("c_custkey")).alias("entity_id"),
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("canonical_id"),
    )
    scope = SimpleNamespace(name="store_adj_fixture", inputs=[])
    store = get_store(scope, Linker.from_dataframe(mapping), statements=stmts)
    view = store.view(scope)
    rows = []
    for ent in view.entities():
        if not ent.schema.is_a("Person"):
            continue
        n = sum(
            1
            for prop, _adj in view.get_adjacent(ent)
            if prop.name == "positionOccupancies"
        )
        rows.append((ent.id, ent.caption, n))
    # Arrow-path createDataFrame (pandas in): the result ships as JVM
    # Arrow batches — the list-of-tuples form pays a 32-task pickled
    # Python-worker stage for a driver-bounded row set (store.py sync's
    # mapping fix, same reasoning)
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["person_id", "person_name", "n_occupancies"]
    )
    return spark.createDataFrame(
        pdf, "person_id string, person_name string, n_occupancies long"
    )
