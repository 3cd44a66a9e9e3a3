"""Edge deduplication: the composed dedupe-edges lifecycle (SURVEY J7).

The reference merges edge entities (Directorship, Ownership, Family, ...)
that connect the same endpoints and are temporally compatible
(``zavod/zavod/integration/edges.py``): bucket by (schema, source,
target) — endpoints sorted for undirected schemata (78-110) — then treat
partial-ISO dates as the RANGE they can represent (129-154: ``2025``
matches any date inside that year), merge only groups whose members are
PAIRWISE compatible (234-321 — range overlap is not transitive, so a
connected group can still be inconsistent), and refuse groups where a
protected property conflicts (324-422).

Spark shape: one groupBy on the bucket key; ordered pair expansion
inside each bucket (buckets are edges sharing BOTH endpoints — small by
construction, so the quadratic term is per-bucket); connected components
over the compatible pairs; then a pairwise-consistency count filter
(|compat pairs in group| == n(n-1)/2) and a protected-prop conflict
filter before any merge. At 100 TB the bucket key carries the shuffle
and every later join is on the (tiny) pair/group tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.operators.resolve import connected_components

#: partial ISO date shapes the range parser accepts (reference:
#: ``PARTIAL_ISO_DATE`` in zavod/zavod/integration/edges.py)
_PARTIAL_ISO = r"^\d{4}(-\d{2}(-\d{2})?)?$"


def prefix_date_ranges(values: Column) -> Column:
    """array<string> of partial-ISO dates → array<struct<lo:date,hi:date>>.

    ``2025`` → [2025-01-01, 2025-12-31]; ``2025-06`` → the whole month
    (last_day handles month lengths); ``2025-06-15`` → the single day.
    Calendar-invalid values (month 13, Feb 30) drop out via try_to_date —
    the caller falls back to exact equality for those, like the
    reference (``edges.py:180-189``)."""
    def to_range(v: Column) -> Column:
        lo = F.try_to_date(
            F.when(F.length(v) == 4, F.concat(v, F.lit("-01-01")))
            .when(F.length(v) == 7, F.concat(v, F.lit("-01")))
            .otherwise(v)
        )
        hi = F.when(F.length(v) == 4, F.try_to_date(F.concat(v, F.lit("-12-31")))).otherwise(
            F.when(F.length(v) == 7, F.last_day(lo)).otherwise(lo)
        )
        return F.struct(lo.alias("lo"), hi.alias("hi"))

    parseable = F.filter(values, lambda v: v.rlike(_PARTIAL_ISO))
    return F.filter(
        F.transform(parseable, to_range), lambda r: r["lo"].isNotNull()
    )


def _sets_compatible(lv: Column, rv: Column, lr: Column, rr: Column) -> Column:
    """The reference's ``dates_compatible``: empty sets match everything;
    parseable sets compare as range overlap (ANY pair); sets with no
    parseable member fall back to exact-value intersection."""
    any_overlap = F.exists(
        lr,
        lambda a: F.exists(
            rr, lambda b: (a["lo"] <= b["hi"]) & (b["lo"] <= a["hi"])
        ),
    )
    return (
        F.when((F.size(lv) == 0) | (F.size(rv) == 0), F.lit(True))
        .when((F.size(lr) > 0) & (F.size(rr) > 0), any_overlap)
        .otherwise(F.arrays_overlap(lv, rv))
    )


def dedupe_edges(
    edges: DataFrame,
    undirected: bool = False,
    protected_props: list[str] | None = None,
) -> DataFrame:
    """edges(id, schema, src, tgt, starts: array<string>,
    ends: array<string>[, props: map<string,array<string>>]) →
    (id, canonical_id, merged).

    Only groups that are temporally compatible on BOTH boundaries for
    EVERY member pair merge (canonical = min id); a group where any
    protected prop carries more than one distinct value stays unmerged.
    """
    key_src = F.least("src", "tgt") if undirected else F.col("src")
    key_tgt = F.greatest("src", "tgt") if undirected else F.col("tgt")

    member = F.struct(
        F.col("id").alias("id"),
        F.col("starts").alias("sv"),
        F.col("ends").alias("ev"),
        prefix_date_ranges(F.col("starts")).alias("sr"),
        prefix_date_ranges(F.col("ends")).alias("er"),
    )
    buckets = (
        edges.select(
            F.col("schema").alias("k_schema"),
            key_src.alias("k_src"),
            key_tgt.alias("k_tgt"),
            member.alias("m"),
        )
        .groupBy("k_schema", "k_src", "k_tgt")
        .agg(F.sort_array(F.collect_list("m")).alias("members"))
        .filter(F.size("members") > 1)
    )
    # ordered in-bucket pairs (slice trick — n(n-1)/2, no n² blowup)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("members"),
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                    lambda y: F.struct(
                        x["id"].alias("left_id"),
                        y["id"].alias("right_id"),
                        (
                            _sets_compatible(x["sv"], y["sv"], x["sr"], y["sr"])
                            & _sets_compatible(x["ev"], y["ev"], x["er"], y["er"])
                        ).alias("compat"),
                    ),
                ),
            )
        )
    )
    pairs = buckets.select(pair.alias("p")).select(
        "p.left_id", "p.right_id", "p.compat"
    )
    from pyspark.storagelevel import StorageLevel

    # persisted because the pair table is consumed twice (the CC edge
    # collect runs eagerly inside connected_components; the group
    # consistency join executes later with the caller's action) — stays
    # cached for the session like the curation plan's survivor frame
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    compat_pairs = pairs.filter(F.col("compat"))
    cc = connected_components(compat_pairs, src="left_id", dst="right_id")
    groups = cc.select(F.col("node").alias("id"), F.col("component"))

    # pairwise consistency: a CC group merges only if EVERY member pair is
    # compatible — |compat pairs| must equal n(n-1)/2 (overlap is not
    # transitive, the reference re-checks groups the same way)
    sized = groups.groupBy("component").agg(F.count("*").alias("n"))
    with_groups = pairs.join(
        groups.select(F.col("id").alias("left_id"), F.col("component")),
        "left_id",
    ).join(
        groups.select(
            F.col("id").alias("right_id"), F.col("component").alias("rc")
        ),
        "right_id",
    )
    group_pairs = (
        with_groups.filter(F.col("component") == F.col("rc"))
        .groupBy("component")
        .agg(F.sum(F.col("compat").cast("long")).alias("n_compat"))
    )
    consistent = (
        sized.join(group_pairs, "component")
        .filter(F.col("n_compat") * 2 == F.col("n") * (F.col("n") - 1))
        .select("component")
    )

    if protected_props and "props" in edges.columns:
        # a group where any protected prop has >1 distinct value among
        # members must not merge (reference: edges.py:324-422)
        vals = edges.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("prop"),
                            F.coalesce(
                                F.col("props").getItem(p),
                                F.array().cast("array<string>"),
                            ).alias("vs"),
                        )
                        for p in protected_props
                    ]
                )
            ).alias("pv"),
        ).select("id", "pv.prop", F.explode_outer("pv.vs").alias("v"))
        conflicts = (
            vals.join(groups, "id")
            .filter(F.col("v").isNotNull())
            .groupBy("component", "prop")
            .agg(F.count_distinct("v").alias("nv"))
            .filter(F.col("nv") > 1)
            .select("component")
            .distinct()
        )
        consistent = consistent.join(conflicts, "component", "left_anti")

    merged = (
        groups.join(F.broadcast(consistent), "component")
        .groupBy("component")
        .agg(F.min("id").alias("canonical_id"))
    )
    mapping = groups.join(F.broadcast(consistent), "component").join(
        merged, "component"
    )
    out = edges.select("id").join(
        mapping.select("id", "canonical_id"), "id", "left"
    )
    return out.select(
        "id",
        F.coalesce(F.col("canonical_id"), F.col("id")).alias("canonical_id"),
        (
            F.coalesce(F.col("canonical_id"), F.col("id")) != F.col("id")
        ).alias("merged"),
    )
