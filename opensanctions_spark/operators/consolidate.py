"""Consolidation window ops: prefix-date dedup, name reduction (SURVEY A8-A10, T4).

ISO *prefix* dates (``1990``, ``1990-05``, ``1990-05-01``) are first-class
in the reference; consolidation drops values that are proper prefixes of a
longer value present for the same entity+prop
(``zavod/zavod/exporters/consolidate.py:48-90``).

Lexicographic insight that makes this a single window pass: in descending
sort order, if ANY value extends v, then the value immediately before v
extends v (any string between v and an extension of v must itself start
with v). So `lag` over a desc-ordered window decides prefix-ness with one
shuffle, no self-join — O(n log n) per entity instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_prefix_values(
    df: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Within each key group, drop values that are proper prefixes of a
    longer value in the same group. Input rows are deduplicated first."""
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).desc())
    dedup = df.select(*keys, value_col).distinct()
    prev = F.lag(F.col(value_col)).over(w)
    return (
        dedup.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | ~F.col("_prev").startswith(F.col(value_col)))
        .drop("_prev")
    )


def min_max_dates(df: DataFrame, keys: list[str], value_col: str = "value") -> DataFrame:
    """Provenance-date reduction: keep only min and max per group
    (``zavod/zavod/exporters/consolidate.py:76-84`` PROV-prop path).
    Prefix dates order correctly as strings — the reference exploits the
    same property (``zavod/zavod/helpers/sanctions.py:106-112``)."""
    return df.groupBy(*keys).agg(
        F.min(value_col).alias("min_value"), F.max(value_col).alias("max_value")
    )


def reduce_names(df: DataFrame, id_col: str = "canonical_id") -> DataFrame:
    """Name reduction (A9, ``zavod/zavod/exporters/consolidate.py:123-170``):

    - weak aliases are demoted (dropped) when the entity has any strong
      name (kind 'name'/'alias'),
    - case-insensitive duplicates collapse to one casing (the
      lexicographically-first, deterministically),
    - rows flagged ``protected`` (the reference's protected-datasets list)
      are always kept as-is.

    Input columns: id_col, name, kind ('name'|'alias'|'weakAlias')
    [, protected bool]. One window + one groupBy, no Python per row.
    """
    if "protected" not in df.columns:
        df = df.withColumn("protected", F.lit(False))
    w = Window.partitionBy(id_col)
    has_strong = F.max(
        F.when(F.col("kind").isin("name", "alias"), 1).otherwise(0)
    ).over(w)
    kept = df.withColumn("_strong", has_strong).filter(
        F.col("protected") | (F.col("kind") != "weakAlias") | (F.col("_strong") == 0)
    )
    return (
        kept.groupBy(id_col, F.lower(F.col("name")).alias("_ci"))
        .agg(
            F.min("name").alias("name"),
            F.max_by("kind", F.when(F.col("kind") == "name", 2).otherwise(1)).alias("kind"),
            F.max("protected").alias("protected"),
        )
        .drop("_ci")
    )


def collapse_undirected_edges(df: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Normalize undirected edge endpoints to (least, greatest) order —
    the bucket key of edge dedupe (``zavod/zavod/integration/edges.py:78-110``)
    and of the doubled-endpoint cleanup (A10)."""
    return df.withColumn("_lo", F.least(F.col(src_col), F.col(dst_col))).withColumn(
        "_hi", F.greatest(F.col(src_col), F.col(dst_col))
    ).drop(src_col, dst_col).withColumnRenamed("_lo", src_col).withColumnRenamed(
        "_hi", dst_col
    )


# ---------------------------------------------------------------------------
# Export-time entity consolidation (the reference's consolidate_entity,
# ``zavod/zavod/exporters/consolidate.py:173-180``): every exporter except
# the raw statements sink consumes the CONSOLIDATED view — prefix dates
# dropped, provenance dates reduced to min/max, case-duplicate names
# collapsed, weakAlias-demoted names removed (protected datasets exempt),
# doubled undirected-edge endpoints fixed. All of it is per-row array
# logic on the properties map — MAP-ONLY, no exchange — except the
# protected-names union, which joins one bounded side table on the view's
# own partitioning key.

#: consolidate.py:11-12 — provenance dates reduce to a single min / max
PROV_MIN_DATES = ("createdAt", "authoredAt", "publishedAt")
PROV_MAX_DATES = ("modifiedAt", "retrievedAt")

#: consolidate.py:15-26
NAME_PROPS = (
    "name", "alias", "weakAlias", "firstName", "lastName", "secondName",
    "middleName", "patronymic", "matronymic",
)
FULL_NAME_PROPS = ("name", "alias")

#: consolidate.py:31-45 — names stated by these datasets are never
#: removed, whatever other sources say about them
NEVER_REMOVE_NAMES_DATASETS = frozenset({
    "us_ofac_sdn", "us_ofac_cons", "eu_sanctions_map",
    "gb_fcdo_sanctions", "ca_dfatd_sema_sanctions", "au_dfat_sanctions",
})


def _date_props() -> tuple[str, ...]:
    from opensanctions_spark.model.registry import TYPE_PROPS

    return tuple(
        set(TYPE_PROPS["date"]) | set(PROV_MIN_DATES) | set(PROV_MAX_DATES)
    )


def _upper_count(col):
    return F.length(col) - F.length(F.regexp_replace(col, r"\p{Lu}", ""))


def _prefer(m, n):
    """True when name variant ``m`` beats ``n`` for the same lower-cased
    group: fewer uppercase letters first, then lexicographic. A
    deterministic twin of rigour's case preference — "John Doe"
    survives over "JOHN DOE" (the reference suite's pinned case);
    declared divergence: rigour may rank exotic casings differently."""
    mu, nu = _upper_count(m), _upper_count(n)
    return (mu < nu) | ((mu == nu) & (m < n))


def _consolidate_dates(values):
    """Drop values that are proper prefixes of longer values — the same
    lexicographic lag insight as :func:`drop_prefix_values`, but as a
    per-row array pass (consolidate.py:48-90). The reference also drops
    the ``registry.date.HISTORIC`` sentinel here; the engine's IR has
    no such sentinel, so there is nothing to drop."""
    sd = F.reverse(F.array_sort(F.array_distinct(values)))
    return F.filter(
        sd, lambda x, i: (i == 0) | ~F.element_at(sd, i).startswith(x)
    )


def _consolidate_names(k, v, weak):
    """simplify_names (consolidate.py:123-170): weakAlias-demotion of
    full names (only if survivors remain, except for ``alias``), drop
    letterless names, collapse case-duplicates to the preferred
    variant."""
    strong = F.filter(v, lambda n: ~F.array_contains(weak, F.lower(n)))
    demoted = F.when(
        k.isin(*FULL_NAME_PROPS) & (F.size(weak) > 0),
        F.when((F.size(strong) > 0) | (k == "alias"), strong).otherwise(v),
    ).otherwise(v)
    lettered = F.filter(demoted, lambda n: n.rlike(r"\p{L}"))
    return F.filter(
        lettered,
        lambda n: ~F.exists(
            lettered,
            lambda m: (F.lower(m) == F.lower(n)) & _prefer(m, n),
        ),
    )


def _identifier_sorted(common):
    """Sort two endpoint ids by the nomenklatura Identifier ordering
    (QIDs outrank, compare numerically) — ascending, so the LAST
    element is the stronger id (consolidate.py:112-113)."""
    return F.array_sort(
        F.transform(
            common,
            lambda v: F.struct(
                v.rlike(r"^Q\d+$").cast("int").alias("q"),
                F.when(
                    v.rlike(r"^Q\d+$"), F.substring(v, 2, 18).cast("long")
                ).otherwise(F.lit(0)).alias("n"),
                v.alias("v"),
            ),
        )
    )


def consolidate_entities(
    entities: DataFrame, statements: DataFrame | None = None
) -> DataFrame:
    """The export-time consolidation pass over the entity view
    (consolidate_entity, consolidate.py:173-180): returns the view with
    its ``properties`` map consolidated. The raw statements keep every
    original value — the statements sink must NOT consume this view
    (``exporters/__init__.py:73-78``: feed_unconsolidated runs first).

    ``statements`` enables the protected-names rule: name values stated
    by ``NEVER_REMOVE_NAMES_DATASETS`` are re-added after reduction.
    The side table is bounded by the protected datasets' own name
    volume and joins on ``canonical_id`` — the key the view is already
    partitioned on after assembly."""
    date_props = _date_props()
    weak = F.transform(
        F.filter(
            F.coalesce(F.col("properties")["weakAlias"], F.array()),
            lambda a: (F.length(a) < 15) | ~a.contains(" "),
        ),
        F.lower,
    )

    # simplify_names runs ONLY on the LegalEntity subtree
    # (consolidate.py:124-126: ``if not entity.schema.is_a("LegalEntity")``)
    # — Position/Vessel/Security/Address names stay untouched.
    from opensanctions_spark.model.registry import subtree_schemata

    is_legal = F.col("schema").isin(*subtree_schemata("LegalEntity"))

    def fix_value(k, v):
        # _simplify_dates drops prefix values BEFORE the provenance
        # min/max reduction (consolidate.py:71-81): for
        # createdAt={'2023','2023-01-05'} the min is '2023-01-05'.
        pruned = F.when(F.size(v) > 1, _consolidate_dates(v)).otherwise(v)
        dated = F.when(
            k.isin(*PROV_MAX_DATES), F.array(F.array_max(pruned))
        ).when(
            k.isin(*PROV_MIN_DATES), F.array(F.array_min(pruned))
        ).otherwise(pruned)
        return (
            F.when(k.isin(*date_props), dated)
            .when(k.isin(*NAME_PROPS) & is_legal, _consolidate_names(k, v, weak))
            .otherwise(v)
        )

    out = entities.withColumn(
        "properties", F.transform_values("properties", fix_value)
    )

    # undirected-edge endpoint fix (_simplify_undirected)
    from opensanctions_spark.model.registry import EDGE_SCHEMATA

    for schema, (src, tgt, directed) in EDGE_SCHEMATA.items():
        if directed:
            continue
        props = F.col("properties")
        common = F.array_intersect(
            F.coalesce(props[src], F.array()), F.coalesce(props[tgt], F.array())
        )
        sorted_ids = _identifier_sorted(common)
        weaker = sorted_ids[0]["v"]
        stronger = sorted_ids[1]["v"]
        fixed = F.map_zip_with(
            props,
            F.create_map(
                F.lit(src), F.array_remove(props[src], weaker),
                F.lit(tgt), F.array_remove(props[tgt], stronger),
            ),
            lambda k, v, repl: F.coalesce(repl, v),
        )
        out = out.withColumn(
            "properties",
            F.when(
                (F.col("schema") == schema) & (F.size(common) == 2), fixed
            ).otherwise(F.col("properties")),
        )

    # protected names ride back in after reduction
    if statements is not None:
        prot = (
            statements.filter(
                F.col("dataset").isin(*NEVER_REMOVE_NAMES_DATASETS)
                & F.col("prop").isin(*NAME_PROPS)
            )
            .groupBy("canonical_id", "prop")
            .agg(F.collect_set("value").alias("_pv"))
            .groupBy("canonical_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("prop", "_pv"))
                ).alias("_protected")
            )
        )
        out = out.join(prot, "canonical_id", "left").withColumn(
            "properties",
            F.when(
                F.col("_protected").isNull() | ~is_legal, F.col("properties")
            ).otherwise(
                F.transform_values(
                    "properties",
                    lambda k, v: F.when(
                        k.isin(*NAME_PROPS),
                        F.array_union(
                            v, F.coalesce(F.col("_protected")[k], F.array())
                        ),
                    ).otherwise(v),
                )
            ),
        ).drop("_protected")
    return out
