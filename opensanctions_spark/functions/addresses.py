"""Address composition & parsing (SURVEY F10,
``zavod/zavod/helpers/addresses.py:18-243``): compose a display address
from typed parts, split PO boxes, normalize whitespace/commas — column
expressions only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PO_BOX_RE = r"(?i)\b(?:P\.?\s*O\.?\s*Box|Postfach|Boîte Postale)\s*(\d+)"


def compose_address(*parts: Column) -> Column:
    """Join non-empty address parts with ', ' in the given order
    (street, city, state, postal_code, country — the reference's
    format order).

    concat_ws over trim-nullified parts, not array filter/transform
    HOFs: lambda higher-order functions are CodegenFallback expressions
    (interpreted per evaluation), while this form stays inside
    whole-stage codegen (SCALE.md §12). concat_ws skips NULLs, so
    nullifying empty-after-trim parts first gives identical semantics;
    an all-empty row yields '' which the outer when maps back to NULL."""
    cleaned = [F.when(F.trim(p) != "", F.trim(p)) for p in parts]
    joined = F.concat_ws(", ", *cleaned)
    return F.when(joined != "", joined)


def extract_po_box(col: Column) -> Column:
    """PO box number if present, else null."""
    box = F.regexp_extract(col, PO_BOX_RE, 1)
    return F.when(box != "", box)


def normalize_address(col: Column) -> Column:
    """Squash repeated separators/whitespace: ' ,, ' → ', '."""
    no_dup_commas = F.regexp_replace(col, r"\s*,[\s,]*", ", ")
    return F.trim(F.regexp_replace(no_dup_commas, r"\s+", " "))


def slugify(col: Column) -> Column:
    """Slug form used inside the address id hash
    (normality.slugify_text in the reference's ``_make_id``): lowercase,
    non-alphanumeric runs → '-', trimmed; empty → NULL."""
    slug = F.regexp_replace(F.lower(F.trim(col)), r"[^a-z0-9]+", "-")
    slug = F.regexp_replace(slug, r"^-+|-+$", "")
    return F.when(slug != "", slug)


def make_address_id(
    full: Column,
    country_code: Column,
    key: Column | None = None,
) -> Column:
    """Address entity id (``zavod/zavod/helpers/addresses.py:86-105``):
    ``addr-`` + hash(country_code, slugify(full), key) — NULL parts
    skipped (concat_ws = make_entity_id's None skip); with no full
    address the id falls back to hash(country_code, key); all-NULL
    parts → NULL id (caller drops the row). md5 for oracle parity."""
    slug = slugify(full)
    parts = [country_code, slug]
    if key is not None:
        parts.append(key)
    joined = F.concat_ws("|", *parts)
    return F.when(joined != "", F.concat(F.lit("addr-"), F.md5(joined)))


def make_address_statements(
    df: "DataFrame",
    dataset: str,
    full_col: str | None = None,
    remarks_col: str | None = None,
    summary_col: str | None = None,
    po_box_col: str | None = None,
    street_col: str | None = None,
    city_col: str | None = None,
    postal_code_col: str | None = None,
    state_col: str | None = None,
    region_col: str | None = None,
    country_col: str | None = None,
    country_code_col: str | None = None,
    key_col: str | None = None,
    holder_col: str | None = None,
    holder_schema: Column | str = "LegalEntity",
) -> "DataFrame":
    """Address rows → Address statements — the emit set of
    ``make_address`` + ``apply_address``
    (``zavod/zavod/helpers/addresses.py:107-243,244-262``) as one
    map-only stack projection:

    - a two-letter ``country`` value is treated as a code when no code
      is given (addresses.py:154-163); codes are lower-cased so the id
      hash is stable across "US" vs "us" (:166-169);
    - ``region`` equal to ``state`` is dropped so no rendering path
      duplicates it (:186-188);
    - a missing ``full`` is composed from the parts (F10
      ``compose_address``; the reference renders country-specific
      templates via rigour — the composed line here is the fixed
      summary/po_box/street/city/region/state/postal/code order) and
      carries ``origin='inferred'`` (:190-220);
    - ``full`` equal to the bare country name is suppressed (:222-223);
    - the id is ``make_address_id`` over (code, slug(full), key);
      NULL-id rows emit nothing (:227-229);
    - with ``holder_col`` the holder gets the ``apply_address``
      back-refs: ``country`` always, plus ``addressEntity`` and
      ``address`` (the full line) when full is present (:244-262).

    The reference's registry-driven country-name→code cleaning is a
    dataset-level lookup (J13) applied before this factory.
    """
    from pyspark.sql import functions as F  # noqa: F811
    from opensanctions_spark.model.melt import finish_statements

    null_s = F.lit(None).cast("string")
    col = lambda c: F.trim(F.col(c)) if c else null_s  # noqa: E731
    nullif = lambda c: F.when(c.isNotNull() & (c != ""), c)  # noqa: E731

    country = nullif(col(country_col))
    code_in = nullif(col(country_code_col))
    # country field that is really a code (addresses.py:154-163)
    country_is_code = country.isNotNull() & (F.length(country) == 2)
    explicit_code = F.lower(F.coalesce(code_in, F.when(country_is_code, country)))
    country_name = F.when(~country_is_code, country)
    # country-NAME → code resolution (addresses.py:173-186, the
    # reference's registry.country.clean): broadcast map literal over
    # the shared compat name table; a resolved name OVERRIDES an
    # explicit code like the reference. Falls back to cleaning the
    # provided full line when nothing else yields a code.
    from opensanctions_spark.model.registry import COUNTRY_NAME_TO_CODE

    name_map = F.create_map(
        *[F.lit(x) for k, v in COUNTRY_NAME_TO_CODE.items() for x in (k, v)]
    )
    full_for_code = nullif(col(full_col))
    code = F.coalesce(
        name_map[F.lower(country_name)],
        explicit_code,
        name_map[F.lower(full_for_code)],
    )

    state = nullif(col(state_col))
    region_raw = nullif(col(region_col))
    region = F.when(region_raw != state, region_raw).otherwise(
        F.when(state.isNull(), region_raw)
    )
    summary = nullif(col(summary_col))
    po_box = nullif(col(po_box_col))
    street = nullif(col(street_col))
    city = nullif(col(city_col))
    postal = nullif(col(postal_code_col))

    full_in = nullif(col(full_col))
    # concat_ws, not compose_address: identical semantics here (inputs are
    # already trimmed and empty→NULL, and concat_ws skips NULLs), but the
    # HOF filter/transform lambdas inside compose_address are
    # CodegenFallback expressions — interpreted per evaluation.
    composed_raw = F.concat_ws(
        ", ", summary, po_box, street, city, region, state, postal,
        F.coalesce(country_name, code),
    )

    # Materialize the shared sub-expressions ONCE as columns before the
    # inline stack.  Inlining them instead duplicates the full/id trees
    # into every emitted struct: the generated projection method then
    # blows janino's 64 KB limit, Spark silently falls back to
    # interpreted expressions, and the f20 exhibit runs 302 s instead of
    # ~3 s at sf1.  CollapseProject keeps this boundary because the
    # aliases below are non-cheap and referenced repeatedly.
    base = df.select(
        composed_raw.alias("_composed_raw"),
        full_in.alias("_full_in"),
        code.alias("_code"),
        country_name.alias("_country_name"),
        F.coalesce(code_in, country).alias("_original_country"),
        nullif(col(remarks_col)).alias("_remarks"),
        summary.alias("_summary"),
        po_box.alias("_po_box"),
        street.alias("_street"),
        city.alias("_city"),
        postal.alias("_postal"),
        region.alias("_region"),
        state.alias("_state"),
        nullif(col(key_col)).alias("_key"),
        (nullif(col(holder_col)) if holder_col else null_s).alias("_holder"),
        (
            holder_schema
            if isinstance(holder_schema, Column)
            else F.lit(str(holder_schema))
        ).alias("_holder_schema"),
    )

    composed = F.when(F.col("_composed_raw") != "", F.col("_composed_raw"))
    full = F.coalesce(F.col("_full_in"), composed)
    # a full line that is just the country (name or bare code) carries no
    # address content — suppress it (addresses.py:222-223; the code case
    # arises here because composition falls back to the code where the
    # reference renders a country template)
    full = F.when(
        (full != F.coalesce(F.col("_country_name"), F.lit("")))
        & (full != F.coalesce(F.col("_code"), F.lit(""))),
        full,
    )
    full_origin = F.when(
        F.col("_full_in").isNull() & full.isNotNull(), F.lit("inferred")
    )
    aid = make_address_id(full, F.col("_code"), key=F.col("_key"))

    # NO .filter(aid.isNotNull()) here: PushDownPredicates substitutes the
    # alias through both projections, and because full/composed are each
    # referenced several times the substitution is exponential — a 125 KB
    # filter expression lands on the scan and poisons codegen for the
    # whole fused stage.  The NULL-id drop happens in the generator
    # instead (inline over a NULL array emits nothing), which leaves no
    # predicate for Catalyst to push.
    base = base.select(
        aid.alias("_aid"),
        full.alias("_full"),
        full_origin.alias("_full_origin"),
        "*",
    )

    aid, full, full_origin = F.col("_aid"), F.col("_full"), F.col("_full_origin")
    code = F.col("_code")

    def prop(
        name: str, value: Column, origin: Column | None = None,
        original_value: Column | None = None,
    ) -> Column:
        return F.struct(
            aid.alias("entity_id"),
            F.lit("Address").alias("schema"),
            F.lit(name).alias("prop"),
            value.cast("string").alias("value"),
            (origin if origin is not None else null_s).alias("origin"),
            (original_value if original_value is not None else null_s).alias(
                "original_value"
            ),
        )

    rows = [
        prop("full", full, origin=full_origin),
        prop("remarks", F.col("_remarks")),
        prop("summary", F.col("_summary")),
        prop("postOfficeBox", F.col("_po_box")),
        prop("street", F.col("_street")),
        prop("city", F.col("_city")),
        prop("postalCode", F.col("_postal")),
        prop("region", F.col("_region")),
        prop("state", F.col("_state")),
        prop("country", code, original_value=F.col("_original_country")),
    ]
    if holder_col:
        holder = F.col("_holder")
        schema_col = F.col("_holder_schema")

        def back(name: str, value: Column) -> Column:
            return F.struct(
                holder.alias("entity_id"),
                schema_col.alias("schema"),
                F.lit(name).alias("prop"),
                value.cast("string").alias("value"),
                null_s.alias("origin"),
                null_s.alias("original_value"),
            )

        rows.append(back("country", code))
        rows.append(back("addressEntity", F.when(full.isNotNull(), aid)))
        rows.append(back("address", full))

    # rows with no id emit nothing (addresses.py:227-229) — conditional
    # array, not a Filter node (see the pushdown note above)
    stacked = base.select(F.inline(F.when(aid.isNotNull(), F.array(*rows))))
    return finish_statements(stacked, dataset=dataset)


def postcode_pobox(col: Column) -> tuple[Column, Column]:
    """(postcode, po_box) split for postcode fields that sometimes carry a
    stuffed PO Box (``zavod/zavod/helpers/addresses.py:284-295``): a value
    matching the PO-Box pattern moves wholesale to the po_box side and
    postcode becomes NULL; anything else stays a postcode."""
    is_box = col.rlike(r"(?i)^p\.?o\.? ?box [\d-]+$")
    return F.when(~is_box, col), F.when(is_box, col)
