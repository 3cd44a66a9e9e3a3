"""LLM name-extraction pack (``zavod/zavod/extract/names/clean.py``) —
the concrete extractor family on top of the S11 machinery
(``sources/llm.py``).

The reference feeds an entity's raw name strings plus its schema to a
prompted model and validates the response against the ``SimpleNames``
pydantic type (clean.py:182-190: five list-of-string fields — name,
alias, weakAlias, previousName, abbreviation); the input is rendered as
indent-2 JSON with ``ensure_ascii=False`` so non-Latin names survive
(clean.py:243-258). Spark rendering:

- ``name_extraction_requests`` builds the prompt column-side —
  ``to_json`` emits raw UTF-8 (the ensure_ascii=False parity), strings
  are trimmed/de-blanked/deduped in-row (clean.py:236-240 dedupes while
  preserving order; ``array_distinct`` keeps first occurrence too) —
  and hashes it into the S11 cache key;
- ``extract_names`` = ``run_extraction`` with the SimpleNames response
  schema: cache join, driver-side model calls for deduped misses only,
  JVM-side typed parse;
- ``names_to_statements`` applies an accepted response onto the entity
  as one name statement per (prop, value) — the
  ``apply_reviewed_names`` emit path — via two JVM-side explodes,
  map-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.sources.llm import run_extraction

#: SimpleNames (clean.py:182-190): every field a plain string list
NAME_PROPS = ("name", "alias", "weakAlias", "previousName", "abbreviation")

NAMES_RESPONSE_SCHEMA = ", ".join(f"{p} ARRAY<STRING>" for p in NAME_PROPS)

#: The task instructions (the reference loads these from its tuned dspy
#: program, clean.py:232-240 — this is an equivalent instruction text,
#: not a copy). The exact wording only matters insofar as it is part of
#: the cache key.
NAMES_PROMPT = (
    "You are given the schema of a single entity and a list of raw name "
    "strings for it. Split strings that contain several names, strip "
    "punctuation and annotations that are not part of a name, and "
    "categorise every resulting name as one of: name (primary), alias "
    "(also known as), weakAlias (weak or partial), previousName "
    "(former), abbreviation. Do not invent names that are not present. "
    "Respond with a JSON object with exactly those five keys, each a "
    "list of strings."
)

INPUT_MARKER = "The entity schema and name strings as JSON:\n"


def name_extraction_requests(
    df: DataFrame,
    schema_col: str = "schema",
    strings_col: str = "raw_names",
) -> DataFrame:
    """One request per entity row: the instruction text + the
    ``{entity_schema, strings}`` input JSON (trimmed, blanks dropped,
    in-row deduped, order preserved) and its md5 cache key."""
    cleaned = F.array_distinct(
        F.filter(
            F.transform(F.col(strings_col), lambda x: F.trim(x)),
            lambda x: x.isNotNull() & (x != ""),
        )
    )
    input_json = F.to_json(
        F.struct(
            F.col(schema_col).alias("entity_schema"),
            cleaned.alias("strings"),
        )
    )
    prompt = F.concat(
        F.lit(NAMES_PROMPT + "\n\n" + INPUT_MARKER), input_json
    )
    return df.withColumn("prompt", prompt).withColumn(
        "request_hash", F.md5(prompt)
    )


def extract_names(
    requests: DataFrame,
    cache: DataFrame | None = None,
    extract_fn: Callable[[str], str] | None = None,
    max_batch: int = 1000,
) -> DataFrame:
    """Run the S11 pipeline with the SimpleNames schema; adds
    ``response`` struct with the five name-prop arrays."""
    kwargs = {} if extract_fn is None else {"extract_fn": extract_fn}
    return run_extraction(
        requests, cache, NAMES_RESPONSE_SCHEMA, max_batch=max_batch, **kwargs
    )


def names_to_statements(
    extracted: DataFrame,
    dataset: str,
    entity_col: str,
    entity_schema: Column | str = "Person",
    response_col: str = "response",
) -> DataFrame:
    """Accepted SimpleNames responses → name statements on the entity:
    one row per (prop, value), two JVM-side explodes (empty arrays
    vanish), then the standard provenance stamping. This is the emit
    half of the review workflow (clean.py → S12 → entity.add)."""
    from opensanctions_spark.model.melt import finish_statements

    schema_col = (
        entity_schema
        if isinstance(entity_schema, Column)
        else F.lit(str(entity_schema))
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("prop"),
                F.coalesce(
                    F.col(f"{response_col}.{p}"),
                    F.array().cast("array<string>"),
                ).alias("values"),
            )
            for p in NAME_PROPS
        ]
    )
    stacked = (
        extracted.select(
            F.col(entity_col).alias("entity_id"),
            schema_col.alias("schema"),
            F.explode(pairs).alias("pv"),
        )
        .select(
            "entity_id",
            "schema",
            F.col("pv.prop").alias("prop"),
            F.explode("pv.values").alias("value"),
        )
    )
    return finish_statements(stacked, dataset=dataset)


# --------------------------------------------------------------------------
# extraction-quality metric (zavod/zavod/extract/names/dspy/optimise.py
# metric_with_feedback_dict — the prompt-tuning LOOP around it is a
# maintenance script and stays out of engine scope; the METRIC is the
# evaluation an extraction pipeline runs against a gold set)

#: the fields the reference metric scores (example_data.FIELDS)
METRIC_FIELDS = ("name", "alias", "weakAlias", "previousName")


@dataclass
class Evaluation:
    """Score + natural-language feedback for one extraction."""

    score: float
    feedback: str


def metric_with_feedback_dict(
    example: dict[str, list[str]],
    pred: dict[str, list[str]],
) -> Evaluation:
    """Per-name extraction scoring (optimise.py:27-58): +1 for an exact
    hit, +0.7 for casing- or punctuation-level near-hits (slug match),
    a multiplicative 0.8 penalty per hallucinated extra, normalized by
    the gold name count. The feedback strings feed the prompt-tuning
    loop in the reference and double as a human-readable error report
    here."""
    from opensanctions_spark.helpers import _slugify

    feedback = ""
    score = 0.0
    for field in METRIC_FIELDS:
        gold = example[field]
        gold_lower = {n.lower() for n in gold}
        pred_vals = list(pred.get(field, []))
        pred_set = set(pred_vals)
        pred_lower = {n.lower() for n in pred_vals}
        pred_slugs = {_slugify(n) for n in pred_vals}
        extra = pred_set - set(gold)
        for name in gold:
            if name in pred_set:
                feedback += f"You correctly extracted the {field} '{name}'. "
                score += 1
            elif name.lower() in pred_lower:
                feedback += (
                    f"You extracted the {field} '{name}' correctly, "
                    "but with incorrect casing. "
                )
                score += 0.7
            elif _slugify(name) in pred_slugs:
                feedback += (
                    f"You extracted the {field} '{name}' correctly, but "
                    "with minor differences - perhaps in punctuation or "
                    "spacing. "
                )
                score += 0.7
            else:
                feedback += f"You missed the {field} '{name}'. "
        for name in extra:
            if name.lower() not in gold_lower:
                feedback += (
                    f"You incorrectly added '{name}' to the {field} field. "
                )
                score = score * 0.8
    score = score / sum(len(example[f]) for f in METRIC_FIELDS)
    return Evaluation(score=score, feedback=feedback)
