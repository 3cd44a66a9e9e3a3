"""Reference-shaped default pair scorer (the xref ``algorithm=`` surface).

The reference delegates pair scoring to pluggable nomenklatura algorithms
(``zavod/zavod/integration/dedupe.py:50,67-69``,
``zavod/zavod/runner/local_enricher.py:73-80``) whose default combines
name similarity with qualifying features — date-of-birth compatibility on
prefix dates, identifier overlap — rather than raw token overlap alone.
This module is that default, Spark-shaped:

- blocking still proposes candidates JVM-side (quadratic stage, no
  Python — ``operators/blocking.py``);
- the SURVIVING pairs are re-scored by an Arrow-batched pandas UDF that
  computes four features and combines them with integer weights:

  =============  ====================================================  ==
  feature        definition (all values integer parts-per-million)     wt
  =============  ====================================================  ==
  name           token-set Jaccard of the two names                    35
  phonetic       Jaccard of consonant-skeleton keys (first char +      15
                 vowels stripped from the rest — a deterministic,
                 RE2-safe stand-in for soundex)
  dob            1.0 equal; 0.6 prefix-compatible (``1980`` vs         20
                 ``1980-03-02`` — the reference's prefix-date model,
                 A8); 0.3 unknown (either side missing); 0.0 clash
  ids            any shared identifier → 1.0 else 0.0                  30
  =============  ====================================================  ==

  plus the qualifier the reference's NameQualified applies: a hard DOB
  clash (both sides carry full values that disagree) HALVES the combined
  score — two people with different birthdays are rarely the same no
  matter how similar the names.

EVERY step is integer math (ppm values, integer-weighted sum, integer
halving), so a DuckDB oracle can replay the score bit-for-bit — the same
cross-engine determinism rule the rest of the catalog follows.

Scale shape: the UDF only ever sees the post-top-k pair table (≤ k rows
per subject), Arrow in and out; candidate generation never touches
Python. Swapping back to the plain Jaccard default (or any custom UDF —
``j5_custom_scorer_udf``) changes one function reference, not the plan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

PPM = 1_000_000

#: integer feature weights (sum 100) — the combined score is
#: ``sum(w_i * f_i) // 100`` in ppm
WEIGHTS = {"name": 35, "phonetic": 15, "dob": 20, "ids": 30}

_TOKEN_RE = re.compile(r"[^a-z0-9]+")
_VOWELS_RE = re.compile(r"[aeiou]")


def _tokens(name: str | None) -> set[str]:
    if not name:
        return set()
    return {t for t in _TOKEN_RE.split(name.lower()) if t}


def _phonetic_key(token: str) -> str:
    """First character + consonant skeleton of the rest. Deliberately
    RE2-expressible (no backreferences) so the DuckDB oracle applies the
    identical transform: ``t[:1] || regexp_replace(t[1:], '[aeiou]', '',
    'g')``."""
    return token[:1] + _VOWELS_RE.sub("", token[1:])


def _jaccard_ppm(a: set[str], b: set[str]) -> int:
    if not a or not b:
        return 0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return (PPM * inter) // union


def _dob_ppm(a: str | None, b: str | None) -> tuple[int, bool]:
    """(feature ppm, hard-clash flag) for two prefix dates
    (``zavod/zavod/helpers/dates.py`` prefix-date model: ``1980`` <
    ``1980-03`` < ``1980-03-02``)."""
    a = (a or "").strip()
    b = (b or "").strip()
    if not a or not b:
        return 300_000, False
    if a == b:
        return PPM, False
    if a.startswith(b) or b.startswith(a):
        return 600_000, False
    return 0, len(a) >= 10 and len(b) >= 10


def score_pair_ppm(
    a_name: str | None,
    b_name: str | None,
    a_dob: str | None,
    b_dob: str | None,
    a_ids: list[str] | None,
    b_ids: list[str] | None,
) -> int:
    """The full integer scoring function for one pair — importable for
    tests and for driver-side replay."""
    ta, tb = _tokens(a_name), _tokens(b_name)
    name = _jaccard_ppm(ta, tb)
    phon = _jaccard_ppm(
        {_phonetic_key(t) for t in ta}, {_phonetic_key(t) for t in tb}
    )
    dob, clash = _dob_ppm(a_dob, b_dob)
    # Arrow hands array<string> columns to Python as numpy ndarrays, whose
    # truthiness raises for >1 element — test length explicitly, never
    # ``a_ids or []``.
    sa = set(a_ids) if a_ids is not None and len(a_ids) else set()
    sb = set(b_ids) if b_ids is not None and len(b_ids) else set()
    ids = PPM if sa & sb else 0
    score = (
        WEIGHTS["name"] * name
        + WEIGHTS["phonetic"] * phon
        + WEIGHTS["dob"] * dob
        + WEIGHTS["ids"] * ids
    ) // 100
    if clash:
        score //= 2
    return score


# NB: a LongType() INSTANCE, not the "long" DDL string — the module is
# re-imported inside Python workers where no SparkSession exists to parse
# DDL, and a string return type would crash the import there
@pandas_udf(LongType())
def reference_score_ppm(
    a_name: pd.Series,
    b_name: pd.Series,
    a_dob: pd.Series,
    b_dob: pd.Series,
    a_ids: pd.Series,
    b_ids: pd.Series,
) -> pd.Series:
    """Arrow-batched reference scorer: one vectorized batch per Arrow
    chunk, pure integer output."""
    return pd.Series(
        [
            score_pair_ppm(an, bn, ad, bd, ai, bi)
            for an, bn, ad, bd, ai, bi in zip(
                a_name, b_name, a_dob, b_dob, a_ids, b_ids
            )
        ],
        dtype="int64",
    )


def reference_score_pairs(
    pairs: DataFrame,
    subjects: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    dob_col: str | None = "dob",
    ids_col: str | None = "id_numbers",
) -> DataFrame:
    """Attach subject attributes to a pruned pair table and score with the
    reference default algorithm. ``pairs`` must carry ``subject_id`` /
    ``candidate_id``; the attribute joins happen AFTER pruning so the
    heavy unpruned pair table never re-shuffles (same discipline as
    ``plans/xref.py`` stage 3). Adds ``score_ppm`` (exact integer) and
    ``score`` (score_ppm / 1e6, for threshold knobs expressed as floats).
    """
    sel = [F.col(id_col).alias("_sid"), F.col(name_col).alias("_name")]
    sel.append(
        F.col(dob_col).alias("_dob")
        if dob_col and dob_col in subjects.columns
        else F.lit(None).cast("string").alias("_dob")
    )
    sel.append(
        F.col(ids_col).alias("_ids")
        if ids_col and ids_col in subjects.columns
        else F.lit(None).cast("array<string>").alias("_ids")
    )
    attrs = subjects.select(*sel)

    def side(prefix: str) -> DataFrame:
        return attrs.select(
            F.col("_sid").alias(f"{prefix}_join_id"),
            F.col("_name").alias(f"{prefix}_name"),
            F.col("_dob").alias(f"{prefix}_dob"),
            F.col("_ids").alias(f"{prefix}_ids"),
        )

    out = (
        pairs.join(side("a"), pairs.subject_id == F.col("a_join_id"))
        .join(side("b"), pairs.candidate_id == F.col("b_join_id"))
        .withColumn(
            "score_ppm",
            reference_score_ppm(
                F.col("a_name"), F.col("b_name"),
                F.col("a_dob"), F.col("b_dob"),
                F.col("a_ids"), F.col("b_ids"),
            ),
        )
        .withColumn("score", F.col("score_ppm") / F.lit(PPM))
    )
    return out.drop("a_join_id", "b_join_id")
