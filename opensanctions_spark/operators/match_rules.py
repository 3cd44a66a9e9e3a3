"""Post-score match heuristics (SURVEY J9,
``zavod/zavod/integration/logic.py:11-148``): deterministic rules that
force or veto merges after probabilistic scoring —

- perfect registration-id match (RU INN/OGRN, LEI, vessel IMO) forces a
  POSITIVE regardless of score,
- disjoint personal id numbers (both sides have idNumbers, none shared)
  vetoes the match,
- otherwise the scored decision stands (threshold compare).

Pure array-column logic (``arrays_overlap``), applied to candidate pairs
that already carry both sides' identifier arrays — a map stage, no extra
shuffle after the scoring join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STRONG_ID_PROPS = ["innCode", "ogrnCode", "leiCode", "imoNumber"]


def _overlap(left: Column, right: Column) -> Column:
    both = (F.size(left) > 0) & (F.size(right) > 0)
    return both & F.arrays_overlap(left, right)


def _disjoint(left: Column, right: Column) -> Column:
    both = (F.size(left) > 0) & (F.size(right) > 0)
    return both & ~F.arrays_overlap(left, right)


def apply_match_rules(pairs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Adds a ``judgement`` column to scored pairs.

    Expects columns: score, left_strong_ids, right_strong_ids,
    left_id_numbers, right_id_numbers (array<string> each; empty = none).
    Precedence mirrors logic_decide: force-positive > veto > threshold.
    """
    force_pos = _overlap(F.col("left_strong_ids"), F.col("right_strong_ids"))
    veto = _disjoint(F.col("left_id_numbers"), F.col("right_id_numbers"))
    judgement = (
        F.when(force_pos, "POSITIVE")
        .when(veto, "NEGATIVE")
        .when(F.col("score") >= threshold, "POSITIVE")
        .otherwise("UNSURE")
    )
    return pairs.withColumn("judgement", judgement)
