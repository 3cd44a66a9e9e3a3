"""The reference-shaped default pair scorer (``operators/scoring.py``)
and its ``algorithm=`` plug in the xref plan
(``zavod/zavod/integration/dedupe.py:50,67-69``)."""

from __future__ import annotations

import pytest

from opensanctions_spark.operators.scoring import (
    PPM,
    _dob_ppm,
    _phonetic_key,
    score_pair_ppm,
)


def test_phonetic_key_consonant_skeleton():
    assert _phonetic_key("smith") == "smth"
    assert _phonetic_key("smyth") == "smyth"  # y is kept — RE2-safe skeleton
    assert _phonetic_key("anderson") == "andrsn"
    assert _phonetic_key("a") == "a"
    # leading vowel survives (only the REST is stripped)
    assert _phonetic_key("elena") == "eln"


def test_dob_prefix_date_model():
    """The reference's prefix-date compatibility (A8 model): full match,
    year-prefix match, clash, unknowns."""
    assert _dob_ppm("1980-03-02", "1980-03-02") == (PPM, False)
    assert _dob_ppm("1980", "1980-03-02") == (600_000, False)
    assert _dob_ppm("1980-03", "1980-03-02") == (600_000, False)
    # year-level disagreement is a 0 feature but NOT a hard clash
    assert _dob_ppm("1981", "1980-03-02") == (0, False)
    # two full dates disagreeing IS the hard clash (score halver)
    assert _dob_ppm("1981-05-05", "1980-03-02") == (0, True)
    assert _dob_ppm(None, "1980-03-02") == (300_000, False)
    assert _dob_ppm("", "") == (300_000, False)


def test_score_pair_integer_weights():
    # identical names, same full dob, shared id -> the maximum score
    s = score_pair_ppm("Jane Q Doe", "jane q doe", "1980-01-01", "1980-01-01",
                       ["X1"], ["X1", "X2"])
    assert s == PPM  # 35+15+20+30 all at full ppm
    # same names, unknown dobs, no ids: 35 + 15 + 20*0.3 + 0 = 56%
    s = score_pair_ppm("Jane Doe", "Jane Doe", None, None, [], [])
    assert s == (35 * PPM + 15 * PPM + 20 * 300_000) // 100
    # hard dob clash halves everything
    full = score_pair_ppm("Jane Doe", "Jane Doe", "1980-01-01", "1980-01-01", [], [])
    clash = score_pair_ppm("Jane Doe", "Jane Doe", "1980-01-01", "1991-02-02", [], [])
    assert clash == ((35 * PPM + 15 * PPM) // 100) // 2
    assert clash < full // 2  # clash also zeroes the dob feature itself


def test_reference_scorer_beats_jaccard_on_qualifiers(spark):
    """The recall/precision motivation (SCALE.md §11): token Jaccard
    alone cannot separate same-name-different-person from true dupes;
    the feature scorer can — DOB clash sinks one, shared id lifts the
    other."""
    from opensanctions_spark.operators.scoring import reference_score_pairs

    subjects = spark.createDataFrame(
        [
            ("p1", "maria santos", "1980-02-01", ["PASS:9"]),
            ("p2", "maria santos", "1980-02-01", ["PASS:9"]),   # true dupe
            ("p3", "maria santos", "1995-07-09", ["PASS:77"]),  # homonym
        ],
        "id STRING, name STRING, dob STRING, id_numbers ARRAY<STRING>",
    )
    pairs = spark.createDataFrame(
        [("p1", "p2"), ("p1", "p3")], "subject_id STRING, candidate_id STRING"
    )
    got = {
        (r["subject_id"], r["candidate_id"]): r["score_ppm"]
        for r in reference_score_pairs(pairs, subjects).collect()
    }
    # identical Jaccard (1.0) on both pairs; the feature scorer splits them
    assert got[("p1", "p2")] == PPM
    assert got[("p1", "p3")] == ((35 * PPM + 15 * PPM) // 100) // 2
    assert got[("p1", "p2")] > 2 * got[("p1", "p3")]


def test_xref_algorithm_plug(spark):
    """XrefConfig(algorithm="reference") re-scores pruned pairs; unknown
    algorithm names fail loudly."""
    from opensanctions_spark.plans.xref import XrefConfig, xref_pairs

    subjects = spark.createDataFrame(
        [
            ("p1", "maria santos", "1980-02-01", [], ["PASS:9"]),
            ("p2", "maria santos", "1980-02-01", [], ["PASS:9"]),
            ("p3", "maria santos", "1995-07-09", [], ["PASS:77"]),
        ],
        "id STRING, name STRING, dob STRING, strong_ids ARRAY<STRING>, "
        "id_numbers ARRAY<STRING>",
    )
    ref = xref_pairs(subjects, XrefConfig(threshold=0.7, algorithm="reference"))
    by_pair = {
        (r["left_id"], r["right_id"]): (r["score"], r["judgement"])
        for r in ref.collect()
    }
    score12, j12 = by_pair[("p1", "p2")]
    score13, j13 = by_pair[("p1", "p3")]
    assert score12 == 1.0 and j12 == "POSITIVE"
    assert score13 < 0.5  # the homonym drops below threshold
    with pytest.raises(ValueError, match="unknown xref algorithm"):
        xref_pairs(subjects, XrefConfig(algorithm="nope")).collect()


def test_reference_scorer_multi_id_arrays(spark):
    """Arrow hands array<string> columns to the pandas UDF as numpy
    ndarrays; subjects carrying 2+ id_numbers must not trip ndarray
    truthiness (`a_ids or []` raised ValueError)."""
    from opensanctions_spark.operators.scoring import reference_score_pairs

    subjects = spark.createDataFrame(
        [
            ("p1", "ana gomez", "1970-01-01", ["INN:1", "LEI:2"]),
            ("p2", "ana gomez", "1970-01-01", ["LEI:2", "IMO:3", "QID:4"]),
            ("p3", "ana gomez", None, None),
        ],
        "id STRING, name STRING, dob STRING, id_numbers ARRAY<STRING>",
    )
    pairs = spark.createDataFrame(
        [("p1", "p2"), ("p1", "p3")], "subject_id STRING, candidate_id STRING"
    )
    got = {
        (r["subject_id"], r["candidate_id"]): r["score_ppm"]
        for r in reference_score_pairs(pairs, subjects).collect()
    }
    assert got[("p1", "p2")] == PPM  # shared LEI across multi-element arrays
    # null array side: ids feature 0, dob unknown 0.3
    assert got[("p1", "p3")] == (35 * PPM + 15 * PPM + 20 * 300_000) // 100
