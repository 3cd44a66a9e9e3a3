"""Composed edge-dedupe lifecycle (SURVEY J7 — the full
zavod/zavod/integration/edges.py semantics, not just the interval join):
bucketing, partial-ISO range compatibility, pairwise-consistent group
merge, protected-prop conflicts."""

from __future__ import annotations

from opensanctions_spark.operators.edges import dedupe_edges, prefix_date_ranges

from pyspark.sql import functions as F

_SCHEMA = (
    "id string, schema string, src string, tgt string,"
    " starts array<string>, ends array<string>"
)


def _result(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["id"]: (r["canonical_id"], r["merged"]) for r in dedupe_edges(df, **kw).collect()}


def test_prefix_ranges_expand_to_bounds(spark):
    df = spark.createDataFrame(
        [(["2025", "2025-06", "2025-06-15", "2025-13", "junk"],)], "v array<string>"
    )
    rows = df.select(prefix_date_ranges(F.col("v")).alias("r")).collect()[0]["r"]
    got = [(str(x["lo"]), str(x["hi"])) for x in rows]
    # calendar-invalid (month 13) and non-ISO values drop out
    assert got == [
        ("2025-01-01", "2025-12-31"),
        ("2025-06-01", "2025-06-30"),
        ("2025-06-15", "2025-06-15"),
    ]


def test_compatible_bucket_merges_to_min_id(spark):
    rows = [
        ("e1", "Directorship", "a", "b", ["2020"], []),
        ("e2", "Directorship", "a", "b", ["2020-06"], []),
        ("e3", "Directorship", "a", "c", ["2020"], []),  # other bucket
    ]
    got = _result(spark, rows)
    assert got["e1"] == ("e1", False)
    assert got["e2"] == ("e1", True)
    assert got["e3"] == ("e3", False)


def test_incompatible_dates_do_not_merge(spark):
    rows = [
        ("e1", "Directorship", "a", "b", ["2019"], []),
        ("e2", "Directorship", "a", "b", ["2021"], []),
    ]
    got = _result(spark, rows)
    assert got["e1"] == ("e1", False) and got["e2"] == ("e2", False)


def test_empty_date_set_is_compatible_with_everything(spark):
    rows = [
        ("e1", "Directorship", "a", "b", [], []),
        ("e2", "Directorship", "a", "b", ["2021"], ["2022"]),
    ]
    got = _result(spark, rows)
    assert got["e2"] == ("e1", True)


def test_nontransitive_chain_blocks_the_group(spark):
    # e1 ~ e2 (June inside 2020) and e2 ~ e3, but e1 !~ e3 (January vs
    # December): the connected group is NOT pairwise consistent → no merge
    rows = [
        ("e1", "Directorship", "a", "b", ["2020-01"], []),
        ("e2", "Directorship", "a", "b", ["2020"], []),
        ("e3", "Directorship", "a", "b", ["2020-12"], []),
    ]
    got = _result(spark, rows)
    assert all(not merged for (_, merged) in got.values())


def test_undirected_buckets_sort_endpoints(spark):
    rows = [
        ("e1", "Family", "a", "b", ["2020"], []),
        ("e2", "Family", "b", "a", ["2020"], []),
    ]
    assert _result(spark, rows, undirected=True)["e2"] == ("e1", True)
    # directed: different buckets, no merge
    assert _result(spark, rows)["e2"] == ("e2", False)


def test_calendar_invalid_values_fall_back_to_equality(spark):
    rows = [
        ("e1", "Directorship", "a", "b", ["2020-13"], []),
        ("e2", "Directorship", "a", "b", ["2020-13"], []),
        ("e3", "Directorship", "a", "c", ["2020-13"], []),
        ("e4", "Directorship", "a", "c", ["2020-14"], []),
    ]
    got = _result(spark, rows)
    assert got["e2"] == ("e1", True)  # equal invalid values intersect
    assert got["e4"] == ("e4", False)  # unequal invalid values don't


def test_protected_prop_conflict_blocks_merge(spark):
    schema = _SCHEMA + ", props map<string,array<string>>"
    rows = [
        ("e1", "Ownership", "a", "b", ["2020"], [], {"percentage": ["10"]}),
        ("e2", "Ownership", "a", "b", ["2020"], [], {"percentage": ["90"]}),
        ("e3", "Ownership", "a", "c", ["2020"], [], {"percentage": ["10"]}),
        ("e4", "Ownership", "a", "c", ["2020"], [], {"percentage": ["10"]}),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r["id"]: (r["canonical_id"], r["merged"])
        for r in dedupe_edges(df, protected_props=["percentage"]).collect()
    }
    assert got["e1"] == ("e1", False) and got["e2"] == ("e2", False)
    assert got["e4"] == ("e3", True)  # same value → merges
