"""Meta-guards on the query catalog and the driver rotation order."""

from __future__ import annotations

from opensanctions_spark.catalog import DRIVER_PRIORITY, ORACLES, QUERIES


def test_every_priority_name_is_registered():
    """A typo in DRIVER_PRIORITY silently skips the name in _reorder() and
    wastes a driver correctness slot — fail loudly instead."""
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"


def test_every_query_has_an_oracle():
    """The driver's correctness gate records a weaker rows-only check for
    oracle-less queries; this engine ships an oracle for every single
    query — keep it that way."""
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries without oracle SQL: {missing}"


def test_driver_records_the_priority_head():
    """The driver checks the FIRST 50 registration-order entries; the
    rotation contract is that those are exactly the priority head."""
    head = list(QUERIES)[:50]
    assert head == DRIVER_PRIORITY[:50]


def test_no_duplicate_priority_entries():
    dupes = {n for n in DRIVER_PRIORITY if DRIVER_PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate DRIVER_PRIORITY entries: {dupes}"


def test_relation_cache_and_invalidation(spark, tmp_path):
    """catalog.load caches resolved relations per (session, dir, table);
    overwriting a loaded path requires invalidate_relations (the
    documented writer contract)."""
    from opensanctions_spark.catalog import invalidate_relations, load

    p = str(tmp_path)
    spark.createDataFrame([(1,)], "n_nationkey long").write.parquet(
        f"{p}/nation.parquet"
    )
    df1 = load(spark, p, "nation")
    assert df1.count() == 1
    # cached: same plan object back, no re-listing
    assert load(spark, p, "nation") is df1
    spark.createDataFrame([(1,), (2,)], "n_nationkey long").write.mode(
        "overwrite"
    ).parquet(f"{p}/nation.parquet")
    invalidate_relations(spark)
    df2 = load(spark, p, "nation")
    assert df2 is not df1
    assert df2.count() == 2


def test_coverage_doc_query_count_matches_registry():
    """COVERAGE.md's headline catalog-query count must track the live
    registry (VERDICT r8 task 7 — the doc drifted 158→198 unnoticed;
    this pins it to len(QUERIES))."""
    import re
    from pathlib import Path

    from opensanctions_spark.catalog import ORACLES, QUERIES

    text = Path(__file__).resolve().parent.parent.joinpath(
        "COVERAGE.md"
    ).read_text()
    m = re.search(r"\*\*(\d+) catalog queries", text)
    assert m is not None, "COVERAGE.md headline count missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)} catalog queries; "
        f"registry has {len(QUERIES)}"
    )
    # the 'ALL with DuckDB value-check oracles' claim stays true
    assert set(QUERIES) == set(ORACLES)


def test_every_registered_query_is_staged_in_priority():
    """A query registered but absent from DRIVER_PRIORITY falls to the
    bottom of registration order and silently never rotates into the
    driver's head-50 — every catalog query must be staged explicitly."""
    missing = sorted(set(QUERIES) - set(DRIVER_PRIORITY))
    assert not missing, f"registered queries not staged: {missing}"


def test_never_driver_checked_queries_lead_the_head():
    """The rotation invariant the round-8 failure taught: any query with
    ZERO lifetime driver correctness rows (computed from the shipped
    CORRECTNESS_r*.json history) must sit inside the head-50, or it
    stays unverified for another full round."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        seen.update(json.load(open(path)))
    if not seen:  # fresh clone without driver artifacts — nothing to pin
        return
    never = [n for n in QUERIES if n not in seen]
    head = set(list(QUERIES)[:50])
    stragglers = [n for n in never if n not in head]
    assert not stragglers, (
        f"queries with no lifetime driver row are staged BELOW the "
        f"head-50: {stragglers}"
    )
