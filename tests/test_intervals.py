"""Unit + scaling tests: time-bucketed interval-overlap join (J7 range
primitive, operators/intervals.py)."""

from __future__ import annotations

from opensanctions_spark.operators.intervals import (
    expansion_cost,
    interval_overlap_pairs,
)

W = 100  # tiny window so tests exercise multi-window intervals


def _pairs(spark, rows):
    df = spark.createDataFrame(
        rows, "key STRING, id BIGINT, start_us LONG, end_us LONG"
    )
    got = interval_overlap_pairs(df, "key", "id", "start_us", "end_us", W)
    return {(r["key"], r["left_id"], r["right_id"]) for r in got.collect()}


def _naive(rows):
    out = set()
    for k1, i1, s1, e1 in rows:
        for k2, i2, s2, e2 in rows:
            if k1 == k2 and i1 < i2 and s1 <= e2 and s2 <= e1:
                out.add((k1, i1, i2))
    return out


def test_pairs_match_naive(spark):
    rows = [
        # same window overlaps
        ("a", 1, 10, 20), ("a", 2, 15, 30),
        # overlap across a window boundary (95–105 vs 103–110)
        ("a", 3, 95, 105), ("a", 4, 103, 110),
        # long interval spanning 4 windows, overlapping a short one in w3
        ("a", 5, 50, 390), ("a", 6, 350, 360),
        # touching endpoints count (closed intervals)
        ("a", 7, 400, 450), ("a", 8, 450, 460),
        # disjoint
        ("a", 9, 1000, 1010),
        # different key never pairs
        ("b", 1, 10, 20),
    ]
    assert _pairs(spark, rows) == _naive(rows)


def test_pair_emitted_exactly_once_across_shared_windows(spark):
    # two long intervals sharing 5 windows — ownership dedup must emit 1 row
    rows = [("a", 1, 0, 499), ("a", 2, 50, 480)]
    df = spark.createDataFrame(
        rows, "key STRING, id BIGINT, start_us LONG, end_us LONG"
    )
    got = interval_overlap_pairs(df, "key", "id", "start_us", "end_us", W)
    assert got.count() == 1


def test_expansion_cost_scales_linearly_not_quadratically(spark):
    """The point of the time buckets: doubling the data (same key, same
    time density per window) must ~double the candidate comparisons; the
    naive per-key join would quadruple them."""
    def mk(n):
        # n intervals on ONE key, uniformly spread, each inside one window
        rows = [("k", i, i * 50, i * 50 + 40) for i in range(n)]
        return spark.createDataFrame(
            rows, "key STRING, id BIGINT, start_us LONG, end_us LONG"
        )

    c1 = expansion_cost(mk(400), "key", "id", "start_us", "end_us", W)
    c2 = expansion_cost(mk(800), "key", "id", "start_us", "end_us", W)
    assert c1 > 0
    assert c2 <= 2.5 * c1, f"expansion cost quadrupled: {c1} -> {c2}"


def test_duplicate_ids_never_self_pair(spark):
    """Caller-supplied id columns need not be unique: two rows with the
    same (key, id) must not emit a left_id == right_id self-pair."""
    rows = [("a", 1, 10, 20), ("a", 1, 15, 30), ("a", 2, 12, 18)]
    df = spark.createDataFrame(
        rows, "key STRING, id BIGINT, start_us LONG, end_us LONG"
    )
    got = sorted(
        (r["left_id"], r["right_id"])
        for r in interval_overlap_pairs(
            df, "key", "id", "start_us", "end_us", W
        ).collect()
    )
    # row-pair semantics (the replaced equi-join's): each of the two id=1
    # ROWS pairs with id=2 once; never a (1, 1) self-pair
    assert got == [(1, 2), (1, 2)]
