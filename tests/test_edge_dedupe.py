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


def _python_dedupe(rows):
    """Brute-force reference: bucket → range compat → CC → pairwise check
    → min-id merge, in plain Python (mirrors zavod's edges.py logic)."""
    import calendar
    import re
    from datetime import date
    from itertools import combinations

    def ranges(vals):
        out = []
        for v in vals:
            if not re.match(r"^\d{4}(-\d{2}(-\d{2})?)?$", v):
                continue
            p = v.split("-")
            try:
                y = int(p[0])
                if len(p) == 1:
                    out.append((date(y, 1, 1), date(y, 12, 31)))
                elif len(p) == 2:
                    m = int(p[1])
                    out.append((date(y, m, 1), date(y, m, calendar.monthrange(y, m)[1])))
                else:
                    d = date(y, int(p[1]), int(p[2]))
                    out.append((d, d))
            except ValueError:
                continue
        return out

    def compat(lv, rv):
        if not lv or not rv:
            return True
        lr, rr = ranges(lv), ranges(rv)
        if lr and rr:
            return any(a[0] <= b[1] and b[0] <= a[1] for a in lr for b in rr)
        return bool(set(lv) & set(rv))

    buckets: dict = {}
    for r in rows:
        key = (r[1], r[2], r[3])
        buckets.setdefault(key, []).append(r)
    canon = {r[0]: r[0] for r in rows}
    for members in buckets.values():
        if len(members) < 2:
            continue
        pairs = {
            (a[0], b[0]): compat(a[4], b[4]) and compat(a[5], b[5])
            for a, b in combinations(members, 2)
        }
        # CC over compatible pairs
        parent = {m[0]: m[0] for m in members}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (a, b), ok in pairs.items():
            if ok:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for m in members:
            groups.setdefault(find(m[0]), []).append(m[0])
        for group in groups.values():
            if len(group) < 2:
                continue
            if all(
                pairs.get((a, b), pairs.get((b, a), False))
                for a, b in combinations(sorted(group), 2)
            ):
                keeper = min(group)
                for g in group:
                    canon[g] = keeper
    return canon


def test_dedupe_edges_matches_python_reference(spark):
    """Randomized-ish grid: many buckets, mixed precisions, empties and
    invalid values — the Spark plan must agree with the brute force."""
    rows = []
    dates = ["2019", "2019-06", "2019-06-15", "2020", "2020-01", "2021-02-29", ""]
    for i in range(60):
        starts = [dates[i % len(dates)]] if dates[i % len(dates)] else []
        ends = [dates[(i * 3 + 1) % len(dates)]] if i % 4 else []
        ends = [e for e in ends if e]
        rows.append(
            (f"e{i:02d}", "Directorship", f"s{i % 5}", f"t{(i // 5) % 4}", starts, ends)
        )
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r["id"]: r["canonical_id"] for r in dedupe_edges(df).collect()}
    assert got == _python_dedupe(rows)
