"""Composed edge-dedupe lifecycle (SURVEY J7 — the full
zavod/zavod/integration/edges.py semantics, not just the interval join):
bucketing, partial-ISO range compatibility, ambiguous-bridge removal,
pairwise-consistent group merge, per-schema protected-prop conflicts."""

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


def test_null_date_arrays_read_as_wildcards(spark):
    # null arrays (routine in arbitrary parquet) must behave exactly like
    # empty ones — the reference treats missing temporal evidence as
    # compatible with everything (ADVICE r1)
    rows = [
        ("e1", "Directorship", "a", "b", None, None),
        ("e2", "Directorship", "a", "b", ["2021"], ["2022"]),
    ]
    got = _result(spark, rows)
    assert got["e2"] == ("e1", True)


def test_self_loops_and_null_endpoints_never_merge(spark):
    # reference bucket_key returns None for source == target and for
    # edges without exactly one source and target (edges.py:93-106)
    rows = [
        ("e1", "Directorship", "a", "a", ["2020"], []),
        ("e2", "Directorship", "a", "a", ["2020"], []),
        ("e3", "Directorship", None, "b", ["2020"], []),
        ("e4", "Directorship", None, "b", ["2020"], []),
    ]
    got = _result(spark, rows)
    assert all(not merged for (_, merged) in got.values())
    assert got["e1"] == ("e1", False)


def test_ambiguous_bridge_removed_clean_subgroup_still_merges(spark):
    # ADVICE r1 / reference edges.py:260-279: V=2020 is compatible with
    # both X=2020-01 and A=2020-03, which are mutually incompatible → V
    # is an ambiguous bridge and drops out; A+B (both 2020-03) still
    # merge; X stays alone.
    rows = [
        ("eA", "Directorship", "a", "b", ["2020-03"], []),
        ("eB", "Directorship", "a", "b", ["2020-03"], []),
        ("eV", "Directorship", "a", "b", ["2020"], []),
        ("eX", "Directorship", "a", "b", ["2020-01"], []),
    ]
    got = _result(spark, rows)
    assert got["eB"] == ("eA", True)
    assert got["eV"] == ("eV", False)
    assert got["eX"] == ("eX", False)


def test_nontransitive_chain_blocks_the_group(spark):
    # e2 (all of 2020) bridges e1 and e3 which are incompatible → e2 is
    # ambiguous and drops; e1/e3 have no compatible partner left → no merge
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


_PSCHEMA = _SCHEMA + ", props map<string,array<string>>"


def _presult(spark, rows, **kw):
    df = spark.createDataFrame(rows, _PSCHEMA)
    return {r["id"]: (r["canonical_id"], r["merged"]) for r in dedupe_edges(df, **kw).collect()}


def test_protected_props_apply_by_default_per_schema(spark):
    # Ownership percentage is protected by DEFAULT (reference
    # PROTECTED_PROPS, edges.py:57-75) — no opt-in flag needed
    rows = [
        ("e1", "Ownership", "a", "b", ["2020"], [], {"percentage": ["10"]}),
        ("e2", "Ownership", "a", "b", ["2020"], [], {"percentage": ["90"]}),
        ("e3", "Ownership", "a", "c", ["2020"], [], {"percentage": ["10"]}),
        ("e4", "Ownership", "a", "c", ["2020"], [], {"percentage": ["10"]}),
    ]
    got = _presult(spark, rows)
    assert got["e1"] == ("e1", False) and got["e2"] == ("e2", False)
    assert got["e4"] == ("e3", True)  # same value → merges


def test_protected_sets_use_intersection_not_count_distinct(spark):
    # {'10','90'} vs {'10'} intersect → compatible (pairwise
    # set-intersection semantics, NOT count_distinct>1 — ADVICE r1)
    rows = [
        ("e1", "Ownership", "a", "b", ["2020"], [], {"percentage": ["10", "90"]}),
        ("e2", "Ownership", "a", "b", ["2020"], [], {"percentage": ["10"]}),
    ]
    got = _presult(spark, rows)
    assert got["e2"] == ("e1", True)


def test_protected_values_slugify_before_comparing(spark):
    # 'Director' vs 'director' normalize equal under slugify
    rows = [
        ("e1", "Directorship", "a", "b", ["2020"], [], {"role": ["Director"]}),
        ("e2", "Directorship", "a", "b", ["2020"], [], {"role": ["director"]}),
        ("e3", "Directorship", "a", "c", ["2020"], [], {"role": ["chair"]}),
        ("e4", "Directorship", "a", "c", ["2020"], [], {"role": ["director"]}),
    ]
    got = _presult(spark, rows)
    assert got["e2"] == ("e1", True)
    assert got["e4"] == ("e4", False)  # conflicting roles refuse


def test_protected_empty_set_is_wildcard(spark):
    rows = [
        ("e1", "Ownership", "a", "b", ["2020"], [], {}),
        ("e2", "Ownership", "a", "b", ["2020"], [], {"percentage": ["50"]}),
    ]
    got = _presult(spark, rows)
    assert got["e2"] == ("e1", True)


def test_protected_override_and_disable(spark):
    rows = [
        ("e1", "Ownership", "a", "b", ["2020"], [], {"percentage": ["10"]}),
        ("e2", "Ownership", "a", "b", ["2020"], [], {"percentage": ["90"]}),
    ]
    # [] disables the protected check entirely → conflicting percentages merge
    got = _presult(spark, rows, protected_props=[])
    assert got["e2"] == ("e1", True)
    # explicit list replaces the schema table
    got = _presult(spark, rows, protected_props=["percentage"])
    assert got["e2"] == ("e2", False)


def _python_dedupe(rows):
    """Brute-force parity oracle: a direct Python port of zavod's
    algorithm (edges.py:234-360) — bucket → range compat → AMBIGUOUS
    bridge removal → CC over remaining → pairwise temporal check →
    protected-prop pairwise check → min-id merge. Pins the reference
    semantics, not the Spark implementation."""
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

    def slug(v):
        s = re.sub(r"-+$", "", re.sub(r"^-+", "", re.sub(r"[^a-z0-9]+", "-", v.lower())))
        return s or None

    from opensanctions_spark.operators.edges import PROTECTED_PROPS

    def props_ok(a_props, b_props, schema):
        for p in PROTECTED_PROPS.get(schema, []):
            av = {s for s in map(slug, (a_props or {}).get(p, [])) if s}
            bv = {s for s in map(slug, (b_props or {}).get(p, [])) if s}
            if av and bv and not (av & bv):
                return False
        return True

    buckets: dict = {}
    for r in rows:
        if r[2] is None or r[3] is None or r[2] == r[3]:
            continue
        key = (r[1], r[2], r[3])
        buckets.setdefault(key, []).append(r)
    canon = {r[0]: r[0] for r in rows}
    for (schema, _, _), members in buckets.items():
        if len(members) < 2:
            continue
        by_id = {m[0]: m for m in members}
        tpairs = {
            (a[0], b[0]): compat(a[4] or [], b[4] or []) and compat(a[5] or [], b[5] or [])
            for a, b in combinations(members, 2)
        }

        def tcompat(x, y):
            return tpairs.get((x, y), tpairs.get((y, x), False))

        ids = sorted(by_id)
        # ambiguous bridges: compatible with two mutually-incompatible nodes
        ambiguous = set()
        for x in ids:
            nbrs = [n for n in ids if n != x and tcompat(x, n)]
            for a, b in combinations(nbrs, 2):
                if not tcompat(a, b):
                    ambiguous.add(x)
                    break
        remaining = [i for i in ids if i not in ambiguous]
        # CC over compatible pairs among remaining
        parent = {i: i for i in remaining}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in combinations(remaining, 2):
            if tcompat(a, b):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for i in remaining:
            groups.setdefault(find(i), []).append(i)
        for group in groups.values():
            if len(group) < 2:
                continue
            ok = all(tcompat(a, b) for a, b in combinations(group, 2))
            if ok:
                ok = all(
                    props_ok(
                        by_id[a][6] if len(by_id[a]) > 6 else None,
                        by_id[b][6] if len(by_id[b]) > 6 else None,
                        schema,
                    )
                    for a, b in combinations(group, 2)
                )
            if ok:
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


def test_dedupe_edges_matches_python_reference_with_props(spark):
    """Parity grid including protected props, self-loops and null arrays."""
    rows = []
    dates = ["2019", "2019-06", "2019-06-15", "2020", None]
    roles = [["Director"], ["director"], ["chair"], [], None]
    for i in range(48):
        d = dates[i % len(dates)]
        starts = [d] if d else (None if i % 5 == 4 else [])
        props = {"percentage": [str(10 * (i % 3))], "role": roles[i % len(roles)] or []}
        rows.append(
            (
                f"e{i:02d}",
                "Ownership" if i % 2 else "Directorship",
                f"s{i % 4}" if i % 7 else None,
                f"t{(i // 4) % 3}" if i % 11 else f"s{i % 4}",
                starts,
                [],
                props,
            )
        )
    df = spark.createDataFrame(rows, _PSCHEMA)
    got = {r["id"]: r["canonical_id"] for r in dedupe_edges(df).collect()}
    assert got == _python_dedupe(rows)
