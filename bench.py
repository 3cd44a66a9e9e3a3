"""Benchmark harness: runs the headline catalog queries and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Each rep rebuilds the query's DataFrame (fresh lineage — no cross-rep
shuffle-stage reuse) and fully materializes it (count); plan construction
is excluded from the clock only for plans whose build verifiably schedules
zero Spark jobs (see run_reps).

Drift control: round-over-round wall times on a shared VM are confounded
by machine load (the r1→r2 DuckDB control itself moved +16% on identical
queries). Each query's DuckDB oracle therefore runs INTERLEAVED in the
same process right after the Spark runs, and the JSON carries per-query
spark/duck ratios ("ratios", plus "ratio_total") — a ratio regression
>20% is a real plan change; a wall-time-only move is load.
"""

from __future__ import annotations

import json
import os
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the scale-relevant plans (big scans/joins/shuffles), not the
# tiny-dimension lookups.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "j3_adjacency_region_revenue",
    "a1_entity_assembly",
    "j1_timestamp_join",
    "d0_d1_version_delta",
    "j6_canonical_map",
    "a8_t4_prefix_date_dedup",
    "j5_t1_blocking_topk",
    "j7_interval_overlap",
    # exporter / streaming / dedup / ANN / multimodal families
    "k3_simple_csv",
    "stream_windowed_agg",
    "dedup_minhash_lsh",
    "dedup_near_cluster",
    "text_tfidf_topk",
    "ann_cosine_topk",
    "mm_byte_features",
    # pure-pushdown scan-agg, double-broadcast distinct, stream-stream join
    "q6_forecast_revenue",
    "q16_supplier_variety",
    "stream_interval_join",
    # six-table join-ordering exhibit; semantic dedup end-to-end
    "q5_local_supplier_volume",
    "dedup_semantic_semdedup",
    # the composed five-stage curation pipeline
    "pipeline_curate_corpus",
    # seven-table join with a one-pass conditional ratio
    "q8_market_share",
    # round 3: BM25 over the inverted index. (dedup_near_cluster_star is
    # deliberately NOT here: its DuckDB oracle is a recursive transitive
    # closure that takes ~1 min at sf0.1 — including it would flatter
    # ratio_total the same way dedup_semantic_semdedup already skews it;
    # its scale evidence lives in SCALE.md §10 and the correctness gate.)
    "search_bm25",
    # round 4 (VERDICT r3 task 2): the map-only chunker joins the suite
    # so its floor-vs-data behaviour is measured alongside bm25's
    "chunk_documents",
]


def run_reps(spark, fn, sf_dir: str, reps: int, control=None):
    """Time one catalog query over ``reps`` independently-built executions.

    Returns ``(times, rows, eager, violations)``.

    Protocol (round 8, replacing the round-7 build-once plan reuse): every
    rep calls ``fn`` again so each execution has a FRESH DataFrame lineage —
    Spark reuses shuffle map outputs across jobs on the same RDD lineage
    (skipped stages), so re-counting one DataFrame lets reps 2..n skip their
    exchanges entirely while the interleaved DuckDB control re-executes
    fully each rep. A fresh lineage per rep makes every rep a full
    execution, symmetrical with the control.

    Plan construction stays excluded for lazily-planned queries (the timer
    starts after ``fn`` returns — a production pipeline builds its DAG once;
    DuckDB's per-rep parse cost is microseconds), but ONLY when the build
    verifiably scheduled zero Spark jobs. The classification probe runs
    once up front; every timed rep re-checks it, so an operator that starts
    caching/collecting mid-build cannot silently move data work off the
    clock — such a rep keeps the full build-inclusive time and is counted
    in ``violations`` (surfaced in the output JSON as ``probe_violations``).
    Eager queries (iterative operators: connected components, k-means,
    checkpointed pipelines) schedule data-proportional jobs during
    construction and are timed build-inclusive every rep.
    """
    tracker = spark.sparkContext.statusTracker()

    def _max_job() -> int:
        ids = tracker.getJobIdsForGroup()
        return max(ids) if ids else -1

    def _snapshot() -> tuple:
        return _max_job(), frozenset(tracker.getActiveJobsIds())

    def _built_jobs(snap: tuple) -> bool:
        # the status store is fed by the async listener bus: a job
        # scheduled during build may not be visible the instant fn
        # returns — also consult the active-job list (a still-running
        # build job shows there first). Compare against the ids active
        # AT SNAPSHOT TIME: a previous rep's completed job whose END
        # event outlives the drain bound must not read as build work.
        j0, active0 = snap
        return _max_job() > j0 or bool(
            set(tracker.getActiveJobsIds()) - active0
        )

    def _drain_active() -> None:
        # job-END events ride the same async bus: wait (bounded) for the
        # previous rep's completed jobs to leave the active list so they
        # can't read as this rep's build work
        deadline = time.time() + 0.25
        while time.time() < deadline and tracker.getActiveJobsIds():
            time.sleep(0.01)

    # classification probe: with relations pre-cached, a lazy plan
    # schedules no jobs during construction. Poll briefly before
    # concluding "lazy" so a bus-delayed build job can't misclassify an
    # eager plan (and silently move its build work off the clock).
    _drain_active()
    snap = _snapshot()
    df = fn(spark, sf_dir)
    eager = _built_jobs(snap)
    if not eager:
        deadline = time.time() + 0.15
        while time.time() < deadline and not eager:
            time.sleep(0.01)
            eager = _built_jobs(snap)

    times: list[float] = []
    violations = 0
    rows = 0
    for _ in range(reps):
        _drain_active()  # settle the listener bus before the snapshot
        t0 = time.time()
        snap = _snapshot()
        df = fn(spark, sf_dir)  # fresh lineage: no cross-rep stage reuse
        built = time.time()
        if not eager:
            if _built_jobs(snap):
                # the "lazy" plan did data work during build — keep the
                # build-inclusive time and flag it loudly
                violations += 1
                print(
                    "# PROBE VIOLATION: lazily-classified query scheduled "
                    "Spark jobs during plan build; timing build-inclusive",
                    file=sys.stderr,
                )
            else:
                t0 = built
        # full materialization without driver-side transfer of big results
        rows = df.count()
        times.append(time.time() - t0)
        if control is not None:
            # interleaved control (spark, duck, spark, duck, ...): both
            # engines see the same instantaneous machine load
            control()
    return times, rows, eager, violations


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # ambient (pre-run) load: sampled BEFORE the bench spins up its own
    # 32 threads — the end-of-run sample mostly measures the bench itself
    try:
        amb1, amb5, _ = os.getloadavg()
    except OSError:  # pragma: no cover
        amb1 = amb5 = -1.0

    from opensanctions_spark.session import get_session
    from opensanctions_spark.catalog import QUERIES

    spark = get_session("opensanctions-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM, parquet reader, shuffle machinery, codegen and the
    # Python worker pool before timing (standard JIT-warmup discipline —
    # every measured query then sees a hot engine, as a long-running
    # cluster would).
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().count()

    def _ident(batches):
        for b in batches:
            yield b

    nation.select("n_nationkey").mapInPandas(
        _ident, "n_nationkey BIGINT"
    ).count()

    # Warm each headline PLAN at the smallest scale factor: first
    # execution of a plan pays analysis + whole-stage codegen + JIT of the
    # generated classes (fixed per plan shape, independent of data size).
    # Running the same plans over sf0.001 populates the codegen cache and
    # JIT-compiles the hot loops, so the timed sf runs below measure data
    # processing — the quantity that scales — not first-compile overhead a
    # long-running cluster never re-pays.
    # (also when the target IS sf0.001 — then warmup doubles as the
    # plan-warm pass, keeping cross-sf totals comparable)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        # drop frames persisted by composed plans during warmup so the
        # timed runs don't compete with stale sf0.001 cache blocks
        spark.catalog.clearCache()

    # Interleaved control: the same oracle SQL DuckDB runs in the
    # correctness gate, timed in this very process so both engines see the
    # same machine load. import-gated: a bench without duckdb still works.
    from opensanctions_spark.catalog import ORACLES

    con = None
    try:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    except Exception as exc:  # pragma: no cover - control is best-effort
        con = None  # a half-initialized control must not run at all
        print(f"# duckdb control unavailable: {exc}", file=sys.stderr)

    # Each query runs three times INTERLEAVED with its DuckDB control
    # (spark, duck, spark, duck, ...) and reports the MIN — the same
    # protocol as the sf1 tables in BENCH_VS_DUCKDB.md. Interleaving puts
    # both engines under the same instantaneous machine load; min-of-3 is
    # the standard steady-state estimator (cf. hyperfine) — one-shot
    # numbers on a shared VM carry ±30% scheduler/GC noise that would
    # otherwise be recorded as the engine's time. The per-query rep spread
    # ((max-min)/min) is recorded so a reader can tell a plan change from
    # measurement wobble.
    # Pre-resolve every table relation for the timed sf_dir (footer +
    # listing, ~80 ms per table): a metastore-backed deployment holds these
    # in its relation cache permanently (catalog.load mirrors that), so the
    # timed queries measure execution, not repeated metadata resolution.
    from opensanctions_spark.catalog import load as load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t)
        except Exception:
            pass

    REPS = 3
    timings: dict[str, float] = {}
    duck: dict[str, float] = {}
    ratios: dict[str, float] = {}
    spread: dict[str, float] = {}
    probe_violations: dict[str, int] = {}

    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        sql = ORACLES.get(name)
        dtimes: list[float] = []
        duck_state = {"ok": con is not None and sql is not None}

        def _duck_control():
            if not duck_state["ok"]:
                return
            try:
                t0 = time.time()
                con.execute(sql).fetchall()
                dtimes.append(time.time() - t0)
            except Exception as exc:
                duck_state["ok"] = False
                print(f"# duckdb control {name} failed: {exc}",
                      file=sys.stderr)

        # Spark reps: fresh lineage per rep, plan-build excluded only for
        # verified-lazy plans, DuckDB control interleaved per rep
        # (see run_reps).
        stimes, n, eager, viol = run_reps(
            spark, fn, sf_dir, REPS, control=_duck_control
        )
        if viol:
            probe_violations[name] = viol
        if not duck_state["ok"]:
            dtimes = []
        best = min(stimes)
        timings[name] = round(best, 3)
        spread[name] = round((max(stimes) - best) / best, 2) if best else 0.0
        if dtimes:
            dbest = min(dtimes)
            duck[name] = round(dbest, 3)
            ratios[name] = round(best / dbest, 2) if dbest > 0 else 0.0
        extra = (
            f" | duck {duck[name]}s ratio {ratios[name]}x"
            if name in ratios
            else ""
        )
        print(
            f"# {name}: {n} rows in {timings[name]}s"
            f" (spread {spread[name]}){extra}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    duck_total = round(sum(duck.values()), 3)
    try:
        end1, _end5, _ = os.getloadavg()
    except OSError:  # pragma: no cover
        end1 = -1.0
    # Final stdout line stays COMPACT (the driver parses a bounded tail of
    # stdout — an oversized line truncates and fails its JSON parse); the
    # per-query DuckDB control, ratios and rep spreads go to stderr and
    # matter for analysis, not for the driver record.
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": REPS,
        "ambient_load1": round(amb1, 2),
        "ambient_load5": round(amb5, 2),
        "end_load1": round(end1, 2),
    }
    detail = {"rep_spread": spread}
    if duck:
        # ratio over the INTERSECTION only: if a control failed for some
        # query, comparing the all-queries Spark total against a partial
        # DuckDB total would read as a fake regression
        spark_matched = round(sum(timings[n] for n in duck), 3)
        detail["duckdb"] = duck
        detail["ratios"] = ratios
        out["duckdb_total"] = duck_total
        out["ratio_total"] = (
            round(spark_matched / duck_total, 2) if duck_total else 0.0
        )
        if len(duck) < len(timings):
            out["control_missing"] = sorted(set(timings) - set(duck))
    if probe_violations:
        # a lazily-classified plan did data work during construction in
        # some rep — those reps were timed build-inclusive; flag the fact
        out["probe_violations"] = probe_violations
    if amb5 > 2.0:
        # shared-VM guard (VERDICT r6 #8): headline numbers recorded above
        # AMBIENT load ~2 carry external-tenant noise — annotate, don't
        # assert (the interleaved DuckDB control already normalizes the
        # ratio; the warning flags the absolute wall numbers)
        out["load_warning"] = True
    print("# detail " + json.dumps(detail), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
