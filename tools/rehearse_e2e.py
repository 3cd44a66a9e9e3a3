"""Round-11 production rehearsal: the full `zavod run` shape, end to end.

One measured job chaining every stage the reference's ETL executes
(``zavod/zavod/cli/etl.py:95-154``), at sf1 vs sf10, with per-stage
wall, shuffle-write bytes (Spark UI REST, same numbers as the stage
table) and peak JVM heap (executor peakMemoryMetrics):

  1. MELT       crawl analogue: customers + suppliers + a duplicated
                customer shard (every 10th customer re-emitted under a
                'd-' id — the cross-dataset duplicate universe) + edge
                entities (every 10th order joined to its first
                lineitem → subject/object statements linking customer
                and supplier, the relationship schema).
  2. XREF       J5 blocking → T1 top-k → J9 match rules → J6
                union-find → canonical map (plans/xref.py): the 'd-'
                duplicates score 1.0 on exact names and auto-merge
                into their 'c-' originals.
  3. RUN 1      run_dataset: J1 first_seen propagation, versioned
                archive write, J2 canonical rekey at read time, A1
                assembly (one shuffle), shared-scan validators
                (GROUPING SETS + J10 dangling anti-join), ALL sinks
                K1-K10 + K12 metadata off one persisted entity view
                (single_file=False — the range-ordered cluster path).
  4. CONSOLIDATE the A8/A9/A10 export-time consolidation pass over the
                run-1 entity view: prefix-value drop per
                (canonical_id, prop) window, name reduction, and
                undirected-edge normalization + dedupe.
  5. ENRICH     the §3.2 enrichment lifecycle (round 12): customer
                entities matched against an external dataset (every
                20th customer re-published under an 'x-' id) — J8
                same-id + J5 blocking, judgement gate (every 40th pair
                pre-judged POSITIVE), J4 bounded expansion over the
                external dataset's adjacency, publishability semi-join.
                POSITIVE matches' targets melt into external=True
                statements that feed run 2 (the reference's
                enrich→crawl hand-off, zavod/zavod/runner/enrich.py).
  6. RUN 2      the incremental run: every 5th customer's balance
                drifts + the enrichment candidates union in → J1
                carries first_seen, D0/D1 version delta exports
                ADD/MOD/DEL ops.

Env:
  SPARK_GRAFT_ATTRIBUTE=1  per-stage shuffle attribution on stderr.
  SPARK_GRAFT_SKEW=1       heavy-hitter mode: one entity holds ~1.5% of
                           all statements (orders-derived notes on a
                           single id) and every 150th customer name
                           carries a shared hot token pair (~100-1000×
                           the median blocking DF); the melt profiles
                           the key distribution (t6) and the gate is
                           every stage within ~2× its uniform wall.

Usage: python tools/rehearse_e2e.py [sf_dir]
Prints one JSON line with per-stage {wall_sec, shuffle_mb} plus
peak_jvm_heap_mb and row counts. SCALE.md §21 records the sf1-vs-sf10
pair — the gate is ~linear growth in wall and shuffle bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_json(url: str):
    """REST fetch with retries: the embedded UI server can refuse
    connections for a moment under driver GC pressure — a metrics
    hiccup must not kill a multi-minute rehearsal run."""
    for attempt in range(5):
        try:
            with urllib.request.urlopen(url, timeout=10) as resp:
                return json.load(resp)
        except Exception:
            if attempt == 4:
                return None
            time.sleep(2 * (attempt + 1))


def _stages_total(ui: str, app_id: str) -> int | None:
    stages = _get_json(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    if stages is None:
        return None
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _stages_detail(ui: str, app_id: str) -> dict[int, tuple[int, str, int]]:
    """stage id → (shuffleWriteBytes, short name, executorRunTime ms)
    for per-exchange attribution (SCALE.md §21c: a phase total alone
    can't say WHICH exchange grew super-linearly)."""
    stages = _get_json(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    if stages is None:
        return {}
    return {
        s["stageId"]: (
            s.get("shuffleWriteBytes", 0),
            (s.get("name") or "").split("\n")[0][:120],
            s.get("executorRunTime", 0),
        )
        for s in stages
    }


def _peak_heap_mb(ui: str, app_id: str) -> float | None:
    execs = _get_json(f"{ui}/api/v1/applications/{app_id}/executors")
    if execs is None:
        return None
    peak = 0
    for e in execs:
        m = e.get("peakMemoryMetrics") or {}
        peak = max(peak, m.get("JVMHeapMemory", 0))
    return round(peak / 1e6, 1)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.model.melt import (
        finish_statements,
        melt_customers,
        melt_suppliers,
    )
    from opensanctions_spark.plans.run import DatasetConfig, run_dataset
    from opensanctions_spark.plans.xref import XrefConfig, xref_and_resolve
    from opensanctions_spark.session import configure
    from opensanctions_spark.sources.archive import StatementArchive

    builder = SparkSession.builder.appName("rehearse-e2e").master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    spark = configure(builder).config("spark.ui.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    report: dict[str, dict] = {}

    attribute = os.environ.get("SPARK_GRAFT_ATTRIBUTE") == "1"

    def measure(name: str):
        class _M:
            def __enter__(self):
                self.sw0 = _stages_total(ui, app_id)
                self.detail0 = _stages_detail(ui, app_id) if attribute else {}
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                sw1 = _stages_total(ui, app_id)
                shuffle = (
                    round((sw1 - self.sw0) / 1e6, 1)
                    if sw1 is not None and self.sw0 is not None
                    else None
                )
                report[name] = {
                    "wall_sec": round(time.time() - self.t0, 2),
                    "shuffle_mb": shuffle,
                }
                if attribute:
                    detail1 = _stages_detail(ui, app_id)
                    new = [
                        (b, rt, sid, nm)
                        for sid, (b, nm, rt) in detail1.items()
                        if sid not in self.detail0
                    ]
                    print(f"--- {name}: top shuffle-writing stages ---",
                          file=sys.stderr)
                    for b, rt, sid, nm in sorted(new, reverse=True)[:8]:
                        if b > 0:
                            print(f"  {b/1e6:10.1f} MB  stage {sid:4d}  {nm}",
                                  file=sys.stderr)
                    print(f"--- {name}: top stages by executor time ---",
                          file=sys.stderr)
                    for rt, b, sid, nm in sorted(
                        ((rt, b, sid, nm) for b, rt, sid, nm in new),
                        reverse=True,
                    )[:8]:
                        print(f"  {rt/1000:9.1f} s   stage {sid:4d}  {nm}",
                              file=sys.stderr)

        return _M()

    work = tempfile.mkdtemp(prefix="rehearse_")
    # production layout (round 12): versions bucketed on canonical_id —
    # with the pre-write rekey + manifest fingerprint, run 2's J1 probe,
    # A1 assembly and D0/D1 diff all ride the stored clustering
    archive = StatementArchive(
        spark, os.path.join(work, "archive"), bucket_statements=True
    )
    config = DatasetConfig(name="default")

    # ---- 1. MELT -----------------------------------------------------------
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    skew = os.environ.get("SPARK_GRAFT_SKEW") == "1"

    def statements_for(cust_df):
        from opensanctions_spark.model.melt import statement_id

        if skew:
            # hot blocking token pair: every 150th customer's name gains
            # a shared two-word prefix (DF ~ n/150 — far over any
            # plausible median and over the xref cap, which must absorb
            # it without a quadratic bucket)
            cust_df = cust_df.withColumn(
                "c_name",
                F.when(
                    F.col("c_custkey") % 150 == 0,
                    F.concat(F.lit("Zeta Syndicate "), F.col("c_name")),
                ).otherwise(F.col("c_name")),
            )
        dup = cust_df.filter(F.col("c_custkey") % 10 == 0)
        # relabel the duplicate shard AFTER melt: new entity_id, new
        # canonical_id, and a RECOMPUTED statement id (the provenance
        # hash encodes the entity_id — keeping the original's hash would
        # collide in the archive and dedupe the shard away)
        dup_stmts = (
            melt_customers(dup)
            .withColumn("entity_id", F.regexp_replace("entity_id", "^c-", "d-"))
            .withColumn("canonical_id", F.col("entity_id"))
            .withColumn(
                "id",
                statement_id(
                    F.col("dataset"),
                    F.col("entity_id"),
                    F.col("prop"),
                    F.col("value"),
                ),
            )
        )
        edges = (
            orders.filter(F.col("o_orderkey") % 10 == 0)
            .join(
                lineitem.filter(F.col("l_linenumber") == 1).select(
                    "l_orderkey", "l_suppkey"
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(
                F.concat(F.lit("e-"), F.col("o_orderkey")).alias("entity_id"),
                F.expr(
                    "stack(3, "
                    "'subject', 'c-' || o_custkey, "
                    "'object', 's-' || l_suppkey, "
                    "'role', o_orderpriority) as (prop, value)"
                ),
            )
        )
        edge_stmts = finish_statements(
            edges, dataset="links", schema_name="UnknownLink"
        )
        out = (
            melt_customers(cust_df)
            .unionByName(melt_suppliers(supp))
            .unionByName(dup_stmts)
            .unionByName(edge_stmts)
        )
        if skew:
            # the heavy-hitter entity: one canonical id holding every
            # 100th order's description as a statement (~1.5% of the
            # whole corpus on ONE key) — the production shape the
            # uniform synthetic tables never produce
            mega = orders.filter(F.col("o_orderkey") % 100 == 0).select(
                F.lit("mega-1").alias("entity_id"),
                F.lit("notes").alias("prop"),
                F.concat_ws(
                    " ", F.col("o_orderkey"), F.col("o_orderpriority"),
                    F.col("o_orderdate").cast("string"),
                ).alias("value"),
            )
            out = out.unionByName(
                finish_statements(
                    mega, dataset="megacorp", schema_name="Organization"
                )
            )
        return out

    with measure("melt"):
        stmts1 = statements_for(cust)
        n_stmts = stmts1.count()

    skew_top = None
    if skew:
        # t6 wiring: the key profile decides whether any stage needs a
        # salted twin — report the heavy hitter's share so the stage
        # table below reads against a known distribution
        from opensanctions_spark.operators.profiling import key_skew_profile

        top = key_skew_profile(stmts1, "canonical_id", top_k=3).collect()
        skew_top = [
            {"key": r["key"], "cnt": r["cnt"], "share_ppm": r["share_ppm"]}
            for r in top
        ]
        print(f"skew profile (top keys): {skew_top}", file=sys.stderr)

    # ---- 2. XREF -----------------------------------------------------------
    with measure("xref"):
        # xref universe: the customer dataset only (originals + 'd-'
        # duplicates). Suppliers are excluded — their zero-padded number
        # tokens collide with customer numbers, and cross-schema merges
        # are not the lifecycle under rehearsal. max_token_freq keeps the
        # skew cap ON: the "Customer" word token appears in every name
        # and would otherwise expand one quadratic blocking bucket.
        subjects = (
            stmts1.filter(
                (F.col("prop") == "name") & (F.col("dataset") == "customers")
            )
            .select(
                F.col("entity_id").alias("id"),
                F.col("value").alias("name"),
                # the name doubles as a registration-style strong id: the
                # J9 perfect-strong-id rule then FORCES the duplicate
                # merges the blocking stage proposes — the reference's
                # strong-identifier path, and robust against the Jaccard
                # denominator counting the capped-away "Customer" token
                # (an exact-dup pair scores only 1/3 post-cap)
                F.array(F.col("value")).alias("strong_ids"),
                F.array().cast("array<string>").alias("id_numbers"),
            )
            .distinct()
        )
        # production split (round 11): exact strong-id groups resolve
        # through the LINEAR strong_id_edges path (one groupBy, (d-1)
        # spanning edges per d-way duplicate group), so the blocking cap
        # budgets the FUZZY candidate path alone — at sf10 the
        # replicated-name corpus carries 100-way exact groups whose
        # pairwise expansion would shuffle 7.2 GB (measured, SCALE.md
        # §21) for merges the linear path finds in one exchange
        xcfg = XrefConfig(threshold=0.7, top_k=3, limit=None, max_token_freq=20)
        _decisions, mapping = xref_and_resolve(
            subjects, xcfg, exact_strong_ids=True
        )
        mapping = mapping.persist()
        n_merged = mapping.filter(F.col("entity_id") != F.col("canonical_id")).count()

    # ---- 3. RUN 1 (J1 + J2 + A1 + validators + K1-K12) --------------------
    with measure("run1"):
        r1 = run_dataset(
            spark,
            stmts1,
            config,
            archive,
            os.path.join(work, "out1"),
            run_time="2026-08-01T00:00:00",
            canonical_map=mapping,
            single_file=False,
        )

    # ---- 4. CONSOLIDATE (A8 / A9 / A10) -----------------------------------
    from opensanctions_spark.operators.assembly import assemble_entities
    from opensanctions_spark.operators.consolidate import (
        collapse_undirected_edges,
        drop_prefix_values,
        reduce_names,
    )

    with measure("consolidate"):
        stmts_v1 = archive.read(config.name)
        # A8: per-(entity, prop) prefix-value drop over the full value set
        # (the reference restricts it to date props; running it over every
        # prop is the identical window plan on more rows)
        a8 = drop_prefix_values(
            stmts_v1.select("canonical_id", "prop", "value"),
            ["canonical_id", "prop"],
        ).count()
        # A9: name reduction over the entity name universe
        names = stmts_v1.filter(F.col("prop") == "name").select(
            "canonical_id",
            F.col("value").alias("name"),
            F.lit("name").alias("kind"),
        )
        a9 = reduce_names(names).count()
        # A10: undirected-edge normalization + dedupe over the link schema
        edges_v = (
            stmts_v1.filter(F.col("schema") == "UnknownLink")
            .groupBy("canonical_id")
            .pivot("prop", ["subject", "object"])
            .agg(F.first("value"))
        )
        a10 = (
            collapse_undirected_edges(edges_v, "subject", "object")
            .select("subject", "object")
            .distinct()
            .count()
        )

    # ---- 5. ENRICH (§3.2: J8 + J5 → judgement gate → J4 expand) -----------
    from opensanctions_spark.model.melt import statement_id
    from opensanctions_spark.plans.enrich import EnrichConfig, enrich

    with measure("enrich"):
        # the external enrichment dataset: every 20th customer published
        # under an x- id with the same name (the wikidata/opencorporates
        # shape: an external graph overlapping the subjects by name)
        ext_cust = cust.filter(F.col("c_custkey") % 20 == 0)
        # target names through the SAME melt normalization as the
        # subjects — matching feeds on cleaned values on both sides
        targets = (
            melt_customers(ext_cust)
            .filter(F.col("prop") == "name")
            .select(
                F.regexp_replace("entity_id", "^c-", "x-").alias("id"),
                F.col("value").alias("name"),
            )
            .distinct()
        )
        subjects_e = (
            stmts1.filter(
                (F.col("prop") == "name") & (F.col("dataset") == "customers")
            )
            .select(F.col("entity_id").alias("id"), F.col("value").alias("name"))
            .distinct()
        )
        # the external dataset's own adjacency (expansion walks the
        # TARGET graph): each x- customer linked to the supplier of its
        # first every-10th order
        ext_edges = (
            orders.filter(F.col("o_orderkey") % 10 == 0)
            .join(
                lineitem.filter(F.col("l_linenumber") == 1).select(
                    "l_orderkey", "l_suppkey"
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .filter(F.col("o_custkey") % 20 == 0)
            .select(
                F.concat(F.lit("x-"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("xs-"), F.col("l_suppkey")).alias("dst"),
            )
        )
        judgements = ext_cust.filter(F.col("c_custkey") % 40 == 0).select(
            F.concat(F.lit("c-"), F.col("c_custkey")).alias("left_id"),
            F.concat(F.lit("x-"), F.col("c_custkey")).alias("right_id"),
            F.lit("POSITIVE").alias("judgement"),
        )
        candidates, internal = enrich(
            subjects_e, targets, ext_edges, judgements,
            publishable=targets.select("id"),
            # cutoff 0.3, not the reference's 0.5: its cutoff applies to
            # the feature scorer; the rehearsal's candidate metric is the
            # capped Jaccard, where an exact-name pair whose common word
            # token is over the DF cap scores 1/3 (the cap keeps the
            # "Customer" bucket from expanding 150k x 7.5k pairs)
            config=EnrichConfig(cutoff=0.3, top_k=10, max_token_freq=100),
        )
        candidates = candidates.persist()
        n_candidates = candidates.count()
        n_internal = internal.count()
        # the enrich→crawl hand-off: matched targets' statements enter
        # run 2 as external=True rows under the enrichment dataset
        matched = candidates.select(
            F.col("candidate_id").alias("xid")
        ).distinct()
        ext_stmts = (
            melt_customers(ext_cust)
            .withColumn("entity_id", F.regexp_replace("entity_id", "^c-", "x-"))
            .withColumn("canonical_id", F.col("entity_id"))
            .withColumn("dataset", F.lit("enrich"))
            .withColumn("external", F.lit(True))
            .withColumn(
                "id",
                statement_id(
                    F.col("dataset"), F.col("entity_id"), F.col("prop"),
                    F.col("value"),
                ),
            )
            .join(
                matched.select(F.col("xid").alias("entity_id")),
                "entity_id",
                "left_semi",
            )
        )

    # ---- 6. RUN 2 (incremental: drift + enrichment → D0/D1 delta) ---------
    with measure("run2"):
        drifted = cust.withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 1
            ).otherwise(F.col("c_acctbal")),
        )
        r2 = run_dataset(
            spark,
            statements_for(drifted).unionByName(ext_stmts),
            config,
            archive,
            os.path.join(work, "out2"),
            run_time="2026-08-13T00:00:00",
            canonical_map=mapping,
            single_file=False,
        )
        candidates.unpersist()

    peak = _peak_heap_mb(ui, app_id)
    total_wall = round(sum(s["wall_sec"] for s in report.values()), 2)
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "rehearse_e2e",
                "sf_dir": sf_dir,
                "statements": n_stmts,
                "merged_ids": n_merged,
                "entities_run1": r1.entity_count,
                "delta_ops_run2": r2.delta_ops,
                "consolidate_counts": {"a8": a8, "a9": a9, "a10": a10},
                "enrich": {"candidates": n_candidates, "internal": n_internal},
                **({"skew_top": skew_top} if skew_top else {}),
                "sinks": sorted(r1.export_counts),
                "stages": report,
                "total_wall_sec": total_wall,
                "peak_jvm_heap_mb": peak,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
