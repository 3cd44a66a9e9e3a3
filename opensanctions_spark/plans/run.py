"""The full dataset run: crawl output → statements → entities → exports.

Mirrors ``zavod run`` (``zavod/zavod/cli/etl.py:95-154``) as ONE Spark job
graph:

1. statements stamped with first_seen propagated from the previous
   version (J1, ``zavod/zavod/runtime/timestamps.py``),
2. versioned parquet write (the statements.pack + archive analogue),
3. entity assembly (A1) — persisted once,
4. validation: assertion thresholds with fatal-min semantics (A12,
   ``zavod/zavod/validators/assertions.py:24-183``) + dangling-reference
   anti-join (J10, ``zavod/zavod/validators/__init__.py:15-27``),
5. every exporter off the shared scan (§2.2),
6. delta vs the previous version (D0/D1) written alongside.

The reference does store-sync into LevelDB between crawl and export; on
Spark that whole stage *is* the assembly shuffle — there is no separate
materialization.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.exporters import export_all, prop_values
from opensanctions_spark.model.registry import ENTITY_PROPS
from opensanctions_spark.operators.assembly import assemble_entities
from opensanctions_spark.operators.delta import hashed_entities, version_diff
from opensanctions_spark.operators.timestamps import propagate_first_seen
from opensanctions_spark.sources.archive import StatementArchive


@dataclass
class Assertion:
    metric: str          # e.g. "entity_count", "schema:Person", "country:de",
                         # "countries", "prop:Company.name", "fill:Person.name"
    op: str              # "min" | "max"
    threshold: float     # int for counts, float for fill rates
    level: str = "error"  # "error" (fatal) | "warning"


#: Baseline assertions merged into every dict-form dataset config, leaf-
#: overridable by the dataset's own block (the reference's
#: DEFAULT_ASSERTIONS, ``zavod/zavod/meta/dataset.py:40-53``).
#: ``property_fill_rate`` only applies to schemata the dataset actually
#: emits — check_assertions skips absent schemata.
DEFAULT_ASSERTIONS: dict = {
    "min": {
        "property_fill_rate": {
            "Person": {"name": 0.95},
            "LegalEntity": {"name": 0.95},
            "Organization": {"name": 0.95},
            "Company": {"name": 0.95},
        }
    }
}

#: Reference metric vocabulary (``zavod/zavod/meta/assertion.py``) → the
#: flat metric-string families check_assertions evaluates.
_ASSERTION_METRICS = {
    "entity_count", "schema_entities", "country_entities", "countries",
    "entities_with_prop", "property_fill_rate",
}


def merge_assertions_config(base: dict, override: dict) -> dict:
    """Deep-merge two assertion config dicts, override winning at the
    leaf (``zavod/zavod/meta/assertion.py merge_assertions_config``)."""
    from copy import deepcopy

    result = deepcopy(base)
    for key, value in override.items():
        existing = result.get(key)
        if isinstance(existing, dict) and isinstance(value, dict):
            result[key] = merge_assertions_config(existing, value)
        else:
            result[key] = deepcopy(value)
    return result


def parse_assertions(config: dict) -> list[Assertion]:
    """Reference YAML assertion block → flat Assertion rows
    (``zavod/zavod/meta/assertion.py parse_assertions`` + the
    validator's level rule: only min/GTE failures abort, max/LTE
    failures warn — ``validators/assertions.py is_assertion_fatal``).
    Unknown comparisons or metrics raise ValueError, like the
    reference's Enum lookups."""
    out: list[Assertion] = []
    for key, metrics in config.items():
        if key == "min":
            level = "error"
        elif key == "max":
            level = "warning"
        else:
            raise ValueError(f"Unknown assertion: {key}")
        for metric, mconf in metrics.items():
            if metric not in _ASSERTION_METRICS:
                raise ValueError(f"Unknown metric: {metric}")
            if metric == "entity_count":
                out.append(Assertion("entity_count", key, mconf, level))
            elif metric == "countries":
                out.append(Assertion("countries", key, mconf, level))
            elif metric == "schema_entities":
                for schema, t in mconf.items():
                    out.append(Assertion(f"schema:{schema}", key, t, level))
            elif metric == "country_entities":
                for country, t in mconf.items():
                    out.append(Assertion(f"country:{country}", key, t, level))
            elif metric == "entities_with_prop":
                for schema, props in mconf.items():
                    for prop, t in props.items():
                        out.append(
                            Assertion(f"prop:{schema}.{prop}", key, t, level)
                        )
            elif metric == "property_fill_rate":
                for schema, props in mconf.items():
                    for prop, t in props.items():
                        out.append(
                            Assertion(f"fill:{schema}.{prop}", key, t, level)
                        )
    return out


@dataclass
class DatasetConfig:
    """Dataset run configuration — the ``zavod`` dataset YAML analogue
    (``zavod/zavod/meta/model.py`` + ``dataset.py:184-202``): ``name``
    and assertion thresholds drive the run; everything else
    (title/summary/publisher/url/tags/coverage/type/hidden/...) is
    published metadata that flows verbatim into ``index.json``."""

    name: str
    assertions: list[Assertion] = field(default_factory=list)
    #: False when the dataset's own config declared no assertions (the
    #: baseline defaults may still be merged in) — drives the
    #: reference's "Dataset has no assertions." nudge, which is logged
    #: as an error-level issue but never aborts
    #: (``validators/assertions.py:166-177``).
    has_user_assertions: bool = True
    metadata: dict = field(default_factory=dict)
    #: datapatch lookup tables (``lookups:`` in the dataset YAML —
    #: ``zavod/zavod/meta/dataset.py:117-120``); ``prop.<name>`` lookups
    #: are applied as a cleaning pass before the archive write
    lookups: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, data: dict) -> "DatasetConfig":
        data = dict(data)
        name = data.pop("name")
        raw = data.pop("assertions", None)
        has_user = True
        if isinstance(raw, dict) or raw is None:
            # the reference's YAML shape: {min: {...}, max: {...}} —
            # baseline defaults merge in, leaf-overridable; an absent
            # or empty block sets the nudge flag
            user = raw or {}
            has_user = bool(parse_assertions(user))
            assertions = parse_assertions(
                merge_assertions_config(DEFAULT_ASSERTIONS, user)
            )
        else:
            # legacy flat list form ("metric:op:threshold" strings or
            # Assertion kwarg dicts) — used as given, no defaults
            assertions = []
            for a in raw:
                if isinstance(a, str):
                    metric, op, threshold = a.rsplit(":", 2)
                    assertions.append(
                        Assertion(metric=metric, op=op, threshold=int(threshold))
                    )
                else:
                    assertions.append(Assertion(**a))
        lookups = {}
        if "lookups" in data:
            from opensanctions_spark.functions.lookups import load_lookups

            lookups = load_lookups({"lookups": data.pop("lookups")})
        return cls(name=name, assertions=assertions,
                   has_user_assertions=has_user, metadata=data,
                   lookups=lookups)

    @classmethod
    def from_file(cls, path: str) -> "DatasetConfig":
        """Load a dataset config file: JSON always; YAML when the yaml
        package is importable (the reference's configs are YAML — JSON
        is the dependency-free interchange form)."""
        with open(path) as fh:
            text = fh.read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            try:
                import yaml  # type: ignore[import-not-found]
            except ImportError as exc:
                raise ValueError(
                    f"{path} is not JSON and pyyaml is unavailable"
                ) from exc
            data = yaml.safe_load(text)
        return cls.from_dict(data)


@dataclass
class RunResult:
    dataset: str
    version: str
    entity_count: int
    statement_count: int
    target_count: int
    schema_counts: dict[str, int]
    delta_ops: dict[str, int]
    dangling_count: int
    violations: list[str]
    export_counts: dict[str, int]


def dangling_references(entities: DataFrame) -> DataFrame:
    """Referenced entity ids that are not present in the view (J10)."""
    props = list(ENTITY_PROPS)
    refs = entities.select(
        F.explode(
            F.flatten(F.array(*[prop_values(F.col("properties"), p) for p in props]))
        ).alias("ref")
    ).distinct()
    return refs.join(
        entities.select(F.col("canonical_id").alias("ref")), "ref", "left_anti"
    )


def _extended_stats(
    entities: DataFrame, assertions: list[Assertion]
) -> dict[str, float]:
    """Extra assertion metrics, computed ONLY when some assertion needs
    them (the base GROUPING SETS pass covers entity/target/schema):

    - ``country:<code>`` / ``countries``: one explode + groupBy over the
      country property — output bounded by the country vocabulary,
    - ``prop:<S>.<p>`` / ``fill:<S>.<p>``: per-schema filled-counts for
      every asserted (schema, property) pair in ONE aggregation — one
      flag column per pair, output bounded by the schemata.

    Both are single-pass aggregations over the already-persisted entity
    view, mirroring the reference's Statistics observer
    (``zavod/zavod/validators/assertions.py`` stats shapes)."""
    out: dict[str, float] = {}
    need_country = any(
        a.metric == "countries" or a.metric.startswith("country:")
        for a in assertions
    )
    pairs = sorted(
        {
            a.metric.split(":", 1)[1]
            for a in assertions
            if a.metric.startswith(("prop:", "fill:"))
        }
    )
    if need_country:
        # The reference counts entity.countries — the DISTINCT values of
        # every country-typed prop (country, jurisdiction, mainCountry,
        # nationality, citizenship) — and only over Thing-subtree
        # entities (``zavod/zavod/exporters/statistics.py:106-110``:
        # ``if entity.schema.is_a("Thing"): for country in
        # entity.countries``). A dataset whose country signal lives in
        # nationality must not undercount and abort the run. Same
        # column expression as the statistics exporters, by import.
        from opensanctions_spark.exporters import entity_countries
        from opensanctions_spark.exporters.metadata import THING_SCHEMATA

        rows = (
            entities.filter(F.col("schema").isin(*THING_SCHEMATA))
            .select(F.explode(entity_countries(F.col("properties"))).alias("c"))
            .groupBy("c")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        out["countries"] = len(rows)
        for r in rows:
            out[f"country:{r['c']}"] = r["n"]
    if pairs:
        flags = [
            (
                F.size(
                    F.coalesce(
                        F.col("properties")[p.split(".", 1)[1]], F.array()
                    )
                )
                > 0
            )
            .cast("long")
            .alias(f"_f{i}")
            for i, p in enumerate(pairs)
        ]
        rows = (
            entities.select("schema", *flags)
            .groupBy("schema")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(f"_f{i}").alias(f"_s{i}") for i in range(len(pairs))],
            )
            .collect()
        )
        by_schema = {r["schema"]: r for r in rows}
        for i, p in enumerate(pairs):
            schema = p.split(".", 1)[0]
            row = by_schema.get(schema)
            filled = row[f"_s{i}"] if row is not None else 0
            total = row["_n"] if row is not None else 0
            out[f"prop:{p}"] = filled
            out[f"fill:{p}"] = (filled / total) if total else 0.0
    return out


def check_assertions(stats: dict[str, float], assertions: list[Assertion]) -> list[str]:
    """Threshold checks over aggregate stats; returns violation messages.
    ``min`` failures are fatal in the reference (the caller raises).
    ``fill:`` assertions skip schemata the dataset does not emit — the
    reference's emitted-schemata guard (``validators/assertions.py:
    129-140``): a fill-rate rule on an absent schema must not fail as
    0.0."""
    out = []
    for a in assertions:
        if a.metric.startswith("fill:"):
            schema = a.metric[5:].split(".", 1)[0]
            if not stats.get(f"schema:{schema}"):
                continue
        actual = stats.get(a.metric, 0)
        if a.op == "min" and actual < a.threshold:
            out.append(f"{a.level}: {a.metric}={actual} < min {a.threshold}")
        elif a.op == "max" and actual > a.threshold:
            out.append(f"{a.level}: {a.metric}={actual} > max {a.threshold}")
    return out


def run_dataset(
    spark: SparkSession,
    statements: DataFrame,
    config: DatasetConfig,
    archive: StatementArchive,
    out_dir: str,
    run_time: str,
    version: str | None = None,
    canonical_map: DataFrame | None = None,
    single_file: bool = True,
) -> RunResult:
    """Execute the full pipeline for one dataset run.

    ``canonical_map`` is the resolver's (entity_id, canonical_id)
    snapshot; when given, statements are rekeyed through it (J2,
    broadcast) before assembly — the reference applies its linker the
    same way, at store-read time (``zavod/zavod/store.py:36-47``), so
    merged entities collapse into one canonical group in A1."""
    # 1. first_seen propagation from the previous version (J1); both seen-
    # timestamps are stamped at emit time like the reference's context.emit.
    # "previous" = last SUCCESSFUL run — a version written by a run that
    # later failed validation must not feed timestamps or deltas.
    prev_version = archive.last_successful(config.name)
    # external=True: the first_seen index must cover external statements
    # too (see crawl_dataset — an internal-only read resets external
    # rows' first_seen every run)
    prev = archive.read(config.name, external=True) if prev_version else None
    # 0. datapatch cleaning: the dataset's prop.* lookup tables rewrite
    # values before anything downstream sees them (the reference cleans at
    # emit time — zavod/zavod/runtime/lookups.py:52-83); map-only stage
    if config.lookups:
        from opensanctions_spark.functions.lookups import apply_statement_lookups

        statements = apply_statement_lookups(statements, config.lookups)
    statements = statements.drop("first_seen").withColumn(
        "last_seen", F.lit(run_time)
    )

    # 1b. resolver rekey (J2) BEFORE the versioned write. The reference's
    # linker applies to every store access (zavod/zavod/store.py:36-47);
    # rekeying the incoming statements up front means the stored version
    # is already canonical, so (a) the bucketed layout clusters on the
    # FINAL canonical_id and the assembly/delta ride it exchange-free,
    # and (b) no read-time rekey is needed for the current version. The
    # previous version is normalized to the CURRENT map too — unless the
    # manifest proves it was written under the identical map (the
    # fingerprint fast path), in which case its stored canonical ids and
    # bucket clustering are consumed as-is. The round-11 rehearsal bug
    # (prev diffed raw → spurious DEL per merged id) stays fixed: prev
    # is always map-consistent with the current side here.
    map_fp = None
    resolver_dropped = False
    if canonical_map is not None:
        from opensanctions_spark.operators.resolve import (
            apply_canonical,
            mapping_fingerprint,
        )

        map_fp = mapping_fingerprint(canonical_map)
        statements = apply_canonical(statements, canonical_map)
        if prev is not None and (
            archive.canonical_fp(config.name, prev_version) != map_fp
        ):
            prev = apply_canonical(prev, canonical_map)
    elif prev is not None and (
        archive.canonical_fp(config.name, prev_version) is not None
    ):
        # the previous version stores resolver-merged canonical ids but
        # this run has no map: J1 (id-keyed) is unaffected, but the
        # delta below will diff merged ids against raw ones — surface it
        resolver_dropped = True

    if prev is not None:
        # with a resolver map both sides are canonical-consistent, so the
        # J1 probe keys on (canonical_id, id) rows — the prev
        # side rides the bucketed clustering with zero exchange and the
        # current side pays the single canonical_id exchange the write
        # and assembly want anyway. Mapless runs keep the id-keyed join
        # (caller-set canonical ids need not match across versions).
        statements = propagate_first_seen(
            statements,
            prev.select("canonical_id", "id", "first_seen"),
            run_time=run_time,
            cluster_col="canonical_id" if canonical_map is not None else None,
        )
    else:
        statements = statements.withColumn("first_seen", F.lit(run_time))
    # 2. versioned write, then read back (single lineage for all consumers).
    # Written PENDING (success=False): the version is recorded and
    # debuggable, but the backfill pointer only advances once the whole
    # run — validation included — completes (mark_successful below), so a
    # fatal-assertion abort can never poison the next run's backfill.
    version = archive.write(
        statements, config.name, version, success=False, canonical_fp=map_fp
    )
    statements = archive.read(config.name, version=version, external=True)

    # 3. assembly — one shuffle, persisted for validators + exporters.
    # With bucketed statement storage the scan is already clustered on
    # canonical_id (the rekey happened before the write, so the stored
    # clustering IS the final one) and the assembly runs exchange-free.
    pre_clustered = archive.is_bucketed(config.name, version)
    entities = assemble_entities(statements, pre_clustered=pre_clustered).persist()

    # 4. validation — ONE job: per-schema counts and the entity/target
    # totals come out of a single GROUPING SETS pass over the cached
    # entity view (the reference's validators share one scan the same way,
    # zavod/zavod/validators/__init__.py:72-104)
    from opensanctions_spark.exporters import target_flag

    stat_rows = (
        entities.select(
            "schema",
            target_flag(F.col("properties")).cast("long").alias("is_target"),
        )
        .groupingSets([["schema"], []], "schema")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_target").alias("n_target"),
            F.grouping("schema").alias("g"),
        )
        .collect()
    )
    schema_counts = {r["schema"]: r["n"] for r in stat_rows if r["g"] == 0}
    total_row = next(r for r in stat_rows if r["g"] == 1)
    entity_count = total_row["n"]
    target_count = total_row["n_target"] or 0
    stats: dict[str, float] = {
        "entity_count": entity_count,
        "target_count": target_count,
        **{f"schema:{k}": v for k, v in schema_counts.items()},
    }
    stats.update(_extended_stats(entities, config.assertions))
    violations = check_assertions(stats, config.assertions)
    if any(v.startswith("error") for v in violations):
        entities.unpersist()
        raise AssertionError("; ".join(violations))
    dangling = dangling_references(entities).count()

    # issues.json + by-level counts for the index (the reference's
    # DatasetIssues artifact: validation findings become issue records)
    from opensanctions_spark.exporters.metadata import write_issues

    issues = [
        {
            "level": v.split(":", 1)[0],
            "message": v.split(": ", 1)[-1],
            "dataset": config.name,
        }
        for v in violations
    ]
    if not config.has_user_assertions:
        # the reference's maintainer nudge: error-LEVEL log, but never
        # an abort (validators/assertions.py:166-177 sets no abort flag
        # for it) — so it rides the issues channel, not the violations
        issues.append(
            {
                "level": "error",
                "message": "Dataset has no assertions.",
                "dataset": config.name,
            }
        )
    if dangling:
        issues.append(
            {
                "level": "warning",
                "message": f"{dangling} dangling entity references",
                "dataset": config.name,
            }
        )
    if resolver_dropped:
        issues.append(
            {
                "level": "warning",
                "message": (
                    "previous version was written under a resolver map but "
                    "this run has none: the delta may report merged ids as "
                    "ADD/DEL pairs"
                ),
                "dataset": config.name,
            }
        )
    os.makedirs(out_dir, exist_ok=True)
    issue_levels = write_issues(out_dir, issues)

    # 5. exports (shared scan; single_file=False is the cluster path —
    # range-ordered multi-part sink files, see exporters.export_all)
    export_counts = export_all(
        entities, statements, out_dir, dataset=config.name,
        single_file=single_file, clustered=pre_clustered,
        version=str(version), run_time=run_time,
        issue_levels=issue_levels, dataset_meta=config.metadata,
    )

    # 6. delta vs previous version (D0/D1)
    if prev is not None:
        diff = version_diff(hashed_entities(prev), hashed_entities(statements))
        delta_ops = {
            r["op"]: r["n"]
            for r in diff.groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        # reference line format: {"op": ..., "entity": {...}} per row
        # (zavod/zavod/exporters/delta.py:29-38)
        from opensanctions_spark.operators.delta import delta_export_rows

        delta_out = delta_export_rows(diff, entities).orderBy("canonical_id")
        if single_file:
            delta_out = delta_out.coalesce(1)
        delta_out.select("line").write.mode("overwrite").text(
            os.path.join(out_dir, "delta.json")
        )
    else:
        delta_ops = {}

    result = RunResult(
        dataset=config.name,
        version=version,
        entity_count=entity_count,
        statement_count=export_counts.get("statements.csv", 0),
        target_count=target_count,
        schema_counts=schema_counts,
        delta_ops=delta_ops,
        dangling_count=dangling,
        violations=violations,
        export_counts=export_counts,
    )
    with open(os.path.join(out_dir, "run.json"), "w") as fh:
        json.dump(
            {k: v for k, v in result.__dict__.items()}, fh, indent=2, sort_keys=True
        )
    # the run completed (exports + validation): promote the version so
    # backfill reads resolve it
    archive.mark_successful(config.name, version)
    entities.unpersist()
    return result


def crawl_dataset(
    spark: SparkSession,
    statements: DataFrame,
    name: str,
    archive: StatementArchive,
    run_time: str,
    version: str | None = None,
    lookups: dict | None = None,
) -> str:
    """The standalone crawl stage (``zavod crawl``,
    ``zavod/zavod/cli/etl.py:24-36``): stamp seen timestamps, propagate
    first_seen from the previous version (J1), write ONE immutable
    archive version. Returns the version id — validation/export read it
    back, so re-running either never re-crawls. ``lookups`` applies the
    dataset's datapatch cleaning pass first, like the fused run."""
    if lookups:
        from opensanctions_spark.functions.lookups import apply_statement_lookups

        statements = apply_statement_lookups(statements, lookups)
    prev_version = archive.latest(name)
    # the first_seen index must cover EXTERNAL statements too: an
    # analyzer/enricher re-run would otherwise reset first_seen on every
    # external row each night (the internal-only read would drop their
    # ids from the index and propagate_first_seen would coalesce to the
    # new run_time)
    prev = archive.read(name, external=True) if prev_version else None
    statements = statements.drop("first_seen").withColumn(
        "last_seen", F.lit(run_time)
    )
    if prev is not None:
        statements = propagate_first_seen(
            statements, prev.select("id", "first_seen"), run_time=run_time
        )
    else:
        statements = statements.withColumn("first_seen", F.lit(run_time))
    return archive.write(statements, name, version)


def _delta_artifact_nonempty(path: str) -> bool:
    """True when a delta.json artifact exists and carries data — the
    reference checks object presence AND size > 0 before listing a version
    in the delta index (``zavod/zavod/exporters/metadata/__init__.py:
    210-229``). Spark text sinks are directories of part files; a plain
    file (post-publish single_file copy) also counts."""
    if os.path.isfile(path):
        return os.path.getsize(path) > 0
    if os.path.isdir(path):
        return any(
            n.startswith("part-") and os.path.getsize(os.path.join(path, n)) > 0
            for n in os.listdir(path)
        )
    return False


def _entity_stats(entities: DataFrame) -> tuple[int, int, dict[str, int]]:
    """(entity_count, target_count, schema_counts) in ONE GROUPING SETS
    pass over the entity view — the shared validator scan."""
    from opensanctions_spark.exporters import target_flag

    stat_rows = (
        entities.select(
            "schema",
            target_flag(F.col("properties")).cast("long").alias("is_target"),
        )
        .groupingSets([["schema"], []], "schema")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_target").alias("n_target"),
            F.grouping("schema").alias("g"),
        )
        .collect()
    )
    schema_counts = {r["schema"]: r["n"] for r in stat_rows if r["g"] == 0}
    total = next(r for r in stat_rows if r["g"] == 1)
    return total["n"], total["n_target"] or 0, schema_counts


def validate_dataset(
    spark: SparkSession,
    archive: StatementArchive,
    name: str,
    assertions: list[Assertion] | None = None,
    version: str | None = None,
    canonical_map: DataFrame | None = None,
) -> dict:
    """The standalone validate stage (``zavod validate``,
    ``zavod/zavod/cli/etl.py:38-55``): rebuild the entity view from the
    archived statements and run the shared-scan validators + assertion
    checks WITHOUT exporting. Returns the validation manifest."""
    version = version or archive.last_successful(name)
    statements = archive.read(name, version=version, external=True)
    if canonical_map is not None:
        from opensanctions_spark.operators.resolve import apply_canonical

        statements = apply_canonical(statements, canonical_map)
    pre_clustered = (
        canonical_map is None
        and version is not None
        and archive.is_bucketed(name, version)
    )
    entities = assemble_entities(statements, pre_clustered=pre_clustered).persist()
    entity_count, target_count, schema_counts = _entity_stats(entities)
    stats = {
        "entity_count": entity_count,
        "target_count": target_count,
        **{f"schema:{k}": v for k, v in schema_counts.items()},
    }
    stats.update(_extended_stats(entities, assertions or []))
    violations = check_assertions(stats, assertions or [])
    dangling = dangling_references(entities).count()
    entities.unpersist()
    return {
        "dataset": name,
        "version": version or archive.latest(name),
        "entity_count": entity_count,
        "target_count": target_count,
        "schema_counts": schema_counts,
        "dangling_count": dangling,
        "violations": violations,
    }


def export_dataset(
    spark: SparkSession,
    archive: StatementArchive,
    name: str,
    out_dir: str,
    run_time: str,
    version: str | None = None,
    canonical_map: DataFrame | None = None,
    single_file: bool = True,
    dataset_meta: dict | None = None,
) -> dict:
    """The standalone export stage (``zavod export``,
    ``zavod/zavod/cli/etl.py:57-73``): rebuild the entity view from one
    archived version, run every sink + the K12 metadata set, and write
    the ADD/MOD/DEL delta against the previous SUCCESSFUL version.

    ``version=None`` exports the newest RECORDED version — deliberately
    the working-directory semantics of ``zavod export`` (crawl → export
    runs before promotion, so the version being exported is typically
    still pending); published-only reads go through ``archive.read`` /
    ``--as-of``."""
    import os

    version = version or archive.latest(name)
    if version is None:
        raise ValueError(f"no archived versions for dataset {name!r}")
    statements = archive.read(name, version=version, external=True)
    # bucketed archive reads feed a clustering-free assembly; a resolver
    # rekey invalidates it UNLESS the manifest fingerprint proves the
    # version was already written under this exact map (§21c fast path)
    pre_clustered = archive.is_bucketed(name, version)
    if canonical_map is not None:
        from opensanctions_spark.operators.resolve import (
            apply_canonical,
            mapping_fingerprint,
        )

        if archive.canonical_fp(name, version) != mapping_fingerprint(
            canonical_map
        ):
            statements = apply_canonical(statements, canonical_map)
            pre_clustered = False
    entities = assemble_entities(statements, pre_clustered=pre_clustered).persist()
    export_counts = export_all(
        entities, statements, out_dir, dataset=name,
        single_file=single_file, clustered=pre_clustered,
        version=str(version), run_time=run_time,
        dataset_meta=dataset_meta,
    )
    # delta baseline = the newest SUCCESSFUL version strictly before the
    # exported one (a failed run's statements must never anchor the
    # published ADD/MOD/DEL), restricted to versions whose files are
    # guaranteed on disk (retention window + the gc-protected pointer)
    readable = set(archive.versions(name))
    last_ok = archive.last_successful(name)
    if last_ok is not None:
        readable.add(last_ok)
    priors = [
        v for v in archive.successful_versions(name)
        if v < version and v in readable
    ]
    prior = priors[-1] if priors else None
    delta_ops: dict[str, int] = {}
    if prior is not None:
        prev_stmts = archive.read(name, version=prior, external=True)
        # the linker applies to EVERY store read (store.py:36-47) — the
        # delta's prior side included, same fix as run_dataset (r11)
        if canonical_map is not None:
            from opensanctions_spark.operators.resolve import apply_canonical

            prev_stmts = apply_canonical(prev_stmts, canonical_map)
        diff = version_diff(
            hashed_entities(prev_stmts), hashed_entities(statements)
        )
        delta_ops = {
            r["op"]: r["n"]
            for r in diff.groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        from opensanctions_spark.operators.delta import delta_export_rows

        delta_out = delta_export_rows(diff, entities).orderBy("canonical_id")
        if single_file:
            delta_out = delta_out.coalesce(1)
        delta_out.select("line").write.mode("overwrite").text(
            os.path.join(out_dir, "delta.json")
        )
        # K8/K12: the delta-versions index. The reference
        # (``zavod/zavod/exporters/metadata/__init__.py:200-256``,
        # include_latest=True) lists the just-exported version FIRST —
        # its delta.json ships alongside the index even though the
        # version is still pending promotion — and then only prior
        # versions whose delta artifact actually exists and is
        # non-empty, so the index never points at missing files.
        from opensanctions_spark.exporters.metadata import write_delta_index

        indexable = [
            v for v in archive.successful_versions(name)
            if v != version
            and _delta_artifact_nonempty(
                os.path.join(
                    os.path.dirname(archive.version_path(name, v)),
                    "delta.json",
                )
            )
        ]
        if _delta_artifact_nonempty(os.path.join(out_dir, "delta.json")):
            indexable.append(version)
        write_delta_index(out_dir, name, indexable)
    entities.unpersist()
    return {
        "dataset": name,
        "version": version,
        "export_counts": export_counts,
        "delta_ops": delta_ops,
    }
