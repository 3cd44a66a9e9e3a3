"""Wikidata QID dereferencing (``zavod/zavod/helpers/wikidata.py:8-46``).

The reference checks one QID at a time against the Wikidata API (with
the S8-style fetch cache) and follows merge redirects. The Spark
rendering works on COLUMNS: QID validation is a regex, and redirect
resolution is one broadcast-friendly join against a redirects table —
the cached API responses landed as rows, exactly the S11/S8 discipline
(network fetch stays a driver-side injected callable; the engine only
ever sees the cache table).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rigour.ids.wikidata.is_qid equivalent
_QID_RE = r"^Q[1-9]\d*$"


def is_qid(col: Column) -> Column:
    return col.rlike(_QID_RE)


def deref_qids(
    df: DataFrame,
    qid_col: str,
    redirects: DataFrame,
    fetch_fn: Callable[[str], str | None] | None = None,
) -> DataFrame:
    """Resolve merge-redirected QIDs: invalid QIDs → NULL, redirected →
    the target, everything else unchanged (the reference's fallthrough).

    ``redirects`` is (qid, target) — the cached API state. When
    ``fetch_fn`` is given, cache misses are fetched driver-side
    (deduplicated, bounded by the DISTINCT unresolved QID set) and
    unioned into the mapping before the join — one call per unknown QID
    per run, like the reference's cache_days discipline."""
    spark = df.sparkSession
    valid = F.when(is_qid(F.col(qid_col)), F.col(qid_col))
    keyed = df.withColumn("_qid", valid)

    mapping = redirects.select(
        F.col("qid").alias("_qid"), F.col("target").alias("_target")
    ).dropDuplicates(["_qid"])

    if fetch_fn is not None:
        misses = [
            r["_qid"]
            for r in keyed.select("_qid")
            .filter(F.col("_qid").isNotNull())
            .distinct()
            .join(mapping, "_qid", "left_anti")
            .collect()
        ]
        if misses:
            fetched = [(q, fetch_fn(q)) for q in sorted(misses)]
            fresh = spark.createDataFrame(
                fetched, "_qid STRING, _target STRING"
            ).filter(F.col("_target").isNotNull())
            mapping = mapping.unionByName(fresh)

    # no forced broadcast: AQE broadcasts while the redirect table fits
    # and falls back to a shuffle join beyond that (the TF-IDF lesson)
    out = keyed.join(mapping, "_qid", "left")
    return out.withColumn(
        qid_col, F.coalesce(F.col("_target"), F.col("_qid"))
    ).drop("_qid", "_target")
