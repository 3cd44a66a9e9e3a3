"""Change detection (SURVEY D4, ``zavod/zavod/helpers/change.py:14-129``).

The reference guards crawlers with hash assertions: a source artifact
(URL body, file, or a DOM subtree) is hashed and compared against the
hash recorded when the parser was last reviewed — a mismatch means the
source changed shape and the crawl should warn or abort before emitting
garbage.

Spark rendering: the artifacts are ROWS (the cached-fetch table S8
already lands bodies in a column), so the check is a column-side hash +
compare over the whole fleet of sources in one map-only pass — no
driver loop over URLs. ``raise_on_change`` mirrors the reference's
``raise_exc`` flag: collect is bounded by the (small) assertion table,
never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash(content: Column) -> Column:
    """md5 content hash of a string/binary column (the reference uses
    sha1; md5 keeps DuckDB-oracle parity across the engine)."""
    return F.md5(content)


def dom_subtree_text_hash(html: Column, tag: str) -> Column:
    """Hash of the FIRST <tag> subtree's text content — the
    ``text_only=True`` DOM variant (``change.py:68-129``): layout/attr
    churn doesn't trip it, text changes do. NULL when the tag is absent.

    Column-side: extract the first element, strip markup, squash
    whitespace, hash — all JVM regex, no parser round-trip."""
    subtree = F.regexp_extract(
        html, rf"(?is)(<{tag}[\s>].*?</{tag}>|<{tag}>.*?</{tag}>)", 1
    )
    text = F.trim(
        F.regexp_replace(F.regexp_replace(subtree, r"(?s)<[^>]*>", " "), r"\s+", " ")
    )
    return F.when(subtree == "", F.lit(None).cast("string")).otherwise(
        F.md5(text)
    )


def check_hashes(
    artifacts: DataFrame,
    content_col: str = "content",
    expected_col: str = "expected_hash",
    id_col: str = "artifact_id",
    raise_on_change: bool = False,
) -> DataFrame:
    """(id, expected, actual, changed) for every artifact row.

    ``changed`` is true when the hashes differ OR the expectation is
    missing (a new artifact is a change by definition, matching the
    reference's warn-by-default posture). With ``raise_on_change`` the
    changed set is collected (bounded by the assertion table) and raised
    as one AssertionError listing the offenders — the ``raise_exc``
    path."""
    out = artifacts.select(
        F.col(id_col).alias("artifact_id"),
        F.col(expected_col).alias("expected_hash"),
        content_hash(F.col(content_col)).alias("actual_hash"),
    ).withColumn(
        "changed",
        F.col("expected_hash").isNull()
        | (F.col("expected_hash") != F.col("actual_hash")),
    )
    if raise_on_change:
        bad = out.filter(F.col("changed")).select("artifact_id").collect()
        if bad:
            ids = sorted(r["artifact_id"] for r in bad)
            raise AssertionError(f"source artifacts changed: {ids[:20]}")
    return out
