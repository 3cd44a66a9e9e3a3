"""Article / Documentation entity factories (SURVEY §2 entity-factory
family, ``zavod/zavod/helpers/articles.py:6-67``).

The reference creates one Article entity per source URL (id = content
hash of ("Article", url, key_extra)) and one Documentation edge per
(entity, article) pair carrying the publication date. The Spark
rendering is a statement-producing projection: a frame of mention rows
fans out into the canonical statements IR in one map-only pass —
``finish_statements`` stamps provenance exactly like every other melt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.model.melt import finish_statements


def make_article_id(url: Column, key_extra: Column | None = None) -> Column:
    """Deterministic Article entity id (reference ``context.make_id``
    over ("Article", url, key_extra) — md5 here for oracle parity)."""
    parts = [F.lit("Article"), url]
    if key_extra is not None:
        parts.append(F.coalesce(key_extra, F.lit("")))
    return F.concat(F.lit("article-"), F.md5(F.concat_ws("|", *parts)))


def make_documentation_id(entity_id: Column, article_id: Column) -> Column:
    """Deterministic Documentation edge id for one (entity, article)
    pair (``articles.py:58-63``)."""
    return F.concat(
        F.lit("documentation-"),
        F.md5(F.concat_ws("|", F.lit("Documentation"), entity_id, article_id)),
    )


def article_statements(
    mentions: DataFrame,
    dataset: str,
    url_col: str = "url",
    entity_col: str = "entity_id",
    title_col: str | None = "title",
    published_col: str | None = "published_at",
) -> DataFrame:
    """mentions(entity_id, url[, title, published_at]) → statements for
    the Article entities AND the Documentation edges linking each
    mentioned entity to its article — the declarative
    ``make_article`` + ``make_documentation`` pair.

    Duplicate mentions of one URL collapse into ONE Article (the
    statement id is a content hash, so identical statements dedupe in
    D3); each (entity, url) pair gets its own Documentation edge, the
    reference's explicit contract."""
    url = F.col(url_col)
    aid = make_article_id(url)
    art_rows = mentions.select(
        aid.alias("entity_id"),
        F.explode(
            F.array(
                F.struct(F.lit("sourceUrl").alias("prop"), url.alias("value")),
                F.struct(
                    F.lit("title").alias("prop"),
                    (F.col(title_col) if title_col else F.lit(None).cast("string")).alias("value"),
                ),
                F.struct(
                    F.lit("publishedAt").alias("prop"),
                    (F.col(published_col) if published_col else F.lit(None).cast("string")).alias("value"),
                ),
            )
        ).alias("pv"),
    ).select("entity_id", "pv.prop", "pv.value")
    articles = finish_statements(art_rows, dataset=dataset, schema_name="Article")

    did = make_documentation_id(F.col(entity_col), aid)
    doc_rows = mentions.select(
        did.alias("entity_id"),
        F.explode(
            F.array(
                F.struct(F.lit("entity").alias("prop"), F.col(entity_col).alias("value")),
                F.struct(F.lit("document").alias("prop"), aid.alias("value")),
                F.struct(
                    F.lit("date").alias("prop"),
                    (F.col(published_col) if published_col else F.lit(None).cast("string")).alias("value"),
                ),
            )
        ).alias("pv"),
    ).select("entity_id", "pv.prop", "pv.value")
    docs = finish_statements(doc_rows, dataset=dataset, schema_name="Documentation")
    return articles.unionByName(docs).dropDuplicates(["id"])
