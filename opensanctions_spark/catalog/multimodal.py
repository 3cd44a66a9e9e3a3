"""Multimodal catalog queries: the binary-column plumbing oracle-checked.

The documents table's ASCII text doubles as a deterministic media payload
(one byte per char), so DuckDB can state the expected byte statistics and
frame digests in plain SQL while Spark runs the real mapInPandas path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register
from opensanctions_spark.multimodal import (
    extract_byte_features,
    pack_media,
    sample_frames,
)


@register(
    "mm_byte_features",
    oracle="""
WITH chars AS (
  SELECT doc_id, ascii(unnest(string_split(text, ''))) AS b
  FROM documents
),
counts AS (
  SELECT doc_id, b, COUNT(*) AS c FROM chars GROUP BY doc_id, b
),
modal AS (
  SELECT doc_id, b AS modal_byte,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS rn
  FROM counts
)
SELECT d.doc_id AS media_id,
       CAST(len(d.text) AS BIGINT) AS n_bytes,
       (SELECT COUNT(*) FROM counts c WHERE c.doc_id = d.doc_id) AS n_distinct,
       m.modal_byte
FROM documents d JOIN modal m ON m.doc_id = d.doc_id AND m.rn = 1
""",
)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched binary feature extraction (mapInPandas + numpy
    bincount): payload size, distinct bytes, modal byte. The oracle
    recomputes the histogram character-wise in SQL — valid because the
    payload is the ASCII text."""
    docs = load(spark, sf_dir, "documents")
    media = pack_media(docs, id_col="doc_id", payload_col="text")
    return extract_byte_features(media)


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       md5(substr(text, i * 16 + 1, 16)) AS frame_md5
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
              CAST(ceil(len(text) / 16.0) AS INT) - 1, 4)) AS i) g
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: 16-byte frames, every 4th
    kept, content-digested — the keyframe-extraction plumbing with an
    exact SQL oracle via substring digests."""
    docs = load(spark, sf_dir, "documents")
    media = pack_media(docs, id_col="doc_id", payload_col="text", kind="raw")
    return sample_frames(media, every=4, frame_bytes=16)


@register(
    "mm_resize",
    oracle="""
SELECT doc_id AS media_id,
       CAST(64 AS BIGINT) AS out_bytes,
       md5(substr(text, 1, 64) ||
           repeat(chr(0), GREATEST(0, 64 - len(text)))) AS digest
FROM documents
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over the decoded buffer: truncate/zero-pad every
    payload to a fixed 64-byte frame (the deterministic stand-in for
    pixel-grid interpolation — the container ships no image libs), then
    digest the padded buffer. Exercises the fixed-size-binary Arrow
    batch shape downstream featurizers depend on; the oracle replays
    truncation + NUL padding character-wise."""
    from opensanctions_spark.multimodal import resize_buffer

    docs = load(spark, sf_dir, "documents")
    media = pack_media(docs, id_col="doc_id", payload_col="text")
    decoded = media.select(
        "media_id", F.col("content").alias("buf")
    )
    resized = resize_buffer(decoded, target_bytes=64)
    return resized.select(
        "media_id",
        F.length(F.col("buf")).cast("long").alias("out_bytes"),
        F.md5(F.col("buf")).alias("digest"),
    )
