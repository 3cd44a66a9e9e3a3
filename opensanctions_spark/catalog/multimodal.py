"""Multimodal catalog queries: the binary-column plumbing oracle-checked.

The documents table's ASCII text doubles as a deterministic media payload
(one byte per char), so DuckDB can state the expected byte statistics and
frame digests in plain SQL while Spark runs the real mapInPandas path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
