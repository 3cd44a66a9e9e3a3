"""The Statement — the engine's universal IR.

One row = one (entity, property, value) assertion with full provenance,
mirroring the reference's atomic record (construction at
``zavod/zavod/entity.py:75-87``, emit-time stamps at
``zavod/zavod/context.py:646-666``). The reference appends these rows to a
per-run ``statements.pack`` file; this engine stores them as a Parquet
DataFrame partitioned by ``dataset`` so collection scans
(``zavod/zavod/archive/__init__.py:299-303``) become partition pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # content hash (md5 here)
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), True),
        T.StructField("prop", T.StringType(), False),
        T.StructField("schema", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("dataset", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("original_value", T.StringType(), True),
        T.StructField("external", T.BooleanType(), False),
        T.StructField("first_seen", T.StringType(), True),  # ISO timestamp
        T.StructField("last_seen", T.StringType(), True),
    ]
)

STATEMENT_COLUMNS = [f.name for f in STATEMENT_SCHEMA.fields]
