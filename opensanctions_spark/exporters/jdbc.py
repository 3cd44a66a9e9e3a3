"""SQL load sink (SURVEY §2.2 K11, ``zavod/zavod/tools/load_db.py:15-41``):
upsert deduplicated statements into an RDBMS via JDBC.

The reference streams statements into Postgres with an upsert per batch.
The Spark form: dropDuplicates on the content-hash id (D3 — the reference
dedupes through the resolver first) then ``df.write.jdbc`` with batch
sizing. No JDBC driver ships in this container, so the write raises until
a driver jar + URL are configured; the dedupe/projection logic is tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from opensanctions_spark.exporters import STATEMENT_CSV_COLUMNS


def prepare_statements_for_db(statements: DataFrame) -> DataFrame:
    """Dedupe on statement id and project the reference's column order."""
    cols = [c for c in STATEMENT_CSV_COLUMNS if c in statements.columns]
    return statements.dropDuplicates(["id"]).select(*cols)


def load_db(statements: DataFrame, url: str, table: str,
            mode: str = "append", batch_size: int = 10000,
            properties: dict[str, str] | None = None) -> None:
    """Write statements to a JDBC table (driver jar required at runtime)."""
    prepared = prepare_statements_for_db(statements)
    props = {"batchsize": str(batch_size), **(properties or {})}
    prepared.write.jdbc(url=url, table=table, mode=mode, properties=props)
