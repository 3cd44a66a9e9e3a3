"""Streaming statement ingest: the batch emit pipeline driven by a stream.

The reference is batch-per-run (SURVEY §2.9); this bridge lets statements
arrive continuously (file drops, Kafka, CDC) while REUSING the batch
operators unchanged: every micro-batch runs the same timestamp-propagation
join (J1) against the archive's previous version and appends a new
version, so downstream consumers (assembly, exporters, deltas) see the
identical versioned-parquet contract whether statements arrived in one
run or a thousand micro-batches.

``foreachBatch`` is the right tool here — the sink is a versioned archive
write (not an idempotent streaming sink), and the J1 join needs the
*latest completed* version as its right side, which changes between
micro-batches (a stream-static join would pin one snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from opensanctions_spark.operators.timestamps import propagate_first_seen
from opensanctions_spark.sources.archive import StatementArchive


def ingest_statement_stream(
    stream: DataFrame,
    archive: StatementArchive,
    dataset: str,
    run_time: str,
    checkpoint_dir: str,
) -> "object":
    """Start the ingest query: micro-batch → J1 vs latest version →
    archive append as a fresh version. Returns the StreamingQuery."""
    spark = stream.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        latest = archive.latest(dataset)
        if latest is not None:
            # external=True: the first_seen index covers external rows
            # (see plans/run.py crawl_dataset)
            prev = archive.read(dataset, version=latest, external=True)
            batch = propagate_first_seen(batch, prev, run_time)
        archive.write(batch, dataset)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
