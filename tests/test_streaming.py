"""Structured Streaming parity tests: the same transformation run from
the batch reader and from readStream (availableNow) must agree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load_events
from opensanctions_spark.streaming import (
    dedupe_stream,
    latest_stateful_totals,
    run_available_now,
    running_user_totals,
    sessionized_activity,
    stream_events,
    view_click_interval_join,
    windowed_event_counts,
)


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    batch = windowed_event_counts(load_events(spark, sf_dir))
    stream = windowed_event_counts(stream_events(spark, sf_dir))
    assert stream.isStreaming
    got = run_available_now(stream, "t_windowed")
    cols = ["window_start_us", "event_type", "n", "total"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_session_windows_stream_equals_batch(spark, sf_dir):
    batch = sessionized_activity(load_events(spark, sf_dir))
    stream = sessionized_activity(stream_events(spark, sf_dir))
    got = run_available_now(stream, "t_sessions")
    cols = ["user_id", "session_start_us", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_stateful_totals_stream_equals_batch(spark, sf_dir):
    """applyInPandasWithState running totals must converge to the batch
    groupBy totals once the update-mode emission log is collapsed."""
    stream = running_user_totals(stream_events(spark, sf_dir))
    assert stream.isStreaming
    got = latest_stateful_totals(
        run_available_now(stream, "t_stateful", output_mode="update")
    )
    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
                "total_value_us"
            ),
        )
    )
    cols = ["user_id", "n_events", "total_value_us"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_dedupe_stream(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    deduped = dedupe_stream(events)
    got = run_available_now(deduped, "t_dedupe", output_mode="append")
    n_ids = load_events(spark, sf_dir).select("event_id").distinct().count()
    assert got.count() == n_ids


def test_streaming_ingest_carries_first_seen(spark, sf_dir, tmp_path):
    """Two micro-batch waves through the streaming ingest bridge: the
    second wave's overlapping statements must keep wave-1 first_seen via
    the same J1 join the batch pipeline uses, and the archive must gain
    one version per wave."""
    from opensanctions_spark.catalog import load
    from opensanctions_spark.model.melt import melt_customers
    from opensanctions_spark.sources.archive import StatementArchive
    from opensanctions_spark.streaming.ingest import ingest_statement_stream

    cust = load(spark, sf_dir, "customer")
    in_dir = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    archive = StatementArchive(spark, str(tmp_path / "archive"))

    wave1 = melt_customers(cust.filter(F.col("c_custkey") < 30)).withColumn(
        "first_seen", F.lit("2026-08-01T00:00:00")
    )
    wave1.write.mode("append").parquet(str(in_dir))
    stream = spark.readStream.schema(wave1.schema).parquet(str(in_dir))
    q = ingest_statement_stream(
        stream, archive, "customers", "2026-08-13T00:00:00", ckpt
    )
    q.awaitTermination()

    # wave 2: overlap (custkey < 30) + new statements (30..59)
    wave2 = melt_customers(cust.filter(F.col("c_custkey") < 60)).withColumn(
        "first_seen", F.lit("2026-08-13T00:00:00")
    )
    wave2.write.mode("append").parquet(str(in_dir))
    stream = spark.readStream.schema(wave1.schema).parquet(str(in_dir))
    q = ingest_statement_stream(
        stream, archive, "customers", "2026-08-13T00:00:00", ckpt
    )
    q.awaitTermination()

    assert len(archive.versions("customers")) == 2
    latest = archive.read("customers")
    seen = dict(
        latest.select("entity_id", "first_seen")
        .filter(F.col("prop") == "name")
        .collect()
    )
    assert seen["c-1"] == "2026-08-01T00:00:00"    # carried over
    assert seen["c-45"] == "2026-08-13T00:00:00"   # new in wave 2


def test_interval_join_stream_equals_batch(spark, sf_dir):
    batch = view_click_interval_join(load_events(spark, sf_dir))
    stream = view_click_interval_join(stream_events(spark, sf_dir))
    assert stream.isStreaming
    got = run_available_now(stream, "t_interval_join", output_mode="append")
    cols = ["view_id", "click_id", "user_id", "view_us", "click_us"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    from opensanctions_spark.streaming import enrich_events_with_segment

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    batch = enrich_events_with_segment(load_events(spark, sf_dir), cust)
    stream = enrich_events_with_segment(stream_events(spark, sf_dir), cust)
    assert stream.isStreaming
    got = run_available_now(stream, "t_static_enrich")
    cols = ["segment", "n_events", "total"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_tws_stateful_totals_stream_equals_batch(spark, sf_dir):
    """transformWithStateInPandas rendering of the running totals must
    match the batch groupBy exactly like the applyInPandasWithState one.
    Skips where protobuf (the TWS state protocol dependency) is absent."""
    pytest.importorskip("google.protobuf.descriptor")
    from opensanctions_spark.catalog import QUERIES

    got = QUERIES["stream_stateful_totals_tws"](spark, sf_dir)
    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
                "total_value_us"
            ),
        )
    )
    cols = ["user_id", "n_events", "total_value_us"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
