"""Structured Streaming parity tests: the same transformation run from
the batch reader and from readStream (availableNow) must agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.catalog import load_events
from opensanctions_spark.streaming import (
    dedupe_stream,
    latest_stateful_totals,
    run_available_now,
    running_user_totals,
    sessionized_activity,
    stream_events,
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
