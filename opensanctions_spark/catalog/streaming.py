"""Streaming catalog queries (SURVEY §2.9 extension): the windowed /
sessionized transformations oracle-checked in BATCH mode — the exact same
plan objects the streaming surface uses, fed from the batch reader. The
streaming tests (tests/test_streaming.py) separately prove batch/stream
parity via an availableNow run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from opensanctions_spark.catalog import load_events, register
from opensanctions_spark.streaming import (
    latest_stateful_totals,
    run_available_now,
    running_user_totals,
    sessionized_activity,
    stream_events,
    windowed_event_counts,
)
from opensanctions_spark.session import materialize

_MEMSINK_SEQ = [0]


def _events_state_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Input-sized state partitioning for the REAL streaming runs (see
    ``stream_state_partitions``): streaming state cannot be AQE-coalesced,
    so size it by the input bytes up front."""
    import os

    from opensanctions_spark.streaming import stream_state_partitions

    try:
        n_bytes = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        n_bytes = 0
    return stream_state_partitions(spark, n_bytes)


@register(
    "stream_windowed_agg",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(ROUND(value * 1000000) AS DECIMAL(24,0)) / 1000000 AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events
GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
""",
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (watermarked in stream mode): hourly
    counts + exact decimal sums per event type."""
    return windowed_event_counts(load_events(spark, sf_dir))


@register(
    "stream_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user: Spark's session_window
    operator vs the lag/cumulative-sum closed form — identical session
    boundaries by definition (a session extends while consecutive events
    are < gap apart)."""
    return sessionized_activity(load_events(spark, sf_dir))


@register(
    "stream_stateful_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_us
FROM events
GROUP BY user_id
""",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals accumulated in the state store across
    micro-batches. Unlike the windowed queries this one genuinely RUNS
    the streaming engine (availableNow over the events file) and then
    collapses the update-mode emission log to the final state — which
    must equal the batch groupBy the oracle states."""
    _MEMSINK_SEQ[0] += 1
    emitted = run_available_now(
        running_user_totals(stream_events(spark, sf_dir)),
        f"stateful_totals_{_MEMSINK_SEQ[0]}",
        output_mode="update",
        state_partitions=_events_state_partitions(spark, sf_dir),
    )
    return latest_stateful_totals(emitted)


def _tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state protocol
    (``pyspark/sql/streaming/proto``); absent in this container, so the
    TWS rendering registers only where it can actually run."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_stateful_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful-totals operator again through Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor + typed ValueState,
    RocksDB state store) — same oracle as ``stream_stateful_totals``, so
    the old and new arbitrary-state APIs are pinned to the identical
    batch answer on the real streaming engine."""
    from opensanctions_spark.streaming import running_user_totals_tws

    _MEMSINK_SEQ[0] += 1
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        emitted = run_available_now(
            running_user_totals_tws(stream_events(spark, sf_dir)),
            f"stateful_totals_tws_{_MEMSINK_SEQ[0]}",
            output_mode="update",
            state_partitions=_events_state_partitions(spark, sf_dir),
        )
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    return latest_stateful_totals(emitted)


if _tws_available():  # pragma: no cover - protobuf absent in this container
    register(
        "stream_stateful_totals_tws",
        oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_us
FROM events
GROUP BY user_id
""",
    )(stream_stateful_totals_tws)


@register(
    "rollup_time_hierarchy",
    oracle="""
SELECT COALESCE(CAST(epoch_us(time_bucket(INTERVAL 1 DAY, ts)) AS BIGINT), -1)
           AS day_us,
       COALESCE(CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT), -1)
           AS hour_us,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(ROUND(value * 1000000) AS DECIMAL(24,0)) / 1000000 AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events
GROUP BY ROLLUP (time_bucket(INTERVAL 1 DAY, ts),
                 time_bucket(INTERVAL 1 HOUR, ts))
""",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour → day → grand
    total in ONE pass via ROLLUP on the bucketed timestamp hierarchy —
    the multi-resolution downsampling a time-series store materializes
    per level, computed here in a single shuffle with partial aggregation
    covering every level. Exact decimal sums; null rollup levels get a
    -1 sentinel for dtype-stable hashing."""
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("day_b"),
        F.date_trunc("hour", "ts").alias("hour_b"),
        (F.round(F.col("value") * 1000000).cast("decimal(24,0)") / 1000000).cast("decimal(18,6)").alias("v"),
    )
    return (
        ev.rollup("day_b", "hour_b")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").cast("double").alias("total"),
        )
        .select(
            F.coalesce(F.unix_micros("day_b"), F.lit(-1)).alias("day_us"),
            F.coalesce(F.unix_micros("hour_b"), F.lit(-1)).alias("hour_us"),
            "n",
            "total",
        )
    )


@register(
    "stream_interval_join",
    oracle="""
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
       epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (views ⋈ clicks within 10 minutes,
    watermarked both sides in stream mode) — oracle-checked in batch on
    the identical plan; tests/test_streaming.py proves stream parity."""
    from opensanctions_spark.streaming import view_click_interval_join

    return view_click_interval_join(load_events(spark, sf_dir))


@register(
    "stream_static_enrich",
    oracle="""
SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(ROUND(e.value * 1000000) AS DECIMAL(24,0)) / 1000000 AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY COALESCE(c.c_mktsegment, 'UNKNOWN')
""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (event stream ⋈ broadcast customer dimension →
    per-segment totals) — oracle-checked in batch on the identical plan;
    the streaming test proves parity under availableNow."""
    from opensanctions_spark.catalog import load
    from opensanctions_spark.streaming import enrich_events_with_segment

    return enrich_events_with_segment(
        load_events(spark, sf_dir), load(spark, sf_dir, "customer")
    )


def _stream_curate_oracle() -> str:
    """Two-wave recursive-CTE replay of the streaming curation run: wave 1
    (even doc_ids) curated against an empty index, wave 2 (odd) against
    wave 1's fingerprint/band index — first-wave-wins. Built from the
    same SQL fragments as ``pipeline_curate_increment``'s oracle."""
    from opensanctions_spark.catalog.pipeline import (
        _CURATE_BUCKET100,
        _cc_sql,
        _curate_stage_sql,
        _minhash_sql,
    )

    return f"""
WITH RECURSIVE
w1 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
{_curate_stage_sql('1', 'w1').strip()},
exk1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM q1
  ) WHERE rn = 1
),
{_minhash_sql('1', 'exk1').strip()},
{_cc_sql('1', 'mh1').strip()},
keep1 AS (
  SELECT e.doc_id, e.lang, e.source, e.n_tokens, e.fp
  FROM exk1 e LEFT JOIN comp1 c ON e.doc_id = c.node
  WHERE COALESCE(c.component, e.doc_id) = e.doc_id
),
fps AS (SELECT DISTINCT fp FROM keep1),
bands AS (SELECT m.* FROM mh1 m JOIN keep1 k ON m.doc_id = k.doc_id),
w2 AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
{_curate_stage_sql('2', 'w2').strip()},
fresh2 AS (SELECT * FROM q2 WHERE fp NOT IN (SELECT fp FROM fps)),
exk2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM fresh2
  ) WHERE rn = 1
),
{_minhash_sql('2', 'exk2').strip()},
vs_prior AS (
  SELECT DISTINCT n.doc_id
  FROM (
    SELECT b2.doc_id, b1.doc_id AS prior_id, COUNT(*) AS n_bands
    FROM mh2 b2 JOIN bands b1 ON b2.k = b1.k AND b2.mh = b1.mh
    GROUP BY b2.doc_id, b1.doc_id
  ) n WHERE n.n_bands >= 4
),
surv AS (SELECT * FROM exk2 WHERE doc_id NOT IN (SELECT doc_id FROM vs_prior)),
{_minhash_sql('s', 'surv').strip()},
{_cc_sql('s', 'mhs').strip()},
kept2 AS (
  SELECT e.doc_id, e.lang, e.source, e.n_tokens
  FROM surv e LEFT JOIN comps c ON e.doc_id = c.node
  WHERE COALESCE(c.component, e.doc_id) = e.doc_id
),
united AS (
  SELECT doc_id, lang, source, n_tokens FROM keep1
  UNION ALL
  SELECT doc_id, lang, source, n_tokens FROM kept2
)
SELECT doc_id, lang, source, n_tokens,
       CASE WHEN {_CURATE_BUCKET100} < 80 THEN 'train'
            WHEN {_CURATE_BUCKET100} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM united
"""


@register("stream_curate_corpus", oracle=_stream_curate_oracle())
def stream_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus curation end-to-end on the REAL streaming engine:
    the documents table split into two waves of file drops (even doc_ids,
    then odd — deterministic, so the run is SQL-replayable), each curated
    in a micro-batch against the accumulating on-disk fingerprint/band
    index (streaming/curate.py), survivors appended to the corpus.

    The sink mutates state across micro-batches, but with a
    deterministic wave split the whole run replays as two chained
    recursive-CTE closures (the ``pipeline_curate_increment`` oracle
    extended with wave 1's own output) — so even the stateful streaming
    path is value-checked, not just row-counted. The three-wave
    accumulation test additionally pins first-wave-wins."""
    import tempfile

    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.streaming.curate import curate_document_stream

    docs = load(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        in_dir = f"{tmp}/incoming"
        for wave in (
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ):
            wave.write.mode("append").parquet(in_dir)
            q = curate_document_stream(
                spark.readStream.schema(docs.schema).parquet(in_dir),
                f"{tmp}/index",
                f"{tmp}/corpus",
                f"{tmp}/ckpt",
            )
            q.awaitTermination()
        out = spark.read.parquet(f"{tmp}/corpus").orderBy("doc_id")
        # the tempdir dies with this function — cut lineage into executor
        # block storage (stays distributed; no driver round-trip)
        return out.transform(materialize, eager=True, sever=True)
