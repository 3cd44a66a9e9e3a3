"""Corpus-curation plan: the training-data preprocessing pipeline as ONE
composed Spark job graph over the documents table.

The stages every large-scale pretraining pipeline runs, chained in their
production order (each stage is also an individually-oracled catalog
query — this plan is the composition):

1. quality gate — token-count bounds (``pipeline_quality_filter`` family),
2. exact dedup — one content fingerprint per text, keeper = min doc_id
   (``dedup_exact``),
3. near dedup — MinHash-LSH candidates (≥ band threshold) → connected
   components → one keeper per duplicate group (``dedup_minhash_lsh`` +
   ``dedup_near_cluster``),
4. deterministic split — content-independent md5 bucketing, 80/10/10,
   migration-stable (``sample_train_split``),
5. sequence packing — concat-and-chunk into fixed token windows per
   (split, lang) stream (``pack_sequences``).

Scale notes: stages 1/2/4 are map-only or single-shuffle; stage 3 is the
dominant cost and inherits the single-shuffle bucket pair generation and
the AQE re-spread guard from the LSH operators; stage 5 is one window
sort per (split, lang). Nothing in the plan collects to the driver except
the final stage counts (a single aggregation).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensanctions_spark.operators.resolve import connected_components


@dataclass
class CurationConfig:
    min_tokens: int = 10
    max_tokens: int = 1000
    near_dup_bands: int = 4     # MinHash bands that must agree
    # stop-band cap: LSH buckets larger than this are boilerplate bands
    # carrying no signal; dropping them bounds pair cost at scale.
    # None = exact (the oracle-checked default at test scale).
    max_bucket_size: int | None = None
    context_tokens: int = 256   # packing window
    train_pct: int = 80         # of 100 md5 buckets
    val_pct: int = 10


def _word_tokens(col):
    return F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")


def curate_corpus(docs: DataFrame, config: CurationConfig | None = None) -> DataFrame:
    """Run the five-stage curation pipeline; returns the curated corpus
    as (doc_id, lang, source, n_tokens, split, pack_id, pack_offset).

    Dropped documents simply don't appear; per-stage counts come from
    ``curation_stats`` (one aggregation over a disposition frame, not one
    action per stage)."""
    cfg = config or CurationConfig()

    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(_word_tokens("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("fp"),
    )
    quality = toks.filter(
        (F.col("n_tokens") >= cfg.min_tokens) & (F.col("n_tokens") <= cfg.max_tokens)
    )

    # exact dedup as ONE fp-partitioned window: a single full-width
    # exchange. (A keeper-agg + semi-join form was benched in round 2 and
    # measured 0.8 s slower at sf0.1 — two extra AQE stage boundaries —
    # while at scale both shapes shuffle the corpus exactly once, so the
    # window keeps the lower stage count at every size.)
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        quality.withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )
    # consumed twice: as the shingling input of the near-dedup edge
    # pipeline AND as the survivor side of the keeper join — persist so
    # the scan + quality + fingerprint window runs once
    from pyspark.storagelevel import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    from opensanctions_spark.catalog.text import minhash_pairs_of, shingle_arrays_of

    edges = minhash_pairs_of(
        shingle_arrays_of(exact), max_bucket_size=cfg.max_bucket_size
    ).filter(F.col("n_bands") >= cfg.near_dup_bands)
    cc = connected_components(
        edges, src="left_id", dst="right_id", distinct_edges=False
    )
    mapping = cc.select(F.col("node").alias("doc_id"), F.col("component"))
    near = (
        exact.join(mapping, "doc_id", "left")
        .filter(
            F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id")
        )
        .drop("component", "text")
    )

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < cfg.train_pct, "train")
        .when(bucket < cfg.train_pct + cfg.val_pct, "val")
        .otherwise("test")
    )
    splitted = near.withColumn("split", split)

    w_pack = (
        Window.partitionBy("split", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = splitted.withColumn("cum", F.sum("n_tokens").over(w_pack))
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "split",
        (start / cfg.context_tokens).cast("long").alias("pack_id"),
        (start % cfg.context_tokens).cast("long").alias("pack_offset"),
    )


def curation_stats(docs: DataFrame, curated: DataFrame) -> dict[str, int]:
    """Pipeline funnel counts in two actions: input size, and per-split
    survivor counts + packed-window total from the curated frame."""
    n_input = docs.count()
    rows = (
        curated.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count_distinct("lang", "pack_id").alias("n_packs"),
        )
        .collect()
    )
    stats: dict[str, int] = {"input_docs": n_input, "curated_docs": 0}
    for r in rows:
        stats[f"{r['split']}_docs"] = r["n_docs"]
        stats[f"{r['split']}_tokens"] = r["n_tokens"]
        stats[f"{r['split']}_packs"] = r["n_packs"]
        stats["curated_docs"] += r["n_docs"]
    return stats


def curation_index(docs: DataFrame, curated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build the persistent curation index for the kept corpus: the state
    an incremental run needs to dedupe NEW documents against the existing
    corpus without re-reading it.

    Returns (fingerprints, bands):
    - fingerprints(fp): md5 content hashes of kept docs (exact-dup probe),
    - bands(doc_id, k, mh): MinHash-LSH band signatures of kept docs
      (near-dup probe).

    Both are tiny next to the corpus (one row / eight rows per doc, no
    text) — the J1 timestamp-index discipline applied to curation: carry
    forward a compact index, not the data."""
    from opensanctions_spark.catalog.text import minhash_bands_of, shingle_arrays_of

    kept = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    fps = kept.select(F.md5(F.col("text")).alias("fp")).distinct()
    bands = minhash_bands_of(shingle_arrays_of(kept))
    return fps, bands


def curate_increment(
    new_docs: DataFrame,
    fingerprints: DataFrame,
    bands: DataFrame,
    config: CurationConfig | None = None,
    with_frames: bool = False,
):
    """Curate ONE new wave of documents against an existing corpus index —
    the nightly-increment path: cost scales with the wave, never with the
    corpus.

    Stages (first-wave-wins keeper policy — corpus members never churn):
    1. quality gate on the new docs (same bounds as the batch plan),
    2. exact dedup: drop new docs whose fingerprint is already in the
       index, then keep min-doc_id per fingerprint within the wave,
    3. near dedup: new-wave band signatures probe the index bands (an
       equi-join on (k, mh) — the index side shuffles ONCE on the band
       key and can be pre-bucketed on it at 100 TB); any new doc sharing
       ≥ band-threshold bands with a corpus member drops. Survivors then
       near-dedupe among themselves (connected components, min keeper),
    4. the stable md5 split (content-independent → wave members land in
       the same split they would have in a full batch run).

    Packing is deliberately snapshot-scoped (pack ids are offsets in a
    frozen stream), so the increment returns unpacked curated rows:
    (doc_id, lang, source, n_tokens, split).

    ``with_frames=True`` returns ``(curated, exact, new_bands)`` instead
    — the wave's post-exact-dedup frame (doc_id … text, persisted) and
    its band signatures (persisted), for callers that extend the corpus
    index with the kept docs (the streaming sink): deriving the index
    rows from these persisted frames avoids re-tokenizing the wave's
    text a second time."""
    cfg = config or CurationConfig()

    toks = new_docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(_word_tokens("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("fp"),
    )
    quality = toks.filter(
        (F.col("n_tokens") >= cfg.min_tokens) & (F.col("n_tokens") <= cfg.max_tokens)
    )

    fresh = quality.join(fingerprints, "fp", "left_anti")
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        fresh.withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )
    from pyspark.storagelevel import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    from opensanctions_spark.catalog.text import minhash_bands_of, shingle_arrays_of

    new_bands = minhash_bands_of(shingle_arrays_of(exact)).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # new vs corpus: band-key equi-join, agreeing-band count per
    # (new, prior) PAIR — the threshold is per prior document, so the
    # prior doc_id must ride the join (pooling matches across different
    # corpus members would over-drop)
    vs_prior = (
        new_bands.join(
            bands.select(
                F.col("doc_id").alias("prior_id"),
                F.col("k").alias("k_p"),
                F.col("mh").alias("mh_p"),
            ),
            (F.col("k") == F.col("k_p")) & (F.col("mh") == F.col("mh_p")),
        )
        .groupBy("doc_id", "prior_id")
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= cfg.near_dup_bands)
        .select("doc_id")
        .distinct()
    )
    survivors = exact.join(vs_prior, "doc_id", "left_anti")

    # new vs new among the survivors: the batch pair stage on a
    # wave-sized input. The survivors' band signatures are a doc_id
    # semi-join of the (persisted) new_bands frame — re-deriving them
    # from text would tokenize + shingle + hash the wave a SECOND time
    # (a second full text pass at corpus scale).
    from opensanctions_spark.catalog.text import minhash_pairs_of

    surv_bands = new_bands.join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    )
    edges = minhash_pairs_of(
        None, max_bucket_size=cfg.max_bucket_size, bands=surv_bands
    ).filter(F.col("n_bands") >= cfg.near_dup_bands)
    cc = connected_components(
        edges, src="left_id", dst="right_id", distinct_edges=False
    )
    mapping = cc.select(F.col("node").alias("doc_id"), F.col("component"))
    kept = (
        survivors.join(mapping, "doc_id", "left")
        .filter(F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id"))
        .drop("component", "text")
    )

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < cfg.train_pct, "train")
        .when(bucket < cfg.train_pct + cfg.val_pct, "val")
        .otherwise("test")
    )
    curated = kept.withColumn("split", split).select(
        "doc_id", "lang", "source", "n_tokens", "split"
    )
    if with_frames:
        return curated, exact, new_bands
    return curated
