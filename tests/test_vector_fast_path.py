"""Production ANN scoring path (functions/vector_math.py + the _fast
catalog queries): the BLAS-batched scorer must agree with the
oracle-deterministic HOF fold modulo nano-unit quantization, and the
per-batch top-k must survive partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_dot_fast_matches_hof_fold(spark):
    from opensanctions_spark.catalog.vectors import dot
    from opensanctions_spark.functions.vector_math import dot_fast

    df = spark.range(200).select(
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(100)) / 50.0,
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: F.pmod(F.xxhash64(i, F.col("id")), F.lit(100)) / 50.0,
        ).alias("b"),
    )
    got = df.select(
        (F.abs(dot(F.col("a"), F.col("b")) - dot_fast(F.col("a"), F.col("b")))
         < 1e-9).alias("ok")
    )
    assert got.filter(~F.col("ok")).count() == 0


def test_cosine_fast_range(spark):
    from opensanctions_spark.functions.vector_math import cosine_fast

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 1.0], [-1.0, -1.0])],
        "a array<double>, b array<double>",
    )
    vals = [r[0] for r in df.select(cosine_fast(F.col("a"), F.col("b"))).collect()]
    assert abs(vals[0] - 1.0) < 1e-12
    assert abs(vals[1]) < 1e-12
    assert abs(vals[2] + 1.0) < 1e-12


def test_ann_fast_agrees_with_oracle_twin(spark):
    """Same neighbors and ranks as the exact HOF brute force — the fast
    path changes the compute shape, not the answer."""
    slow = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in QUERIES["ann_cosine_fast"](spark, SF_DIR).collect()
    }
    assert fast == slow


def test_dedup_fast_agrees_with_oracle_twin(spark):
    slow = {
        (r["left_id"], r["right_id"])
        for r in QUERIES["dedup_embedding_cosine"](spark, SF_DIR).collect()
    }
    fast = {
        (r["left_id"], r["right_id"])
        for r in QUERIES["dedup_embedding_fast"](spark, SF_DIR).collect()
    }
    assert fast == slow


def test_ann_fast_survives_many_partitions(spark):
    """Per-batch top-k + global window must be exact regardless of how
    candidates split into batches."""
    from opensanctions_spark.catalog import load

    base = QUERIES["ann_cosine_fast"](spark, SF_DIR).collect()
    emb = load(spark, SF_DIR, "embeddings")
    n_parts = emb.rdd.getNumPartitions()
    assert n_parts > 1  # the catalog loader repartitions embeddings
    assert len(base) > 0


def test_ivfpq_recall_row_semantics(spark, sf_dir):
    """Invariants of the recall probe: one row per nprobe in {1,2,4},
    candidates never exceed the top-k budget, recalled never exceeds
    candidates, and the candidate pool is non-decreasing in nprobe
    (supersets — recall itself may legally dip under ADC)."""
    from opensanctions_spark.catalog import QUERIES

    rows = {
        r["nprobe"]: (r["n_topk"], r["n_recalled"])
        for r in QUERIES["ann_ivfpq_recall"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4}
    for nprobe, (n_topk, n_recalled) in rows.items():
        assert 0 < n_topk <= 10, nprobe
        assert 0 <= n_recalled <= n_topk, nprobe
    assert rows[1][0] <= rows[2][0] <= rows[4][0]


def test_quantized_dims_guards_packed_argmin_domain(spark):
    """Coordinates beyond |2.0| would overflow the exact min(dist*16+code)
    packing downstream — the guard must fail loudly, not wrap silently."""
    from opensanctions_spark.catalog.vectors import _quantized_dims

    ok = spark.createDataFrame(
        [(0, [1.9, -2.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = _quantized_dims(ok).collect()
    assert sorted(r["q"] for r in rows) == [-2000000, 0, 1900000]

    bad = spark.createDataFrame(
        [(1, [0.5, 2.5])], "vec_id long, embedding array<double>"
    )
    import pytest

    with pytest.raises(Exception) as exc:
        _quantized_dims(bad).collect()
    assert "packed-argmin" in str(exc.value)
