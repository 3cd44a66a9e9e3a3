"""IVF-PQ recall at PRODUCTION quantizer rates (round 11, SCALE-only).

The catalog row ``ann_ivfpq_recall`` runs the quantizer at 2
bits/subspace with a single Lloyd step so DuckDB can replay the
training longhand — which correctly yields low, non-monotone recall
(SCALE.md §19: ADC underestimation at 4 codewords displaces true
neighbors). This tool measures the SAME IVF-PQ layout at the settings
a deployment actually ships (the IVFADC+R configuration):

- 8 bits/subspace: k=256 codewords × M=8 subspaces over 64 dims,
- coarse quantizer k1=64 cells,
- Lloyd iterated to convergence (stable assignments, ≤25 iters),
- asymmetric-distance scoring into a top-500 pool, then an EXACT-L2
  re-rank of the pool to the final top-10 (the re-rank stage every
  production IVF-PQ deployment bolts on; Jégou et al. 2011 §V).

Production-honest split, same as FAISS: codebook TRAINING is
sample-based and runs where the sample fits (here the driver — the
sf1 corpus is 20k×64 floats ≈ 5 MB; at 100 TB you train on the same
few-hundred-k sample, never the corpus); ENCODE, ADC SCORING and the
RE-RANK are corpus-sized and run in Spark — one mapInPandas encode
under the broadcast codebooks (the ``ann_ivf_pq`` layout), then one
joined plan scoring every (query, nprobe) pair: probe table, LUT,
query vectors and nprobe dimension all broadcast; the exact re-rank
touches only the ≤500-row ADC pool per (query, nprobe).

No oracle: recall quality is the claim; the plan shape is already
gated by ``test_ivfpq_recall_plan`` on the catalog row.

Usage: python tools/scale_ivfpq_recall.py [sf_dir] [n_queries]
Prints one JSON line:
  {"k_codewords": 256, "lloyd_iters": ..., "recall_at_10": {"1": r, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M_SUB = 8          # subspaces (64 dims / 8)
SUB_DIM = 8
K_CODE = 256       # 8 bits/subspace — the production rate
K1_CELLS = 64      # coarse quantizer cells
TOPK = 10
RERANK = 500       # exact-L2 re-rank pool (IVFADC+R)
NPROBES = [1, 2, 4, 8, 16]
MAX_ITERS = 25


def _sqdist(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 via the expansion |x|²+|c|²−2x·c — one matmul
    instead of an (n, k, d) broadcast temp."""
    return (
        (X * X).sum(axis=1)[:, None]
        + (C * C).sum(axis=1)[None, :]
        - 2.0 * (X @ C.T)
    )


def kmeans(data: np.ndarray, k: int, iters: int = MAX_ITERS) -> tuple[np.ndarray, int]:
    """Deterministic converged Lloyd: first-k init (the engine's PQ
    discipline), stop when assignments are stable. Returns (centroids,
    iterations_run)."""
    cent = data[:k].copy()
    prev = None
    for it in range(iters):
        assign = _sqdist(data, cent).argmin(axis=1)
        if prev is not None and (assign == prev).all():
            return cent, it
        prev = assign
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = data[mask].mean(axis=0)
    return cent, iters


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opensanctions_spark.session import get_session

    spark = get_session("scale-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    # ---- sample-based training (driver-side, the FAISS split) -------------
    t0 = time.time()
    # vec_ids are contiguous 0..N-1 in the sf tables; the ordered limit
    # makes sample row i ↔ vec_id i (asserted below)
    srows = emb.orderBy("vec_id").limit(20000).collect()
    assert all(r["vec_id"] == i for i, r in enumerate(srows[:100]))
    sample = np.array([r["embedding"] for r in srows], dtype=np.float64)
    coarse, coarse_iters = kmeans(sample, K1_CELLS)
    pq_books = []
    pq_iters = []
    for m in range(M_SUB):
        sub = sample[:, m * SUB_DIM : (m + 1) * SUB_DIM]
        book, its = kmeans(sub, K_CODE)
        pq_books.append(book)
        pq_iters.append(its)
    t_train = time.time() - t0

    # ---- corpus encode in Spark (broadcast codebooks, mapInPandas) --------
    sc = spark.sparkContext
    b_coarse = sc.broadcast(coarse)
    b_books = sc.broadcast(np.stack(pq_books))  # (M, K, SUB_DIM)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cells = _sqdist(X, b_coarse.value).argmin(axis=1)
            out = {"vec_id": pdf["vec_id"].to_numpy(), "cell": cells}
            for m in range(M_SUB):
                sub = X[:, m * SUB_DIM : (m + 1) * SUB_DIM]
                out[f"c{m}"] = _sqdist(sub, b_books.value[m]).argmin(axis=1)
            yield pd.DataFrame(out)

    code_schema = "vec_id long, cell int, " + ", ".join(
        f"c{m} int" for m in range(M_SUB)
    )
    codes = emb.mapInPandas(encode, schema=code_schema)
    # long form for the LUT join: (vec_id, cell, sub, code)
    codes_long = codes.select(
        "vec_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("sub"), F.col(f"c{m}").alias("code"))
                    for m in range(M_SUB)
                ]
            )
        ).alias("sc"),
    ).select("vec_id", "cell", "sc.sub", "sc.code")

    # ---- query panel: LUTs + probe ranks + exact ground truth -------------
    queries = sample[:n_queries]
    lut_rows, probe_rows, exact_rows, q_rows = [], [], [], []
    for qid in range(n_queries):
        qv = queries[qid]
        cd = ((coarse - qv[None, :]) ** 2).sum(axis=1)
        for rank, cell in enumerate(np.argsort(cd, kind="stable")):
            probe_rows.append((qid, int(cell), rank + 1))
        for m in range(M_SUB):
            sub = qv[m * SUB_DIM : (m + 1) * SUB_DIM]
            d2 = ((b_books.value[m] - sub[None, :]) ** 2).sum(axis=1)
            for code in range(K_CODE):
                lut_rows.append((qid, m, int(code), float(d2[code])))
        ed = ((sample - qv[None, :]) ** 2).sum(axis=1)
        ed[qid] = np.inf  # exclude the query itself
        for v in np.argsort(ed, kind="stable")[:TOPK]:
            exact_rows.append((qid, int(v)))
        q_rows.append((qid, [float(x) for x in qv]))

    lut = spark.createDataFrame(lut_rows, "qid int, sub int, code int, dist double")
    probes = spark.createDataFrame(probe_rows, "qid int, cell int, prank int")
    exact = spark.createDataFrame(exact_rows, "qid int, evid long")
    qvecs = spark.createDataFrame(q_rows, "qid int, qvec array<double>")
    nprobes = spark.createDataFrame([(n,) for n in NPROBES], "nprobe int")

    # ---- one joined plan: ADC pool → exact re-rank → recall ---------------
    t1 = time.time()
    adc = (
        codes_long.join(F.broadcast(probes), "cell")
        .join(F.broadcast(nprobes), F.col("prank") <= F.col("nprobe"))
        .filter(F.col("vec_id") != F.col("qid").cast("long"))
        .join(F.broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", "nprobe", "vec_id")
        .agg(F.sum("dist").alias("adc"))
    )
    w = Window.partitionBy("qid", "nprobe").orderBy("adc", "vec_id")
    pool = adc.select(
        "qid", "nprobe", "vec_id", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= RERANK)
    # exact re-rank of the pool: join the raw vectors back (pool-sized,
    # ≤ RERANK × queries × nprobes rows) + broadcast query vectors
    diff = F.zip_with("embedding", "qvec", lambda a, b: (a - b) * (a - b))
    reranked = (
        pool.join(emb, "vec_id")
        .join(F.broadcast(qvecs), "qid")
        .withColumn("edist", F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    )
    w2 = Window.partitionBy("qid", "nprobe").orderBy("edist", "vec_id")
    topk = reranked.select(
        "qid", "nprobe", "vec_id", F.row_number().over(w2).alias("rk")
    ).filter(F.col("rk") <= TOPK)
    recall = (
        topk.join(
            F.broadcast(exact),
            (topk["qid"] == exact["qid"]) & (topk["vec_id"] == exact["evid"]),
            "left_semi",
        )
        .groupBy("nprobe")
        .agg((F.count(F.lit(1)) / (n_queries * TOPK)).alias("recall"))
        .orderBy("nprobe")
        .collect()
    )
    t_score = time.time() - t1

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": n_queries,
                "m_subspaces": M_SUB,
                "k_codewords": K_CODE,
                "k1_cells": K1_CELLS,
                "rerank_pool": RERANK,
                "lloyd_iters": {"coarse": coarse_iters, "pq": pq_iters},
                "train_sec": round(t_train, 1),
                "score_sec": round(t_score, 1),
                "recall_at_10": {
                    str(r["nprobe"]): round(r["recall"], 3) for r in recall
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
