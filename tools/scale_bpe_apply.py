"""Production-merge-budget curve for the BPE apply pass (round 11).

The catalog row ``text_bpe_apply`` proves oracle-exactness at K=128
merges; this tool proves the PLAN survives production merge budgets by
exercising the exact path a real pipeline runs:

  1. TRAIN/PERSIST: derive the ranked pair table over the sf corpus
     once and WRITE it to parquet — the artifact a tokenizer trainer
     persists (merge tables are kilobytes).
  2. For each merge budget K in the sweep: READ the persisted table
     back, take the top-K in rank order, and run the full encode
     (vocab-side Arrow apply → corpus word join → per-doc agg),
     timing wall and recording plan size.

Two honesty notes about the synthetic corpus, both handled in-plan:

- The sf documents carry a ~31-word vocabulary, so the vocab side
  would be unrealistically small. ``--expand`` (default 997) remaps
  each word to ``w || '-' || pmod(xxhash64(w, doc_id), N)`` on BOTH
  the vocab and corpus sides — a consistent relabeling that grows the
  distinct-word table to a realistic V (~30k) without changing the
  corpus-side plan shape.
- The real pair table tops out at the observed symbol-pair count
  (≤ ~1.4k on a 37-char alphabet), so budgets beyond it are padded
  with deterministic hierarchical (merged || merged) pairs.
  ``str.replace`` scans the sequence whether or not the pair occurs,
  so the wall-vs-K curve measures the true apply-loop cost either way.

The claim under test (VERDICT r10 "What's wrong #2"): wall grows
sub-linearly in K and the PLAN is K-invariant — one ArrowEvalPython
node and a constant exchange count whether K is 128 or 4096, because
the merge list rides in the UDF closure instead of the plan tree.
``text_bpe_encode``'s one-layer-per-merge design structurally cannot
make that claim past a handful of rounds.

Usage: python tools/scale_bpe_apply.py [sf_dir] [K ...] [--expand N]
Prints one JSON line: {"sf_dir": ..., "n_vocab": V, "n_real_merges": M,
  "reps": [{"k": K, "wall_sec": W, "n_docs": D, "total_tokens": T,
            "arrow_nodes": 1, "exchanges": E}, ...]}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pad_merges(merges: list[tuple[str, str]], k: int) -> list[tuple[str, str]]:
    """Extend a ranked merge list to K entries with deterministic
    hierarchical pairs built from already-merged symbols (the shape a
    deeper trainer would emit). Pure function of the input list."""
    out = list(merges)
    if len(out) >= k:
        return out[:k]
    symbols = [m for _, m in merges] or ["aa"]
    i = j = 0
    seen = {p for p, _ in out}
    while len(out) < k:
        a, b = symbols[i % len(symbols)], symbols[j % len(symbols)]
        pair = f"{a} {b}"
        if pair not in seen:
            seen.add(pair)
            out.append((pair, a + b))
        j += 1
        if j % len(symbols) == 0:
            i += 1
            if i >= len(symbols):
                symbols.append(symbols[i % len(symbols)] + symbols[j % len(symbols)])
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    expand = 997
    for a in sys.argv[1:]:
        if a.startswith("--expand"):
            expand = int(a.split("=", 1)[1]) if "=" in a else expand
    sf_dir = args[0] if args else "/root/repo/.benchdata/sf1"
    ks = [int(a) for a in args[1:]] or [128, 512, 2048, 4096]

    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.catalog.text import _tokens, bpe_apply_merges
    from opensanctions_spark.session import get_session

    spark = get_session("scale-bpe-apply")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    dw = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    if expand > 1:
        dw = dw.withColumn(
            "w",
            F.concat(
                F.col("w"),
                F.lit("-"),
                F.pmod(F.xxhash64("w", "doc_id"), F.lit(expand)).cast("string"),
            ),
        )
    wc = dw.groupBy("w").agg(F.count("*").alias("c"))
    wc.persist()
    n_vocab = wc.count()

    # --- 1. train/persist the ranked merge table (the trainer's artifact)
    chars = F.split(F.col("w"), "")
    pairs = (
        wc.filter(F.length("w") > 1)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(chars, 1, F.size(chars) - 1),
                    F.slice(chars, 2, F.size(chars) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
            "c",
        )
        .groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n"))
    )
    work = tempfile.mkdtemp(prefix="bpe_merges_")
    merges_path = os.path.join(work, "merges.parquet")
    pairs.orderBy(F.col("n").desc(), F.col("pair")).limit(max(ks)).write.mode(
        "overwrite"
    ).parquet(merges_path)

    reps = []
    n_real = 0
    for k in ks:
        # --- 2. consume the persisted table: top-K in rank order
        rows = spark.read.parquet(merges_path).collect()
        real = [
            (r["pair"], r["pair"].replace(" ", ""))
            for r in sorted(rows, key=lambda r: (-r["n"], r["pair"]))
        ]
        n_real = len(real)
        merges = pad_merges(real, k)
        t0 = time.time()
        enc = bpe_apply_merges(wc, merges)
        out = (
            dw.join(enc, "w")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("nt").cast("long").alias("n_tokens"),
            )
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tt")
        ).collect()[0]
        wall = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        reps.append(
            {
                "k": k,
                "wall_sec": round(wall, 2),
                "n_docs": agg["n_docs"],
                "total_tokens": agg["tt"],
                "arrow_nodes": plan.count("ArrowEvalPython"),
                "exchanges": plan.count("Exchange"),
            }
        )
        print(f"  K={k}: {wall:.2f}s tokens={agg['tt']}", file=sys.stderr)

    shutil.rmtree(work, ignore_errors=True)
    wc.unpersist()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "expand": expand,
                "n_vocab": n_vocab,
                "n_real_merges": n_real,
                "reps": reps,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
