"""Generate a larger scale factor by key-shifted replication of
/root/testdata/sf0.1 (the driver provides no sf1; TESTDATA.md forbids
touching /root/testdata, so the output lives under .benchdata/).

Each table is the union of K copies with keys shifted by copy-index ×
key-domain, so referential integrity (customer↔orders↔lineitem,
events.user_id, documents.doc_id, embeddings.vec_id) is preserved and
every catalog query runs unchanged. Dimension tables (region, nation,
part, supplier) stay fixed — the TPC-H discipline where facts scale and
small dims don't. Text/embedding payloads replicate verbatim, which
leaves the dedup pipelines real work: every original becomes a K-way
duplicate group the engines must actually find and collapse.

Usage: python tools/gen_sf.py [K] [out_dir]   (default 10 → sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000},
    "events": {"event_id": 100_000, "user_id": None},  # None → max+1 probe
    "documents": {"doc_id": 5_000},
    # label shifts too: cluster COUNT scales with the corpus (real IVF
    # behavior) — replicating labels verbatim would grow every bucket K×
    # and the bucketed-pair workloads quadratically
    "embeddings": {"vec_id": 2_000, "label": None},
}
COPY_AS_IS = ["region", "nation", "part", "supplier"]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".benchdata", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        exprs = []
        for c in cols:
            if c in shifts:
                domain = shifts[c]
                if domain is None:
                    domain = con.execute(
                        f"SELECT MAX({c}) + 1 FROM {src}"
                    ).fetchone()[0]
                exprs.append(f"{c} + i.i * {domain} AS {c}")
            elif t == "embeddings" and c == "embedding":
                # dimension-rotate each copy so replicas are NOT
                # near-identical vectors: verbatim copies would form
                # K-way cosine-1 cliques in every label bucket, turning
                # the semantic-dedup workload into one giant component
                # (and the oracle's recursive closure quadratic in it).
                # A per-copy rotation keeps the same value distribution
                # with independent directions.
                exprs.append(
                    "(CASE WHEN i.i = 0 THEN embedding ELSE "
                    "list_transform(range(len(embedding)), "
                    "j -> embedding[1 + ((j + i.i * 7) % len(embedding))])"
                    " END)::FLOAT[] AS embedding"
                )
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM {src}, "
            f"(SELECT unnest(range({k})) AS i) i ORDER BY i.i) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
