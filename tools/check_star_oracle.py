"""Exact at-scale oracle for `dedup_near_cluster_star` (VERDICT r3 task 3).

The driver-gate oracle for the star clustering is a recursive-CTE
transitive closure — exact but O(cluster²) reach rows, so it is
gate-scale-only (at sf1 the synthetic corpus collapses into 7 mega-
clusters of ~7k docs ≈ 7×10⁸ reach rows). This tool replaces the sf1+
invariant check with an EXACT independent recomputation that stays
linear at any scale:

1. DuckDB derives the band-star edge set (the same `minhash` CTE the
   gate oracle uses — root = min doc per (band, signature) bucket),
2. min-label propagation iterated from Python: each round is ONE linear
   join + groupBy (`new_label(x) = min(label(x), min label of x's
   neighbors)`), state is one row per node, convergence after
   diameter(G) rounds — never a quadratic reach table,
3. the converged labeling (= min-id connected components, provably: the
   fixpoint of min-propagation from label(x)=x is exactly
   min(component(x))) is compared BIT-FOR-BIT against the Spark query's
   (doc_id, canonical_id, is_keeper) output.

Usage: python tools/check_star_oracle.py [sf_dir]   (default .benchdata/sf1)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"

    from opensanctions_spark.catalog import QUERIES
    from opensanctions_spark.catalog.text import _MINHASH_BANDS_SQL
    from opensanctions_spark.session import get_session

    spark = get_session("star-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    got = (
        QUERIES["dedup_near_cluster_star"](spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    )
    spark_s = time.time() - t0
    spark_rows = [(r["doc_id"], r["canonical_id"], r["is_keeper"]) for r in got]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    t0 = time.time()
    # 1. star edges, symmetrized — linear in bucket membership
    con.execute(
        f"""
    CREATE TABLE sym AS
    WITH {_MINHASH_BANDS_SQL.strip()},
    roots AS (SELECT k, mh, MIN(doc_id) AS root FROM minhash GROUP BY k, mh),
    edges AS (
      SELECT DISTINCT r.root AS a, m.doc_id AS b
      FROM minhash m JOIN roots r USING (k, mh)
      WHERE m.doc_id <> r.root
    )
    SELECT a, b FROM edges UNION SELECT b, a FROM edges
    """
    )
    # 2. iterated min-label propagation: one linear join per round
    con.execute(
        "CREATE TABLE lp AS SELECT DISTINCT a AS node, a AS label FROM sym"
    )
    rounds = 0
    while True:
        rounds += 1
        con.execute(
            """
        CREATE TABLE lp2 AS
        SELECT node, MIN(label) AS label FROM (
          SELECT node, label FROM lp
          UNION ALL
          SELECT s.b AS node, lp.label FROM lp JOIN sym s ON lp.node = s.a
        ) GROUP BY node
        """
        )
        (changed,) = con.execute(
            "SELECT COUNT(*) FROM lp2 JOIN lp USING (node) "
            "WHERE lp2.label <> lp.label"
        ).fetchone()
        con.execute("DROP TABLE lp")
        con.execute("ALTER TABLE lp2 RENAME TO lp")
        if changed == 0:
            break
        if rounds > 10_000:
            raise RuntimeError("label propagation failed to converge")
    want = con.execute(
        """
    SELECT d.doc_id,
           COALESCE(lp.label, d.doc_id) AS canonical_id,
           COALESCE(lp.label, d.doc_id) = d.doc_id AS is_keeper
    FROM documents d LEFT JOIN lp ON d.doc_id = lp.node
    ORDER BY d.doc_id
    """
    ).fetchall()
    duck_s = time.time() - t0

    ok = spark_rows == [tuple(r) for r in want]
    n_clusters = len({r[1] for r in spark_rows})
    print(
        f"{'ok   ' if ok else 'FAIL '} dedup_near_cluster_star @ {sf_dir}: "
        f"rows={len(spark_rows)} clusters={n_clusters} "
        f"lp_rounds={rounds} spark={spark_s:.1f}s duckdb={duck_s:.1f}s"
    )
    if not ok:
        diffs = [
            (s, w)
            for s, w in zip(spark_rows, [tuple(r) for r in want])
            if s != w
        ][:10]
        for s, w in diffs:
            print(f"  spark={s} oracle={w}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
