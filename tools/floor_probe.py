"""Floor probe (round 7): decompose the per-query fixed overhead on the
floor-bound headline queries at sf0.1 and A/B the AQE coalesce knobs.

Usage: python tools/floor_probe.py [configset] [query ...]
  configset in {base, pfirst, pfirst16} (default base)

Prints per-query: plan-construction time (Python/Py4J), first-count time,
min-of-3 count time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLOOR_QUERIES = [
    "d0_d1_version_delta",
    "j6_canonical_map",
    "j3_adjacency_region_revenue",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q16_supplier_variety",
    "stream_interval_join",
    "stream_windowed_agg",
    "ann_cosine_topk",
    "k3_simple_csv",
    "j1_timestamp_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "text_tfidf_topk",
    "search_bm25",
]


def main() -> None:
    cfg = sys.argv[1] if len(sys.argv) > 1 else "base"
    names = sys.argv[2:] or FLOOR_QUERIES

    from opensanctions_spark.session import get_session

    spark = get_session(f"floor-probe-{cfg}")
    spark.sparkContext.setLogLevel("ERROR")
    if cfg in ("pfirst", "pfirst16"):
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
    if cfg == "pfirst16":
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(16 * 1024 * 1024)
        )

    from opensanctions_spark.catalog import QUERIES

    # warm engine
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    nation.groupBy("n_regionkey").count().count()
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).count()
        except Exception as exc:
            print(f"# warm {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    tot_build = tot_exec = 0.0
    for name in names:
        fn = QUERIES[name]
        builds, execs = [], []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            df.count()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = min(builds), min(execs)
        tot_build += b
        tot_exec += e
        print(f"{name:32s} build {b:6.3f}s  exec {e:6.3f}s")
    print(f"{'TOTAL':32s} build {tot_build:6.3f}s  exec {tot_exec:6.3f}s")


if __name__ == "__main__":
    main()
