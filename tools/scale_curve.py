"""Scaling-curve measurement: wall time + shuffle-write bytes per headline
query at one scale factor (SCALE.md §10).

Shuffle bytes come from the Spark UI REST API (the same numbers the UI's
stage table shows): the per-query delta of the app-wide shuffle-write
total. Linear shuffle growth across sf1→sf3→sf10 is the gate — a query
whose shuffle bytes grow super-linearly in the input has a densifying
intermediate (e.g. pair expansion) that will not survive 100 TB.

Usage: python tools/scale_curve.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def _shuffle_write_total(ui: str, app_id: str) -> int:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    from opensanctions_spark.catalog import QUERIES
    from opensanctions_spark.session import configure

    # the tuned session disables the UI; this tool needs its REST API for
    # the stage-level shuffle metrics, so re-enable it here only
    builder = SparkSession.builder.appName("scale-curve").master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    spark = configure(builder).config("spark.ui.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # warm every plan at sf0.001 (fixed analysis/codegen cost)
    for name in HEADLINE:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"warmup {name}: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name in HEADLINE:
        times = []
        rows = 0
        sw0 = _shuffle_write_total(ui, app_id)
        for i in range(2):
            t0 = time.time()
            rows = QUERIES[name](spark, sf_dir).count()
            times.append(time.time() - t0)
        shuffle = _shuffle_write_total(ui, app_id) - sw0
        results[name] = {
            "rows": rows,
            "sec": round(min(times), 2),
            "shuffle_mb_2runs": round(shuffle / 1e6, 1),
        }
        print(
            f"{name}: {min(times):.2f}s rows={rows} "
            f"shuffle={shuffle/1e6:.1f}MB",
            flush=True,
        )
    total = round(sum(r["sec"] for r in results.values()), 2)
    doc = {"sf_dir": sf_dir, "total_sec": total, "queries": results}
    print(json.dumps({"sf_dir": sf_dir, "total_sec": total}))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(doc, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
