"""Repo-wide plan audit: optimized-plan size + codegen health for every
catalog query (SCALE.md §12 hook).

The f20 post-mortem showed a failure mode that no correctness gate and no
small-SF bench catches: Catalyst alias substitution can inflate a plan
past janino's 64 KB method limit, whole-stage codegen silently fails, and
the stage runs interpreted — 100× slower with an identical, green result.
This tool sweeps EVERY catalog query and reports:

- optimized logical plan size (chars) — substitution blowups show up as
  10-100× outliers long before they hurt at test scale;
- whether the generated Java for the physical plan actually compiles
  (CODEGEN_ONLY factory mode + codegen.fallback=false turn silent
  interpreted fallbacks into hard errors during a real execution at the
  audit SF).

Usage: python tools/audit_plans.py [sf_dir] [--threshold CHARS]
Exit 1 if any query exceeds the threshold or fails to compile.

Known plan-TEXT outliers (audited round 5, all compile-clean and
runtime-healthy — the size is a printing artifact, not duplicated work):
see EXPLAINED below. New entrants above the threshold still fail.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Queries whose optimized-plan *text* is legitimately large, with the
# audited reason and a per-query ceiling (2× the round-5 measurement).
# These are NOT substitution blowups: every one executes compile-clean
# under CODEGEN_ONLY + codegen.fallback=false.
EXPLAINED: dict[str, tuple[int, str]] = {
    # 2048-word bloom bitset array literal printed once per xxhash64
    # probe (4×). element_at over a constant array is O(1) per row; the
    # duplication is plan text, not work (≈64 KB of literal per task
    # binary — negligible against a 100 MB task sandbox).
    "contamination_bloom": (260_000, "bloom bitset literal ×4 probes"),
    # optimizedPlan().toString() embeds the cached InMemoryRelation's
    # executed plan at EVERY cache reference — the logical plan itself
    # is ~3 KB; the rest is the cache's plan string repeated.
    "pipeline_curate_increment": (210_000, "cached-plan string embedding"),
    # depth-bounded BFS (SCALE.md §5: fixed k ≤ 2) unrolls each wave's
    # subtree; plan grows with the FIXED depth constant, not data.
    "pipeline_enrich_expand": (160_000, "bounded BFS unroll, k=2"),
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    threshold = 32_768
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = int(a.split("=", 1)[1])

    from opensanctions_spark.session import get_session
    from opensanctions_spark.catalog import QUERIES

    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    # Detect codegen fallbacks as hard failures, not log lines: in
    # CODEGEN_ONLY mode an expression/projection that cannot compile
    # raises instead of silently dropping to interpreted mode — exactly
    # the signal the audit wants.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    # ...and make whole-stage codegen compile failures THROW instead of
    # silently de-fusing the stage, so a fused-stage blowup (the f20
    # failure mode) is a hard FAIL here rather than a warning in a log
    # nobody reads.
    spark.conf.set("spark.sql.codegen.fallback", "false")

    failures: list[tuple[str, str]] = []
    sizes: list[tuple[int, str]] = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan_len = len(df._jdf.queryExecution().optimizedPlan().toString())
            sizes.append((plan_len, name))
            df.count()
            status = "ok"
            cap, why = EXPLAINED.get(name, (threshold, None))
            if plan_len >= cap:
                status = "PLAN-BLOWUP"
                failures.append((name, f"optimized plan {plan_len} chars"))
            elif why is not None and plan_len >= threshold:
                status = "explained"
            print(f"{status:12s} {name}: plan={plan_len}ch")
        except Exception as exc:  # noqa: BLE001 - audit must survive each query
            msg = str(exc).split("\n", 1)[0][:160]
            failures.append((name, msg))
            print(f"FAIL         {name}: {msg}")
        sys.stdout.flush()

    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")

    sizes.sort(reverse=True)
    print("\nlargest optimized plans:")
    for plan_len, name in sizes[:10]:
        print(f"  {plan_len:8d}  {name}")

    if failures:
        print(f"\n{len(failures)} finding(s):")
        for name, msg in failures:
            print(f"  {name}: {msg}")
        return 1
    print(f"\nall {len(sizes)} queries: plans bounded, codegen compiles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
