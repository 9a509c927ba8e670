"""Bench HONESTY audit: verify count() does not ELIMINATE any headline
query's real work.

Round-5 lesson: count() is not a safe materializer — Spark removes
left-outer joins with provably duplicate-free right sides, prunes
cardinality-preserving windows/generates, and strips projection
expressions nothing consumes, so three headline queries were timing
metadata row counts. Byte floors turned out to be a bad detector (the
synthetic tables compress to a few hundred KB and parquet inputBytes
is unreliable at that size), so this audit compares the OPTIMIZED
plan of `df.groupBy().count()` — what bench.py's count() actually
executes — against the query's own optimized plan:

- if the count plan LOST Join/Window/Generate/Python-eval operators
  the raw plan has, count() eliminated real work → FAIL;
- if the count plan shrank to under 35% of the raw plan's text with
  no operator loss, the projection expressions were stripped (the
  text_quality class) → FAIL.

Queries in bench.py's FORCE map are exempt (their forcing aggregate
is the honest materializer by construction). Load-independent: only
plans are inspected, nothing executes.

Usage: python scripts/bench_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

_OPS = ("Join", "Window", "Generate", "EvalPython", "InPandas", "MapInPandas")

# Queries whose bench materializer is a hand-written forcing aggregate
# (bench.py FORCE map) — keep in sync; a query listed here but not
# forced in bench.py is exactly the drift this audit exists to catch,
# so the sync itself is asserted below.
FORCED = {
    "dedup_substring_coverage",
    "text_quality",
    "ts_gapfill_interpolate",
    "tpch_q1_pricing",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def main() -> int:
    import bench as bench_mod
    from panditya_spark.plans import QUERIES
    from panditya_spark.session import get_spark

    # FORCED must mirror bench.py: parse its source for the map keys.
    import inspect

    bench_src = inspect.getsource(bench_mod)
    for name in FORCED:
        if f'"{name}"' not in bench_src.split("FORCE = {", 1)[1]:
            print(f"FAIL {name}: in audit FORCED set but not bench FORCE map")
            return 1

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-audit")
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for name in bench_mod.HEADLINE:
        if name in FORCED:
            print(f"PASS {name}: forced materializer (exempt)")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query error {exc!r}"[:300])
            failures += 1
            continue
        raw = _plan(df)
        cnt = _plan(df.groupBy().count())
        lost = [
            op for op in _OPS if cnt.count(op) < raw.count(op)
        ]
        shrank = len(cnt) < 0.35 * len(raw)
        if lost:
            print(f"FAIL {name}: count() eliminates {lost}")
            failures += 1
        elif shrank:
            print(
                f"FAIL {name}: count() strips the projection "
                f"({len(cnt)} vs {len(raw)} plan chars)"
            )
            failures += 1
        else:
            print(f"PASS {name}: count() executes the full plan")
    print(f"\n{failures} bench-honesty failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
