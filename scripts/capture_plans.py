"""Capture `.explain("formatted")` for headline queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (guide §1: measure first; §7.2: read the
plan). Build-only: the DataFrame is constructed but NOT executed, so
this snapshots the pre-AQE plan shape (Exchange count, join strategy,
PushedFilters/ReadSchema, WholeStageCodegen spans, Python eval nodes).

Streaming queries (run_stream_to_memory) EXECUTE at build time and
return a memory-sink table whose plan is a trivial scan; they are
captured with a header note saying so — their evidence of record is
scripts/plan_metrics.py / the bench, not this snapshot.

Usage: python scripts/capture_plans.py r16 before [query ...]
       (no query list = the bench HEADLINE set)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING_NOTE = (
    "NOTE: this query runs a real micro-batch stream at build time; the\n"
    "DataFrame below is the memory-sink result table, so this snapshot\n"
    "shows the sink scan, not the streaming plan. Runtime evidence for\n"
    "streaming queries lives in the bench numbers and plan_metrics.\n\n"
)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from panditya_spark.plans import QUERIES
    from panditya_spark.session import get_spark

    if not names:
        names = list(HEADLINE)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            is_stream = "MemoryPlan" in text or name.startswith("stream_")
            with open(path, "w") as fh:
                fh.write(f"# {name} @ {sf_dir} ({suffix})\n\n")
                if is_stream:
                    fh.write(STREAMING_NOTE)
                fh.write(text)
            print(f"{name}: {len(text)} bytes -> {path}")
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            with open(path, "w") as fh:
                fh.write(f"# {name} @ {sf_dir} ({suffix})\nERROR: {exc!r}\n")
            print(f"{name}: ERROR {exc!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
