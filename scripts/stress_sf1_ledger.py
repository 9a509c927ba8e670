"""sf1 iterative-graph stress ledger (VERDICT r8 #3): run the
iterative-graph family once warm at sf0.1 and once at the synthesized
sf1 decade (scripts/build_sf1_stress.py), recording wall-clock, the
job count (the round-count proxy: one Spark job per materialized loop
round/probe), and shuffle read/write volume per query from the UI
REST API. Results append incrementally to .stress/ledger_sf1.json so
a long tail operator can't lose the earlier rows.

Usage: python scripts/stress_sf1_ledger.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".stress", "sf1")
OUT = os.path.join(ROOT, ".stress", "ledger_sf1.json")

ORDER = [
    "g5_connected_components",
    "g14_scc",
    "g8_pagerank_topk",
    "g16_hits_topk",
    "g18_weighted_sssp",
    "g15_kcore",
    "g17_ktruss",
]


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _metrics_snapshot():
    try:
        app = _rest("applications")[0]["id"]
        stages = _rest(f"applications/{app}/stages?status=COMPLETE")
        jobs = _rest(f"applications/{app}/jobs")
        return {
            "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "n_jobs": len(jobs),
        }
    except Exception as exc:  # noqa: BLE001 — metrics are best-effort
        print(f"rest metrics unavailable: {exc!r}", file=sys.stderr)
        return {"shuffle_write": 0, "shuffle_read": 0, "n_jobs": 0}


def main() -> int:
    from pyspark.sql import SparkSession

    from panditya_spark.session import ensure_session_defaults

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("sf1-stress-ledger")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    from panditya_spark.plans import QUERIES

    names = sys.argv[1:] or ORDER
    ledger = {}
    if os.path.exists(OUT):
        ledger = json.load(open(OUT))

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        fn = QUERIES[name]
        row = {}
        # warm at the smallest tier, then time sf0.1 in-session for the
        # like-for-like decade ratio.
        try:
            mat(fn(spark, "/root/testdata/sf0.001"))
            t0 = time.time()
            mat(fn(spark, SF01))
            row["sf01_sec"] = round(time.time() - t0, 1)
            before = _metrics_snapshot()
            t0 = time.time()
            mat(fn(spark, SF1))
            row["sf1_sec"] = round(time.time() - t0, 1)
            after = _metrics_snapshot()
            row["sf1_jobs"] = after["n_jobs"] - before["n_jobs"]
            row["sf1_shuffle_write_mb"] = round(
                (after["shuffle_write"] - before["shuffle_write"]) / 2**20, 1
            )
            row["sf1_shuffle_read_mb"] = round(
                (after["shuffle_read"] - before["shuffle_read"]) / 2**20, 1
            )
            row["ratio"] = round(row["sf1_sec"] / max(row["sf01_sec"], 0.1), 1)
        except Exception as exc:  # noqa: BLE001 — keep the partial ledger
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
        ledger[name] = row
        json.dump(ledger, open(OUT, "w"), indent=1)
        print(name, row, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
