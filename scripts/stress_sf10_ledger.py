"""Second-decade stress ledger (VERDICT r12 #1/#5): run queries once
warm at sf0.1, then at the sf1 and sf10 synthesized tiers
(scripts/build_sf1_stress.py / build_sf10_stress.py), recording
wall-clock, job count, and shuffle volume per query — the sf1→sf10
ratio distinguishes "amortizing" from "about to turn super-linear" for
the rows whose sf0.1→sf1 growth was not output- or CPU-bound by
construction. Streaming rows capture peak state-store rows/bytes, the
boundedness evidence at 100x keys.

Same provenance discipline as stress_sf1_ledger.py (commit/reps/
estimator per row; incremental append to .stress/ledger_sf10.json).

Usage:
  python scripts/stress_sf10_ledger.py [query ...]   # default: verdict set
Env: STRESS_REPS (default 1) -> min-of-N per tier.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".stress", "sf1")
SF10 = os.path.join(ROOT, ".stress", "sf10")
OUT = os.path.join(ROOT, ".stress", "ledger_sf10.json")

# The five highest-ratio non-output-bound headline rows from the sf1
# ledger (VERDICT r12 #1) + the stateful streaming families at 100x
# keys (#5).
ORDER = [
    "tpch_q18_large_orders",
    "g8_pagerank_topk",
    "dedup_minhash_lsh",
    "g17_ktruss",
    "stream_tumbling_microbatch",
    "stream_sessionize_microbatch",
    "stream_session_window_native",
    "stream_record_high",
]


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:4040/api/v1/{path}", timeout=10
    ) as r:
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


def _state_store_peak() -> dict | None:
    from panditya_spark.streaming import windows

    rows_peak = mem_peak = n_batches = 0
    for progresses in windows.LAST_PROGRESS.values():
        n_batches = max(n_batches, len(progresses))
        for p in progresses:
            for op in p.get("stateOperators") or []:
                rows_peak = max(rows_peak, op.get("numRowsTotal") or 0)
                mem_peak = max(mem_peak, op.get("memoryUsedBytes") or 0)
    if not (rows_peak or mem_peak):
        return None
    return {
        "state_rows_peak": rows_peak,
        "state_mem_mb_peak": round(mem_peak / 2**20, 1),
        "n_batches": n_batches,
    }


class _ScratchPeak:
    """Peak scratch-disk growth during a timed query (VERDICT r14 #6:
    the sf10 k-truss run's 29.9 GB shuffle write needs a measured
    margin against sandbox capacity). Samples shutil.disk_usage of
    the Spark local dir's filesystem every 2s; peak = max(used -
    baseline) — shuffle/spill scratch plus anything else on the fs,
    an upper bound on the query's own footprint."""

    def __init__(self, path: str = "/tmp"):
        import shutil
        import threading

        self._shutil = shutil
        self.path = path
        self.base = shutil.disk_usage(path).used
        self.free_at_start = shutil.disk_usage(path).free
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while not self._stop.wait(2.0):
            used = self._shutil.disk_usage(self.path).used
            self.peak = max(self.peak, used - self.base)

    def finish(self) -> dict:
        self._stop.set()
        self._t.join(timeout=5)
        return {
            "scratch_peak_mb": round(self.peak / 2**20, 1),
            "fs_free_at_start_mb": round(self.free_at_start / 2**20, 1),
        }


def _drain_scratch(spark) -> None:
    """Between the sf1 and sf10 legs of one row: unpin caches and give
    ContextCleaner a GC cycle so the sf1 leg's shuffle files and
    localCheckpoint blocks are actually DELETED before the sf10 leg
    measures its own scratch footprint. Without this, a shuffle-heavy
    query's sf1 residue (tens of GB for g17_ktruss) stays on disk for
    the whole app lifetime and eats the sf10 leg's headroom — the
    second ENOSPC mode the round-15 g17 row hit after the in-query
    exchange gate had already closed the first."""
    import gc
    import time as _time

    spark.catalog.clearCache()
    gc.collect()  # drop Python-side DataFrame refs -> JVM refs
    try:
        spark.sparkContext._jvm.System.gc()  # ContextCleaner wakes on GC
        _time.sleep(5)  # let async shuffle/RDD deletions land on disk
    except Exception:  # noqa: BLE001 — hygiene only, never fail the row
        pass


def _prep(spark, sf_dir: str) -> None:
    try:
        from panditya_spark.plans.streaming_queries import _upsert_stream_input

        _upsert_stream_input(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"stream-input prep failed ({sf_dir}): {exc!r}", file=sys.stderr)


def main() -> int:
    from pyspark.sql import SparkSession

    from panditya_spark.session import ensure_session_defaults

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("sf10-stress-ledger")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    from panditya_spark.plans import QUERIES
    from panditya_spark.streaming import windows

    names = sys.argv[1:] or ORDER
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    for d in (SF1, SF10):
        if not os.path.isdir(d):
            print(f"missing stress tier {d}: run its build script first",
                  file=sys.stderr)
            return 2

    try:
        commit = subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            # Dirty == measured CODE differs from the named commit;
            # the tracked .stress/ ledger artifacts a prior session
            # rewrote don't count (see stress_sf1_ledger.py).
            ["git", "-C", ROOT, "status", "--porcelain",
             "--untracked-files=no", "--", ".", ":(exclude).stress"],
            capture_output=True, text=True, check=True,
        ).stdout.strip())
        if dirty:
            commit += "+dirty"
    except Exception:  # noqa: BLE001
        commit = "unknown"
    reps = max(1, int(os.environ.get("STRESS_REPS", "1")))

    ledger = {}
    if os.path.exists(OUT):
        ledger = json.load(open(OUT))

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    if any(n.startswith("stream_") for n in names):
        _prep(spark, SF1)
        _prep(spark, SF10)

    for name in names:
        fn = QUERIES[name]
        row = {"commit": commit, "reps": reps, "estimator": f"min_of_{reps}"}
        try:
            mat(fn(spark, SF01))  # warm
            row["sf1_sec"] = round(
                min(_timed(mat, fn, spark, SF1) for _ in range(reps)), 1
            )
            _drain_scratch(spark)
            before = _metrics_snapshot()
            windows.LAST_PROGRESS.clear()
            scratch = _ScratchPeak()
            sf10_samples = [_timed(mat, fn, spark, SF10)]
            row.update(
                {f"sf10_{k}": v for k, v in scratch.finish().items()}
            )
            after = _metrics_snapshot()
            sf10_samples += [
                _timed(mat, fn, spark, SF10) for _ in range(reps - 1)
            ]
            row["sf10_sec"] = round(min(sf10_samples), 1)
            row["sf10_jobs"] = after["n_jobs"] - before["n_jobs"]
            row["sf10_shuffle_write_mb"] = round(
                (after["shuffle_write"] - before["shuffle_write"]) / 2**20, 1
            )
            row["sf10_shuffle_read_mb"] = round(
                (after["shuffle_read"] - before["shuffle_read"]) / 2**20, 1
            )
            row["ratio"] = round(row["sf10_sec"] / max(row["sf1_sec"], 0.1), 1)
            if name.startswith("stream_"):
                peak = _state_store_peak()
                if peak:
                    row.update(peak)
        except Exception as exc:  # noqa: BLE001 — keep the partial ledger
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
        spark.catalog.clearCache()
        ledger[name] = row
        payload = json.dumps(ledger, indent=1)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, OUT)
        print(name, row, flush=True)
    return 0


def _timed(mat, fn, spark, sf_dir) -> float:
    t0 = time.time()
    mat(fn(spark, sf_dir))
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
