"""k-truss incidence-build A/B (VERDICT r11 #2): measure the round-11
degree-ordered (compact-forward) triangle_incidence against the
pre-rewrite ordered-join build on identical input, one quiet session,
UI enabled — wall-clock AND stage shuffle-write totals (the
load-independent signal) per variant per tier.

The OLD variant below is copied verbatim from git history
(6d7a79b~1:panditya_spark/operators/graph.py, the pre-rewrite
triangle_incidence) purely as the A/B baseline; the shipped code is the
degree-ordered build in operators/graph.py.

Both variants are warmed at sf0.001 before any timed run; each timed
phase brackets its own UI shuffle snapshot. Results append to
.stress/ab_ktruss.json with commit provenance.

Usage: python scripts/ab_ktruss.py [sf0.1-reps sf1-reps]  (default 2 1)
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

SF0001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".stress", "sf1")
OUT = os.path.join(ROOT, ".stress", "ab_ktruss.json")


def old_triangle_incidence(e, broadcast_close=False):
    """Pre-rewrite build (6d7a79b~1): ordered two-equi-join on the
    shared middle vertex + LEFT-SEMI closing probe, id-ordered (a<b<c)
    with no degree orientation — wedges fan out from EVERY vertex's
    full forward adjacency. Adapted to the round-12 incidence contract
    (compact ``tri`` id, optional broadcast close) so the A/B isolates
    the ORIENTATION alone; the r12 pre-adaptation run is preserved in
    .stress/ab_ktruss.json."""
    from pyspark.sql import functions as F

    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    closing = ac
    if broadcast_close:
        closing = F.broadcast(ac)
    tri = e.join(bc, "b").join(
        closing,
        (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        "left_semi",
    ).select(F.monotonically_increasing_id().alias("tri"), "a", "b", "c")
    return tri.select(
        "tri",
        F.explode(
            F.array(
                F.struct(F.col("a").alias("ea"), F.col("b").alias("eb")),
                F.struct(F.col("b").alias("ea"), F.col("c").alias("eb")),
                F.struct(F.col("a").alias("ea"), F.col("c").alias("eb")),
            )
        ).alias("ed"),
    ).select("tri", F.col("ed.ea").alias("ea"), F.col("ed.eb").alias("eb"))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _shuffle_snapshot(base: str) -> dict:
    app = _rest(base, "applications")[0]["id"]
    stages = _rest(base, f"applications/{app}/stages?status=COMPLETE")
    return {
        "write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def main() -> int:
    reps01 = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps1 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if reps01 < 1 or reps1 < 1:
        raise SystemExit("reps must be >= 1 (min() over zero samples)")

    from pyspark.sql import SparkSession

    from panditya_spark.session import ensure_session_defaults

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ab-ktruss")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    from panditya_spark.operators import graph
    from panditya_spark.plans import QUERIES

    new_build = graph.triangle_incidence
    variants = {"old_ordered_join": old_triangle_incidence,
                "new_degree_ordered": new_build}
    fn = QUERIES["g17_ktruss"]

    def mat(sf_dir):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm both variants' join shapes at the smallest tier.
    for build in variants.values():
        graph.triangle_incidence = build
        mat(SF0001)

    try:
        commit = subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        commit = "unknown"
    result = {"commit": commit, "loadavg_start": list(os.getloadavg()),
              "reps": {"sf0.1": reps01, "sf1": reps1}, "phases": {}}

    for tier, sf_dir, reps in (("sf0.1", SF01, reps01), ("sf1", SF1, reps1)):
        for name, build in variants.items():
            graph.triangle_incidence = build
            samples = []
            shuffle_mb = None
            for i in range(reps):
                before = _shuffle_snapshot(ui) if i == 0 else None
                t0 = time.time()
                mat(sf_dir)
                samples.append(round(time.time() - t0, 1))
                if i == 0:
                    after = _shuffle_snapshot(ui)
                    shuffle_mb = {
                        "shuffle_write_mb": round(
                            (after["write"] - before["write"]) / 2**20, 1),
                        "shuffle_read_mb": round(
                            (after["read"] - before["read"]) / 2**20, 1),
                    }
            phase = {"sec_min": min(samples), "sec_raw": samples, **shuffle_mb}
            result["phases"][f"{tier}:{name}"] = phase
            print(f"{tier} {name}: {phase}", flush=True)
            spark.catalog.clearCache()

    graph.triangle_incidence = new_build
    result["loadavg_end"] = list(os.getloadavg())
    history = []
    if os.path.exists(OUT):
        history = json.load(open(OUT))
    history.append(result)
    # Serialize FIRST, then atomically rename into place: a truncating
    # json.dump(open(OUT, 'w')) destroys the entire prior A/B history
    # the moment serialization (or the process) fails mid-write.
    payload = json.dumps(history, indent=1)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, OUT)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
