"""A/B the round-15 hybrid support update in truss_decomposition
(VERDICT r14 #5): the FULL sf1 co-purchase decomposition with the
victim-keyed decrement enabled at the default gate (decrement_frac =
0.1 of alive triangles) versus forced-off (0.0 — the pure per-round
recount r13/r14 shipped). Same session, same pinned input, stats_out
attribution per arm (how many rounds each branch took, build/tail
split), so the crossover claim is a measured number either way.
Writes/merges .stress/ab_trussness_hybrid.json keyed by sf tag.

Usage: python scripts/ab_trussness_hybrid.py [sf_dir]
Env: STRESS_REPS (default 1) -> min-of-N per arm.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, ".stress", "ab_trussness_hybrid.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".stress", "sf1"
    )
    reps = max(1, int(os.environ.get("STRESS_REPS", "1")))

    from pyspark.sql import SparkSession, functions as F

    from panditya_spark.session import ensure_session_defaults

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ab-trussness-hybrid")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    spark.sparkContext.setLogLevel("ERROR")

    from panditya_spark.operators.graph import truss_decomposition

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    lp = li.select("l_orderkey", "l_partkey").distinct()
    x = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    y = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    e = (
        x.join(y, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )

    try:
        commit = subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "-C", ROOT, "status", "--porcelain",
             "--untracked-files=no", "--", ".", ":(exclude).stress"],
            capture_output=True, text=True, check=True,
        ).stdout.strip())
        if dirty:
            commit += "+dirty"
    except Exception:  # noqa: BLE001
        commit = "unknown"

    result = {"sf_dir": sf_dir, "commit": commit, "reps": reps,
              "estimator": f"min_of_{reps}"}
    checksum_ref = None
    for name, frac in (("recount_only", 0.0), ("hybrid_frac0.1", 0.1)):
        walls, best_stats = [], None
        checksum = None
        for _ in range(reps):
            stats: dict = {}
            t0 = time.time()
            out = truss_decomposition(e, decrement_frac=frac,
                                      stats_out=stats)
            # Exactness checksum: count + sum over the full labeling
            # (cheap agg; identical labelings agree, and a divergence
            # fails the arm loudly).
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("trussness").alias("s"),
            ).first()
            checksum = (row["n"], int(row["s"]))
            wall = round(time.time() - t0, 1)
            walls.append(wall)
            if best_stats is None or wall <= min(walls):
                best_stats = stats
        if checksum_ref is None:
            checksum_ref = checksum
        elif checksum != checksum_ref:
            raise RuntimeError(
                f"{name}: labeling checksum {checksum} != {checksum_ref}"
            )
        result[name] = {
            "wall_sec": min(walls), "walls": walls,
            "edges_and_trussness_sum": list(checksum),
            "stats": best_stats,
        }
        print(name, result[name], flush=True)
        # Incremental write per arm: a crash in a later arm must not
        # erase an earlier arm's evidence.
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        book = {}
        if os.path.exists(OUT):
            with open(OUT) as fh:
                book = json.load(fh)
        book[os.path.basename(sf_dir.rstrip("/"))] = result
        tmp = OUT + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(book, fh, indent=1)
        os.replace(tmp, OUT)
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
