"""Synthesize an sf1-scale stress dataset (VERDICT r8 #3): ten
key-shifted copies of the sf0.1 relational tables, written under
.stress/sf1/ (gitignored — only the measured ledger is committed).

Key spaces are offset consistently per copy (custkey/orderkey/partkey/
suppkey/nationkey/regionkey each by their own stride), so every
FK join — and therefore every derived graph — is preserved shard-for-
shard: the result is a 10x decade-up of nodes, edges, weak components
and SCCs with the same per-component structure, which is exactly the
volume axis the iterative-graph ledger wants to stress (round counts
should stay flat; per-round volume grows 10x).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from panditya_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".stress", "sf1")
COPIES = 10
# Per-key strides, comfortably above each key space's sf0.1 max.
STRIDE = {
    "custkey": 10**7, "orderkey": 10**9, "partkey": 10**7,
    "suppkey": 10**6, "nationkey": 25, "regionkey": 5,
    "dockey": 10**7, "veckey": 10**7,
    "eventkey": 10**9, "userkey": 10**5,
}
# table -> {column: key kind}
KEYS = {
    "region": {"r_regionkey": "regionkey"},
    "nation": {"n_nationkey": "nationkey", "n_regionkey": "regionkey"},
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": "nationkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey", "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    # The dedup/ANN decade: texts get a per-copy shard token appended
    # (verbatim clones would make every doc a 10-way exact-dup family
    # — legitimate but degenerate; one trailing token turns copies into
    # NEAR-duplicates, the regime the shingle/LSH machinery is built
    # for, while keeping everything deterministic). Embeddings stay
    # verbatim — identical vectors are exactly the always-co-cluster /
    # exact-top-k contract ANN and SemDeDup must honor at volume.
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
    # The streaming/timeseries decade (round 11, VERDICT r10 #4):
    # event ids and user ids shift per copy while the TIME RANGE stays
    # fixed, so every watermark window and session gap sees 10x the
    # concurrent keys and events — the state-store boundedness axis —
    # rather than a 10x-longer tail of idle windows.
    "events": {"event_id": "eventkey", "user_id": "userkey"},
}


def main() -> int:
    only = set(sys.argv[1:])  # optional table filter: incremental adds
    unknown = only - set(KEYS)
    if unknown:  # ADVICE r11: a typo must fail, not no-op "successfully"
        print(
            f"unknown table(s) {sorted(unknown)}; valid: {sorted(KEYS)}",
            file=sys.stderr,
        )
        return 2
    spark = get_spark("sf1-stress-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for table, keycols in KEYS.items():
        if only and table not in only:
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        shards = []
        for c in range(COPIES):
            sh = src
            for col, kind in keycols.items():
                sh = sh.withColumn(col, F.col(col) + F.lit(c * STRIDE[kind]))
            if table == "documents" and c > 0:
                sh = sh.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" shard{c}"))
                )
            shards.append(sh)
        out = shards[0]
        for sh in shards[1:]:
            out = out.unionByName(sh)
        if table == "events":
            # The streaming readers treat each part file as (up to) one
            # micro-batch; 8 parts gives a multi-batch decade run
            # without 32 near-empty triggers.
            out = out.coalesce(8)
        path = os.path.join(DST, f"{table}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"{table}: {spark.read.parquet(path).count()} rows", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
