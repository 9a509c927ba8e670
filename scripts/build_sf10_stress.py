"""Synthesize the SECOND-decade stress tier (VERDICT r12 #1): ten
key-shifted copies of the .stress/sf1 tables — lineitem/orders/events
only, the tables behind the five highest-ratio headline rows whose
sf0.1→sf1 growth is not output- or CPU-bound by construction — written
under .stress/sf10/ (gitignored; only the measured ledger rows are
committed).

Same construction discipline as build_sf1_stress.py: key spaces shift
consistently per copy so every FK join (and the derived co-purchase
graph) is preserved shard-for-shard — a 100x decade-up of sf0.1 with
identical per-component structure. Events keep the FIXED time range
while event/user ids shift, so watermark windows and session gaps see
100x the concurrent keys — the state-boundedness axis at the scale
where the native session window's sf1 242k-row state peak becomes
~2.4M rows (VERDICT r12 #5).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from panditya_spark.session import get_spark

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_ROOT, ".stress", "sf1")
DST = os.path.join(_ROOT, ".stress", "sf10")
COPIES = 10
# Per-key strides: 10x the sf1 strides, clearing sf1's whole key space
# (sf1 max = 9 x sf1-stride + sf0.1 max < 10 x sf1-stride).
STRIDE = {
    "custkey": 10**8,
    "nationkey": 250,
    "orderkey": 10**10,
    "partkey": 10**8,
    "suppkey": 10**7,
    "eventkey": 10**10,
    "userkey": 10**6,
    "dockey": 10**8,
    "veckey": 10**8,
}
KEYS = {
    # customer: tpch_q18 and the key-chain graph (g8 pagerank) join it;
    # nationkey continues sf1's per-copy shift (25/copy there -> 250
    # clears sf1's 0..249 space) so the N->C graph keeps its 10x-shards
    # structure without needing a nation table at this tier.
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    # documents: dedup_minhash_lsh is one of the five probe rows. The
    # sf1 build turned copies into NEAR-duplicates with a ' shardC'
    # suffix; the second decade appends a distinct ' deckC' token so
    # sf10 copies of sf1 copies stay pairwise near- (not exact-) dups.
    "documents": {"doc_id": "dockey"},
    # embeddings (round 14, VERDICT r13 #4): vec ids shift per copy
    # with the VECTORS verbatim, continuing the sf1 discipline —
    # identical vectors at shifted ids are exactly the always-pair /
    # always-co-cluster contract SemDeDup and cosine near-dup must
    # honor at volume, so the sf10 outputs stay output-bound by
    # construction (10 clone decks) like the documents near-dups.
    "embeddings": {"vec_id": "veckey"},
}


def main() -> int:
    only = set(sys.argv[1:])  # optional table filter: incremental adds
    unknown = only - set(KEYS)
    if unknown:  # a typo must fail, not no-op "successfully"
        print(
            f"unknown table(s) {sorted(unknown)}; valid: {sorted(KEYS)}",
            file=sys.stderr,
        )
        return 2
    if not os.path.isdir(SRC):
        print(
            "run scripts/build_sf1_stress.py first (.stress/sf1 missing)",
            file=sys.stderr,
        )
        return 2
    spark = get_spark("sf10-stress-build")
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
                    "text", F.concat(F.col("text"), F.lit(f" deck{c}"))
                )
            shards.append(sh)
        out = shards[0]
        for sh in shards[1:]:
            out = out.unionByName(sh)
        if table == "events":
            # One part ~= one micro-batch for the streaming readers;
            # 16 parts keeps the decade run multi-batch without dozens
            # of near-empty triggers. (read_events_stream re-splits
            # directory tables into event-time ranges anyway.)
            out = out.coalesce(16)
        path = os.path.join(DST, f"{table}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"{table}: {spark.read.parquet(path).count()} rows", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
