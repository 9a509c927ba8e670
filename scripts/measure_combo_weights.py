"""Re-measure every combo member's solo cost (Spark collect + DuckDB
oracle) at sf0.01 and print a fresh ``_WEIGHTS`` table for
plans/combo_queries.py — the runtime-balanced greedy split is only as
good as these numbers (VERDICT r7 #7: the round-6 table had drifted
2x on the heaviest members).

Usage: python scripts/measure_combo_weights.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    import duckdb

    from panditya_spark.plans import ORACLES, QUERIES
    from panditya_spark.plans.combo_queries import _MEMBERS
    from panditya_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("weights")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # One throwaway warm query so the first member doesn't absorb
    # session/codegen startup.
    QUERIES["a9_group_count"](spark, sf_dir).collect()

    weights: dict[str, float] = {}
    for name in sorted(_MEMBERS):
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).collect()
            con.execute(ORACLES[name]).fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        weights[name] = round(time.time() - t0, 2)
        print(f"measured {name}: {weights[name]}", file=sys.stderr)

    print("_WEIGHTS: dict[str, float] = {")
    for name in sorted(weights):
        print(f'    "{name}": {weights[name]},')
    print("}")
    heavy = {n: w for n, w in weights.items() if w > 5.0}
    if heavy:
        print(f"# members over 5s solo: {heavy}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
