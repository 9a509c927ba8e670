"""Min-of-N warm-rep timer for a subset of registry queries — the
round's A/B instrument (guide §1). One session, one warm rep
(uncounted), then N timed noop-sink reps per query; prints min/median
and the loadavg so a contaminated window is self-diagnosing.

Usage: python scripts/mini_bench.py q1 [q2 ...] [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 4
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from panditya_spark.plans import QUERIES
    from panditya_spark.session import get_spark

    print(f"loadavg_start={os.getloadavg()}")
    spark = get_spark("mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(samples)} med={statistics.median(samples)} "
              f"raw={samples}")
    print(f"loadavg_end={os.getloadavg()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
