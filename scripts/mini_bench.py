"""Min-of-N warm-rep timer for a subset of registry queries — the
round's A/B instrument (guide §1). One session, one warm rep
(uncounted), then N timed noop-sink reps per query; prints min/median
and the loadavg so a contaminated window is self-diagnosing.

r17: each rep additionally stamps the host's STEAL fraction over the
rep's own wall (from /proc/stat field 8) — on this firecracker guest,
CPU steal is the contention loadavg cannot see (r16 measured 3-5x
same-code swings at loadavg ~0), and per-rep steal makes a poisoned
draw self-identifying instead of indistinguishable from a regression.

Usage: python scripts/mini_bench.py q1 [q2 ...] [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stat() -> tuple[float, float]:
    """(total_jiffies, steal_jiffies) summed over all cpus."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [float(x) for x in f[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0.0


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
        steals = []
        for _ in range(reps):
            t_a, s_a = _stat()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            t_b, s_b = _stat()
            dt = max(t_b - t_a, 1.0)
            steals.append(round((s_b - s_a) / dt, 3))
        print(f"{name}: min={min(samples)} med={statistics.median(samples)} "
              f"raw={samples} steal={steals}")
    print(f"loadavg_end={os.getloadavg()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
