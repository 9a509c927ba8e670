"""Per-job wall-clock profile of one registry query (guide §1: measure
first). Runs the query into the noop sink, then dumps every Spark job
the run submitted — duration, stage count, task count — from the
driver's AppStatusStore, plus a summary: job count, summed job time vs
wall, top-10 jobs. This is how we tell a driver-loop-bound query
(many ~100ms jobs: fixed per-round cost dominates) from a data-bound
one (few jobs holding all the time).

Usage: python scripts/job_profile.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from panditya_spark.plans import QUERIES
    from panditya_spark.session import get_spark

    spark = get_spark("job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]

    # Warm reps (uncounted) absorb codegen/first-call costs so the
    # profiled rep measures the steady-state engine, mirroring bench.py.
    # reps=0 profiles the COLD first call instead.
    for _ in range(reps):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    store = spark._jsparkSession.sparkContext().statusStore()

    def _jobs():
        it = store.jobsList(None).iterator()
        while it.hasNext():
            yield it.next()

    before_ids = {j.jobId() for j in _jobs()}

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)

    jobs = []
    for j in _jobs():
        if j.jobId() in before_ids:
            continue
        try:
            dur = (
                j.completionTime().get().getTime()
                - j.submissionTime().get().getTime()
            ) / 1000.0
        except Exception:
            dur = float("nan")
        desc = j.description().isDefined() and j.description().get() or j.name()
        jobs.append((j.jobId(), dur, j.numTasks(), str(desc)[:100]))
    jobs.sort()
    total = sum(d for _, d, _, _ in jobs if d == d)
    print(f"query={name} wall={wall:.3f}s jobs={len(jobs)} "
          f"sum_job_time={total:.3f}s (gap={wall - total:.3f}s driver/plan)")
    for jid, dur, ntasks, desc in jobs:
        print(f"  job {jid:5d}  {dur:7.3f}s  tasks={ntasks:4d}  {desc}")
    print("top10 by duration:")
    for jid, dur, ntasks, desc in sorted(jobs, key=lambda x: -x[1])[:10]:
        print(f"  job {jid:5d}  {dur:7.3f}s  tasks={ntasks:4d}  {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
