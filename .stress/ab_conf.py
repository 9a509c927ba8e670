"""Paired same-session A/B: run queries at default conf, then with
runtime conf overrides, alternating, with per-rep steal stamps."""
import os, sys, time
sys.path.insert(0, "/root/repo")

def stat():
    f = open('/proc/stat').readline().split()
    v = [float(x) for x in f[1:]]
    return sum(v), v[7]

names = sys.argv[1].split(',')
confs = {}  # e.g. "spark.sql.shuffle.partitions=4,..."
for kv in sys.argv[2].split(';'):
    k, v = kv.split('=', 1); confs[k] = v
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sf = "/root/testdata/sf0.1"
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("ab-conf"); spark.sparkContext.setLogLevel("ERROR")
defaults = {k: spark.conf.get(k, None) for k in confs}
print("defaults:", defaults)
for name in names:
    fn = QUERIES[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    for arm, cset in (("A", defaults), ("B", confs)) * reps:
        for k, v in cset.items():
            if v is not None: spark.conf.set(k, v)
        t0, s0 = time.time(), stat()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        w = time.time() - t0; s1 = stat()
        steal = (s1[1]-s0[1])/max(s1[0]-s0[0],1)
        print(f"{name} {arm} wall={w:.3f} steal={steal:.3f}", flush=True)
        for k, v in defaults.items():
            if v is not None: spark.conf.set(k, v)
