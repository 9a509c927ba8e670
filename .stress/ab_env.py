"""Paired same-session A/B flipping an env var between reps."""
import os, sys, time
sys.path.insert(0, "/root/repo")
def stat():
    f = open('/proc/stat').readline().split()
    v = [float(x) for x in f[1:]]
    return sum(v), v[7]
names = sys.argv[1].split(',')
var, aval, bval = sys.argv[2], sys.argv[3], sys.argv[4]
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
sf = sys.argv[6] if len(sys.argv) > 6 else "/root/testdata/sf0.1"
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("ab-env"); spark.sparkContext.setLogLevel("ERROR")
for name in names:
    fn = QUERIES[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    for arm, val in (("A", aval), ("B", bval)) * reps:
        os.environ[var] = val
        t0, s0 = time.time(), stat()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        w = time.time() - t0; s1 = stat()
        steal = (s1[1]-s0[1])/max(s1[0]-s0[0],1)
        print(f"{name} {arm}({var}={val}) wall={w:.3f} steal={steal:.3f}", flush=True)
