import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql.classic.dataframe import DataFrame
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("trace"); spark.sparkContext.setLogLevel("ERROR")
q = sys.argv[1]
fn = QUERIES[q]
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()  # warm
orig = DataFrame.localCheckpoint
def timed(self, eager=True):
    t0 = time.time()
    out = orig(self, eager=eager)
    dt = time.time() - t0
    try:
        s = self._jdf.queryExecution().executedPlan().toString()
        joins = sorted({l.strip().split('(')[0].strip('+-: *') for l in s.splitlines() if 'Join' in l or 'Exchange' in l})
    except Exception as ex:
        joins = [f"err:{ex}"]
    print(f"ckpt {dt:6.3f}s  {joins}", flush=True)
    return out
DataFrame.localCheckpoint = timed
t0=time.time()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print(f"TOTAL {time.time()-t0:.2f}s")
