import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql.classic.dataframe import DataFrame
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("trace"); spark.sparkContext.setLogLevel("ERROR")
fn = QUERIES["g14_scc"]
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()  # warm

orig = DataFrame.localCheckpoint
def timed(self, eager=True):
    t0 = time.time()
    out = orig(self, eager=eager)
    dt = time.time() - t0
    n = out.rdd.getNumPartitions() if eager else -1
    print(f"ckpt eager={eager} {dt:6.3f}s parts={n}", flush=True)
    return out
DataFrame.localCheckpoint = timed
t0=time.time()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print(f"TOTAL {time.time()-t0:.2f}s")
