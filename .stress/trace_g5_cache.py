import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql.classic.dataframe import DataFrame
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("trace"); spark.sparkContext.setLogLevel("ERROR")
fn = QUERIES["g5_connected_components"]
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
orig = DataFrame.localCheckpoint
def timed(self, eager=True):
    t0 = time.time(); out = orig(self, eager=eager); dt = time.time()-t0
    s = self._jdf.queryExecution().executedPlan().toString()
    print(f"ckpt {dt:6.3f}s imts={s.count('InMemoryTableScan')} scans={s.count('Scan parquet')}", flush=True)
    return out
DataFrame.localCheckpoint = timed
t0=time.time()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print(f"TOTAL {time.time()-t0:.2f}s")
