import cProfile, pstats, sys, os, io, time
sys.path.insert(0, "/root/repo")
name = sys.argv[1]; sf = sys.argv[2] if len(sys.argv)>2 else "/root/testdata/sf0.1"
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("pyprof"); spark.sparkContext.setLogLevel("ERROR")
fn = QUERIES[name]
fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
pr = cProfile.Profile()
t0=time.time()
pr.enable()
fn(spark, sf).write.format("noop").mode("overwrite").save()
pr.disable()
print(f"wall={time.time()-t0:.2f}")
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(40)
print(s.getvalue())
s2 = io.StringIO()
ps2 = pstats.Stats(pr, stream=s2).sort_stats("tottime")
ps2.print_stats(25)
print(s2.getvalue())
