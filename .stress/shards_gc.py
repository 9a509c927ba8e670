import sys, time
sys.path.insert(0, "/root/repo")
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("ctx"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
def run(n): QUERIES[n](spark, sf).write.format("noop").mode("overwrite").save()
QUERIES["pipeline_training_shards"](spark, "/root/testdata/sf0.01").count()
for q in ["stream_record_high","mm_image_resize","dedup_substring_coverage","dedup_semantic","ann_pq_sq_topk"]:
    for _ in range(2): run(q)
store = spark._jsparkSession.sparkContext().statusStore()
it = store.jobsList(None).iterator(); last=0
while it.hasNext(): last=max(last, it.next().jobId())
t0=time.time(); run("pipeline_training_shards"); w=time.time()-t0
print(f"wall={w:.2f}")
sit = store.stageList(None).iterator()
rows=[]
while sit.hasNext():
    s = sit.next()
    try:
        sid = s.stageId()
        if s.firstTaskLaunchedTime().isDefined():
            rows.append((sid, s.executorRunTime()/1000.0, s.jvmGcTime()/1000.0,
                         s.executorCpuTime()/1e9, s.numCompleteTasks()))
    except Exception: pass
rows.sort(key=lambda r: -r[1])
print("top stages: (id, runTime_s, gcTime_s, cpuTime_s, tasks)")
for r in rows[:8]: print("  ", r)
