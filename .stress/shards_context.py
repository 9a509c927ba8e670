import sys, time, os
sys.path.insert(0, "/root/repo")
def stat():
    f = open('/proc/stat').readline().split(); v=[float(x) for x in f[1:]]
    return sum(v), v[7]
from panditya_spark.plans import QUERIES
from panditya_spark.session import get_spark
spark = get_spark("ctx"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
PRE = ["cdc_merge_upsert","s_dpp_join","ts_gapfill_interpolate","a_winsorize_clip",
       "dq_constraint_report","stream_record_high","mm_image_resize",
       "dedup_substring_coverage"]
def run(n):
    QUERIES[n](spark, sf).write.format("noop").mode("overwrite").save()
# shards warm (like bench warmup does at sf0.001+sf0.01)
QUERIES["pipeline_training_shards"](spark, "/root/testdata/sf0.001").count()
QUERIES["pipeline_training_shards"](spark, "/root/testdata/sf0.01").count()
for i in range(3):
    t0=time.time(); run("pipeline_training_shards"); print(f"shards pre-context rep{i}: {time.time()-t0:.2f}", flush=True)
for q in PRE:
    for _ in range(3):
        run(q)
    print(f"ran {q}", flush=True)
store = spark._jsparkSession.sparkContext().statusStore()
def jobs_after(jid0):
    it = store.jobsList(None).iterator(); out=[]
    while it.hasNext():
        j=it.next()
        if j.jobId()>jid0:
            try: dur=(j.completionTime().get().getTime()-j.submissionTime().get().getTime())/1000.0
            except Exception: dur=float('nan')
            out.append((j.jobId(),dur,j.numTasks()))
    return sorted(out)
it = store.jobsList(None).iterator(); last=0
while it.hasNext(): last=max(last, it.next().jobId())
for i in range(3):
    t0, s0 = time.time(), stat()
    run("pipeline_training_shards")
    s1=stat(); w=time.time()-t0
    steal=(s1[1]-s0[1])/max(s1[0]-s0[0],1)
    js = jobs_after(last)
    last = max(j for j,_,_ in js) if js else last
    tot = sum(d for _,d,_ in js if d==d)
    print(f"shards in-context rep{i}: wall={w:.2f} steal={steal:.3f} jobs={len(js)} sumjob={tot:.2f}", flush=True)
    for j,d,t in sorted(js, key=lambda x:-x[1])[:5]:
        print(f"   job {j} {d:.2f}s tasks={t}", flush=True)
