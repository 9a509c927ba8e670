#!/bin/bash
# Run g14 profile while sampling driver JVM stacks every 0.4s
python scripts/job_profile.py g14_scc /root/testdata/sf0.1 1 2>/dev/null > /root/repo/.stress/r17_g14_profile_quiet.txt &
PYPID=$!
sleep 45   # wait past session start + warm rep
JPID=$(pgrep -f "org.apache.spark.deploy.SparkSubmit" | head -1)
for i in $(seq 1 40); do
  jstack $JPID >> /root/repo/.stress/g14_jstacks.txt 2>/dev/null
  echo "=== SAMPLE $i ===" >> /root/repo/.stress/g14_jstacks.txt
  sleep 0.4
done
wait $PYPID
