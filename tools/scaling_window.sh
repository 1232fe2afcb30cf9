#!/bin/bash
# One full scaling-evidence window: kernel 1+4 exec, JVM control 1+4 exec.
cd /root/repo
TS=$(date +%H:%M:%S)
echo "=== window $TS load $(cat /proc/loadavg | cut -d' ' -f1)" >> /tmp/pairs.log
for leg in "1 4" "4 16"; do
  set -- $leg
  spark-submit --master "local-cluster[$1,4,8192]" --conf spark.sql.shuffle.partitions=$2 \
    --py-files dist/ccspark.zip tools/scaling_kernel.py 4000000 3 2>/dev/null \
    | grep KERNEL_RESULT | sed "s/^/E$1 /" >> /tmp/pairs.log
done
for leg in "1 4" "4 16"; do
  set -- $leg
  spark-submit --master "local-cluster[$1,4,8192]" --conf spark.sql.shuffle.partitions=$2 \
    tools/jvm_control.py 200000000 3 2>/dev/null \
    | grep CONTROL_RESULT | sed "s/^/E$1 /" >> /tmp/pairs.log
done
echo "=== end $(date +%H:%M:%S) load $(cat /proc/loadavg | cut -d' ' -f1)" >> /tmp/pairs.log
