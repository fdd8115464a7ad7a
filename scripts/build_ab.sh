#!/bin/bash
# A/B the build phase only: 3 reps each at forced widths
cd /root/repo
out=/tmp/build_ab_$(date +%s).log
for cpus in 32 16; do
  for rep in 1 2 3; do
    echo "=== cpus=$cpus rep=$rep ===" >> $out
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BUILD_ONLY=1 python3 bench.py 2>/dev/null | tail -1 >> $out
  done
done
echo DONE >> $out
echo $out
