#!/bin/bash
cd /root/repo
for cfg in "merged:512:0" "chained:512:8" "chained:1024:8" "chained:2048:8" "chained:4096:8" "chained:4096:16"; do
  IFS=: read var b ch <<< "$cfg"
  echo "=== VARIANT=$var B=$b CHAIN=$ch ==="
  if [ "$var" = merged ]; then
    timeout 1200 python bench.py 2>&1 | tail -2
  else
    BENCH_VARIANT=$var BENCH_B=$b BENCH_CHAIN=$ch timeout 1200 python bench.py 2>&1 | tail -2
  fi
done
