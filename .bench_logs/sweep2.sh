#!/bin/bash
cd /root/repo
for cfg in "512:8" "1024:8" "2048:8" "4096:8" "4096:16" "2048:4"; do
  IFS=: read b ch <<< "$cfg"
  echo "=== chained B=$b CHAIN=$ch ==="
  BENCH_VARIANT=chained BENCH_B=$b BENCH_CHAIN=$ch timeout 1800 python bench.py 2>&1 | grep -E '"metric"|unavailable|Mosaic|RESOURCE' | head -3
done
