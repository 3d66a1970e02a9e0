#!/bin/bash
# retry the north-star run until a healthy service window gives wall_s < 58
INTEG=${1:-rk2}
for i in $(seq 1 8); do
  timeout 590 python /root/repo/scratch/bench_1e8_r2.py "$INTEG" >> /root/repo/scratch/bench_1e8_r2.log 2>&1
  w=$(grep -o '"wall_s": [0-9.]*' /root/repo/scratch/results_1e8_r2.jsonl | tail -1 | grep -o '[0-9.]*')
  echo "attempt $i wall_s=$w"
  ok=$(python -c "print(1 if float('$w' or 999) < 58 else 0)")
  if [ "$ok" = "1" ]; then echo "TARGET MET"; exit 0; fi
  sleep 15
done
echo "no sub-58 run in 8 attempts"
