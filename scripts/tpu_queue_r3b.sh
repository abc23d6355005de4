#!/bin/bash
# Round-3b TPU window queue (run when the worker recovers; see NOTES.md
# worker note). Ordered: health/bench first (validates the worker and
# pre-compiles the new gsplat-pallas shape for the driver), then the
# cheap pose science runs, then kernel timing sweeps, then the long
# showcase. Each step logs to /tmp/r3b_*.log; a step failing does not
# stop the queue (worker crashes surface as hangs — every step is
# timeout-bounded).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 2400 python bench.py > /tmp/r3b_bench.log 2>&1

timeout 1200 python scripts/pose_r2.py --tag car_asym_silonly_b8 \
  --category car_asym --k 8 --batch 8 --lr 1e-4 --log-every 200 \
  > /tmp/r3b_pose_car_asym.log 2>&1

timeout 1200 python scripts/pose_r2.py --tag car_asym_silonly_b8_s1 \
  --category car_asym --seed 1 --k 8 --batch 8 --lr 1e-4 --log-every 200 \
  > /tmp/r3b_pose_car_asym_s1.log 2>&1

timeout 1200 python scripts/pose_r2.py --tag car_silonly_b8_s2 \
  --category car --seed 2 --k 8 --batch 8 --lr 1e-4 --log-every 200 \
  > /tmp/r3b_pose_car_s2.log 2>&1

timeout 1200 python scripts/pose_r2.py --tag car_silonly_b8_s3 \
  --category car --seed 3 --k 8 --batch 8 --lr 1e-4 --log-every 200 \
  > /tmp/r3b_pose_car_s3.log 2>&1

timeout 3600 python scripts/time_gsplat.py --part2 \
  > /tmp/r3b_time_gsplat.log 2>&1

timeout 5400 python scripts/gsplat_showcase.py --impl pallas \
  --tag pallas --log-every 200 > /tmp/r3b_showcase_pallas.log 2>&1

echo QUEUE_DONE
