#!/bin/bash
# Round-4 TPU queue, session E2 (3600s per-run timeout — car_asym s1 lost ~24 min to CPU-contended datagen/compile and was killed mid-run at 1800s): resume the r4h pose_from_views sweep from
# where the previous VM died (airplane s0/s1 committed: 0.994/0.975,
# flip_rate 0). Priority order unchanged: finish airplane (seed MEAN is
# the VERDICT r3 item-1 target), then car_asym (s1 is the known
# mirror-split seed), chair regression check, negative-control car.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4i_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <category> <seed>
  if [ -f "artifacts/pose_r2_$1.json" ]; then echo "SKIP $1 (exists)"; return; fi
  timeout 3600 python scripts/pose_r2.py --tag "$1" \
    --category "$2" --seed "$3" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > "/tmp/$1.log" 2>&1
  echo "DONE $1 rc=$?"
}

run r4_pfv_airplane_s2 airplane 2
run r4_pfv_airplane_s3 airplane 3
run r4_pfv_car_asym_s1 car_asym 1
run r4_pfv_car_asym_s0 car_asym 0
run r4_pfv_chair_s0 chair 0
run r4_pfv_chair_s1 chair 1
run r4_pfv_car_asym_s2 car_asym 2
run r4_pfv_car_asym_s3 car_asym 3
run r4_pfv_car_s0 car 0
run r4_pfv_chair_s2 chair 2
run r4_pfv_car_s1 car 1

echo QUEUE_R4I_DONE
