#!/bin/bash
# Round-4 TPU queue, session E3: decision-critical pfv confirmations first
# (time-boxed round). Order: car_asym s1 (the known mirror-split seed —
# does pfv break the per-input flip on the control category?), chair s0
# (flagship regression vs the shipped 0.981 recipe), car s0 (the
# mirror-symmetric NEGATIVE control — finding 5 predicts pfv cannot beat
# a true silhouette mirror symmetry), then the remaining seeds.
# 3600s per-run timeout (1800 was killed mid-run by CPU-contended datagen).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4k_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <category> <seed>
  if [ -f "artifacts/pose_r2_$1.json" ]; then echo "SKIP $1 (exists)"; return; fi
  timeout 3600 python scripts/pose_r2.py --tag "$1" \
    --category "$2" --seed "$3" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > "/tmp/$1.log" 2>&1
  echo "DONE $1 rc=$?"
}

run r4_pfv_car_asym_s1 car_asym 1
run r4_pfv_chair_s0 chair 0
run r4_pfv_car_s0 car 0
run r4_pfv_car_asym_s0 car_asym 0
run r4_pfv_chair_s1 chair 1
run r4_pfv_car_asym_s2 car_asym 2
run r4_pfv_car_asym_s3 car_asym 3
run r4_pfv_chair_s2 chair 2
run r4_pfv_car_s1 car 1

echo QUEUE_R4K_DONE
