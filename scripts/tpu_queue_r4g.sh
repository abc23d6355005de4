#!/bin/bash
# Round-4 TPU queue, phase 7: pose_from_views cross-category confirmation.
# Phase 6 measured airplane seeds 0/1 at 0.994/0.975 with flip_rate 0.0
# (baseline mean 0.527) — mechanism (f) eliminates the per-input mirror
# coin flip. This phase confirms on the flagship category (chair, 3
# seeds — regression check vs the shipped recipe's 0.981/0.688/1.000),
# the identifiability control (car_asym, 4 seeds — baseline mean 0.870
# with seed 1 at 0.56), and the mirror-symmetric negative control
# (plain car, 2 seeds — finding 5 predicts pfv CANNOT break a true
# silhouette mirror symmetry; measure whether the flip at least becomes
# per-object-consistent). Waits for phase 6 (pid in /tmp/r4f_queue.pid).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4f_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4f_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4g_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2; do
  timeout 1800 python scripts/pose_r2.py --tag r4_pfv_chair_s${seed} \
    --category chair --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > /tmp/r4_pfv_chair_s${seed}.log 2>&1
done

for seed in 0 1 2 3; do
  timeout 1800 python scripts/pose_r2.py --tag r4_pfv_car_asym_s${seed} \
    --category car_asym --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > /tmp/r4_pfv_car_asym_s${seed}.log 2>&1
done

for seed in 0 1; do
  timeout 1800 python scripts/pose_r2.py --tag r4_pfv_car_s${seed} \
    --category car --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > /tmp/r4_pfv_car_s${seed}.log 2>&1
done

echo QUEUE_R4G_DONE
