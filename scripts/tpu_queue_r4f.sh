#!/bin/bash
# Round-4 TPU queue, phase 6: pose_from_views screening (mechanism f) —
# the reference's shape-and-pose-from-DIFFERENT-views protocol. Every
# prior mechanism left (or worsened) the per-input mirror coin flip
# because the shape's and the pose's flip bits are computed from the
# SAME image; per-view poses make random view pairings punish any
# per-image gauge. Waits for phase 5 (pid in /tmp/r4e_queue.pid).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4e_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4e_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4f_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2 3; do
  timeout 1800 python scripts/pose_r2.py --tag r4_pfv_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > /tmp/r4_pfv_airplane_s${seed}.log 2>&1
done

echo QUEUE_R4F_DONE
