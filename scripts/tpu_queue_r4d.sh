#!/bin/bash
# Round-4 TPU queue, phase 4: soft-min annealing screening (mechanism d)
# — the one mechanism aimed directly at the per-input mirror coin flip
# (every failing run measures flip_rate ~0.5; POSE_RESULTS finding 12).
# Waits for phase 3 (pid in /tmp/r4c_queue.pid).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4c_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4c_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4d_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2 3; do
  timeout 1200 python scripts/pose_r2.py --tag r4_softmin_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --softmin-temp 1.0 --softmin-steps 20000 \
    --log-every 200 > /tmp/r4_softmin_airplane_s${seed}.log 2>&1
done

echo QUEUE_R4D_DONE
