#!/bin/bash
# Round-4 TPU queue, phase 5: cross-view consistency screening
# (mechanism e) — the mechanism motivated by the flip-resolver negative:
# the mirror gauge is a consistent per-input function on both heads, so
# it must be broken during training; two views of one model decoding to
# mirrored canonical clouds is directly punishable. Waits for phase 4.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4d_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4d_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4e_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2 3; do
  timeout 1500 python scripts/pose_r2.py --tag r4_consist_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --consistency-weight 1.0 \
    --log-every 200 > /tmp/r4_consist_airplane_s${seed}.log 2>&1
done

echo QUEUE_R4E_DONE
