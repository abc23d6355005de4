#!/bin/bash
# Round-4 TPU queue, phase 2 (gauge-lottery screening round 2).
#
# Phase-1 outcomes (artifacts/POSE_RESULTS.md findings 12-14): K=16 mean
# 0.575 (insufficient), full-quat anchor 0.217 (harmful — freezes
# elevation), student warmup 0.206 (harmful). The refined mechanism is
# the AZIMUTH-ONLY anchor (pose_anchor_mode="azimuth": penalize only the
# vertical-axis correction component so offsets keep owning their
# sectors while elevation/roll stay free), alone and combined with K=16.
#
# Waits for the phase-1 queue (pid in /tmp/r4_queue.pid) to drain first —
# one TPU chip, runs must serialize.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4b_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2 3; do
  timeout 1200 python scripts/pose_r2.py --tag r4_azanchor_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth \
    --log-every 200 > /tmp/r4_azanchor_airplane_s${seed}.log 2>&1
done

for seed in 0 1 2 3; do
  timeout 1800 python scripts/pose_r2.py --tag r4_azk16_airplane_s${seed} \
    --category airplane --seed ${seed} --k 16 --batch 8 --lr 1e-4 \
    --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth \
    --log-every 200 > /tmp/r4_azk16_airplane_s${seed}.log 2>&1
done

echo QUEUE_R4B_DONE
