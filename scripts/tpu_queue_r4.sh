#!/bin/bash
# Round-4 TPU queue, phase 1 (VERDICT r3 items 1, 2, 4 + weak 2).
#
# Gauge-lottery mechanism screening (VERDICT item 1): each of the three
# mechanisms runs on airplane at the 4 baseline seeds (baseline acc@30 =
# {1.000, 0.256, 0.519, 0.331}, mean ~0.53, target mean >= 0.7):
#   (a) K=16 azimuth offsets         — denser flip coverage
#   (b) candidate re-anchoring       — pose_anchor_weight 1.0 decaying to 0
#                                      over the 20k sigma anneal
#   (c) student-loss warmup          — weight ramps 0 -> 5.0 over 10k steps
# Then: car_asym baseline seeds 2/3 (VERDICT weak 4), plain-car 80k
# (VERDICT item 4), gsplat dense fwd+bwd timing (weak 2), and the pallas
# gsplat showcase (item 2, 5400 s).
#
# Every step is timeout-bounded (worker crashes surface as hangs); a step
# failing does not stop the queue. Winner-on-car_asym runs are phase 2,
# queued after reading the screening artifacts.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

# worker probe: backend init hangs (not errors) on a wedged worker
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

for seed in 0 1 2 3; do
  timeout 1800 python scripts/pose_r2.py --tag r4_k16_airplane_s${seed} \
    --category airplane --seed ${seed} --k 16 --batch 8 --lr 1e-4 \
    --log-every 200 > /tmp/r4_k16_airplane_s${seed}.log 2>&1
done

for seed in 0 1 2 3; do
  timeout 1200 python scripts/pose_r2.py --tag r4_anchor_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --anchor-weight 1.0 --anchor-steps 20000 \
    --log-every 200 > /tmp/r4_anchor_airplane_s${seed}.log 2>&1
done

for seed in 0 1 2 3; do
  timeout 1200 python scripts/pose_r2.py --tag r4_swarm_airplane_s${seed} \
    --category airplane --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --student-warmup 10000 \
    --log-every 200 > /tmp/r4_swarm_airplane_s${seed}.log 2>&1
done

for seed in 2 3; do
  timeout 1200 python scripts/pose_r2.py --tag r4_base_car_asym_s${seed} \
    --category car_asym --seed ${seed} --k 8 --batch 8 --lr 1e-4 \
    --log-every 200 > /tmp/r4_base_car_asym_s${seed}.log 2>&1
done

# plain car, long schedule (80k steps, anneal scaled to keep the
# coarse-sigma fraction of the 40k recipe)
timeout 2400 python scripts/pose_r2.py --tag r4_car_80k \
  --category car --k 8 --batch 8 --lr 1e-4 --steps 80000 --anneal 20000 \
  --log-every 200 > /tmp/r4_car_80k.log 2>&1

timeout 3600 python scripts/time_gsplat.py --part2 \
  > /tmp/r4_time_gsplat.log 2>&1

timeout 5400 python scripts/gsplat_showcase.py --impl pallas \
  --tag pallas --log-every 200 > /tmp/r4_showcase_pallas.log 2>&1

echo QUEUE_DONE
