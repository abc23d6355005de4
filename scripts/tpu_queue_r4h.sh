#!/bin/bash
# Round-4 TPU queue, phase 6+7 combined re-run (session D): the previous
# session's phase-6 pose_from_views artifacts were lost with the VM
# before commit (logs showed airplane s0/s1 at 0.994/0.975, flip_rate 0).
# Re-measure in priority order so partial completion still settles the
# headline question: (1) airplane x4 (target: seed MEAN >= 0.7 — the one
# unmet VERDICT r3 item), (2) car_asym s1 (the known mirror-split seed)
# + s0, (3) chair s0 regression vs the shipped 0.981 recipe, (4) the
# remaining confirmation seeds.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4h_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <category> <seed>
  timeout 1800 python scripts/pose_r2.py --tag "$1" \
    --category "$2" --seed "$3" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views \
    --log-every 200 > "/tmp/$1.log" 2>&1
  echo "DONE $1 rc=$?"
}

run r4_pfv_airplane_s0 airplane 0
run r4_pfv_airplane_s1 airplane 1
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

echo QUEUE_R4H_DONE
