#!/bin/bash
# Round-5 TPU queue A. Order is decision-critical-first:
#   1. gsplat D=64 re-measurement through the SMEM-scalar x-loop bound
#      (a3b89bf) — VERDICT r4 item 1: the only landed-but-unverified code
#      at HEAD. --part2 --d64 hits the pallas kernel directly (the
#      gsplat_project guard is config-level, not kernel-level).
#   2. pfv x views_per_step=4 regression on car_asym s0-s2 — the r4l
#      queue already showed pfv4 REPAIRS the frame-locked seed s3
#      (0.519 -> 1.000, median 4.5 deg, flip 0) while the azimuth-anchor
#      composition made it worse (0.394). If s0-s2 hold, pfv4 is the
#      shipped car_asym recipe (4-seed mean ~0.99).
#   3. chair pfv s3 — uniform 4-seed protocol (VERDICT weak 3).
#   4. airplane pfv4 s0/s1 — no-regression check of the composition on a
#      category pfv already wins (VERDICT item 2's protocol).
#   5. car pfv s2/s3 — complete the plain-car 4-seed set for
#      car_pred_pose.yaml (VERDICT item 7); finding 5 predicts the
#      symmetry ceiling (raw ~0.49 / up-to-flip ~0.9) regardless.
# skip-if-artifact-exists makes re-running after a kill safe.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5a_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

if [ ! -f artifacts/gsplat_d64_r5.json ]; then
  timeout 3600 python scripts/time_gsplat.py --part2 --d64 \
    > /tmp/r5_gsplat_d64.log 2>&1
  echo "DONE gsplat_d64 rc=$?"
  grep '^{' /tmp/r5_gsplat_d64.log > artifacts/gsplat_d64_r5.json || true
else
  echo "SKIP gsplat_d64 (exists)"
fi

run () {  # run <tag> <category> <seed> [extra args...]
  local tag="$1" cat="$2" seed="$3"; shift 3
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  timeout 3600 python scripts/pose_r2.py --tag "$tag" \
    --category "$cat" --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views "$@" \
    --log-every 200 > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
}

run r5_pfv4_car_asym_s0 car_asym 0 --views-per-step 4
run r5_pfv4_car_asym_s1 car_asym 1 --views-per-step 4
run r5_pfv4_car_asym_s2 car_asym 2 --views-per-step 4
run r5_pfv_chair_s3 chair 3
run r5_pfv4_airplane_s0 airplane 0 --views-per-step 4
run r5_pfv4_airplane_s1 airplane 1 --views-per-step 4
run r5_pfv_car_s2 car 2
run r5_pfv_car_s3 car 3

echo QUEUE_R5A_DONE
