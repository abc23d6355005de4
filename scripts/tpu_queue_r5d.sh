#!/bin/bash
# Round-5 TPU queue D: everything queues B/C still owed after the VM
# hosting them died (fresh box 2026-08-20; /tmp artifacts lost, repo
# artifacts intact). Decision-critical first:
#   1. pfv4 chair s3 — does views_per_step=4 repair the chair frame-lock
#      (finding 19: acc 0.438, up-to-flip 0.456) the way it repaired
#      car_asym s3 (finding 18: 0.519 -> 1.000)?
#   2. pfv4 chair s0 — regression on a known-good seed before shipping
#      the composition as the chair recipe.
#   3. car pfv s2/s3 — complete the plain-car 4-seed set for
#      car_pred_pose.yaml (VERDICT r4 item 7); finding 5 predicts the
#      symmetry ceiling (raw ~0.49 / up-to-flip ~0.9) regardless.
#   4. pfv x predict_translation on TPU (airplane s0) — the round-5 mode
#      intersection is CPU-tested only; no round-5 code ships
#      hardware-unexercised.
#   5. pfv4 chair s1/s2 + airplane s2/s3 — uniform 4-seed protocol
#      (VERDICT r4 weak 3).
#   6. Full bench.py so the new roofline + gsplat-d64 keys are verified
#      on real TPU before the driver's end-of-round run.
# skip-if-artifact-exists makes re-running after a kill safe; the 60s
# settle sleep avoids the back-to-back HBM RESOURCE_EXHAUSTED (queue C
# header / NOTES round-3c).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5d_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <category> <seed> [extra args...]
  local tag="$1" cat="$2" seed="$3"; shift 3
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  sleep 60
  timeout 3600 python scripts/pose_r2.py --tag "$tag" \
    --category "$cat" --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views "$@" \
    --log-every 200 > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
}

run r5_pfv4_chair_s3 chair 3 --views-per-step 4
run r5_pfv4_chair_s0 chair 0 --views-per-step 4
run r5_pfv_car_s2 car 2
run r5_pfv_car_s3 car 3
run r5_pfvt_airplane_s0 airplane 0 --predict-translation
run r5_pfv4_chair_s1 chair 1 --views-per-step 4
run r5_pfv4_chair_s2 chair 2 --views-per-step 4
run r5_pfv4_airplane_s2 airplane 2 --views-per-step 4
run r5_pfv4_airplane_s3 airplane 3 --views-per-step 4

sleep 60
timeout 3600 python bench.py > /tmp/r5_bench.log 2>&1
echo "DONE bench rc=$?"
tail -1 /tmp/r5_bench.log

echo QUEUE_R5D_DONE
