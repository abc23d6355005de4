#!/bin/bash
# Round-5 TPU queue H: complete the shipped chair recipe's 4-seed table
# under ONE config — pfv4 + gauge_reseed(30 deg @ 10k). Queue G measured
# s3 (fires -> repaired to 1.000) and s0 (control); s1/s2 here make every
# seed a measurement of the exact shipped chair_pred_pose.yaml recipe
# rather than splicing pfv4-without-reseed numbers.
# Waits for queue G (QUEUE_R5G_DONE in its stdout log).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 200); do
  grep -q "QUEUE_R5G_DONE" /tmp/r5g_queue.log 2>/dev/null && break
  sleep 60
done
sleep 60

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5h_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <seed>
  local tag="$1" seed="$2"; shift 2
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  sleep 60
  timeout 5400 python scripts/pose_r2.py --tag "$tag" \
    --category chair --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views --views-per-step 4 \
    --gauge-reseed-threshold 30 --gauge-reseed-step 10000 \
    --log-every 200 "$@" > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
  grep -h gauge_reseed "/tmp/dpcx_pose_r2_$tag/metrics.jsonl" | tail -3
}

run r5_reseed_chair_s1 1
run r5_reseed_chair_s2 2

echo QUEUE_R5H_DONE
