#!/bin/bash
# Round-5 TPU queue G: demonstrate the auto-reseed mitigation (finding 21
# detector -> config.gauge_reseed_*) on real TPU.
#   1. chair s3 x pfv4 x reseed(30 deg @ 10k, 3 retries) — the locked
#      seed: the detector must fire, re-roll the init, and the surviving
#      attempt should land near the healthy-seed numbers (the lottery is
#      init-only: the dataset is fixed at seed=0).
#   2. chair s0 x pfv4 x reseed — the healthy control: the detector must
#      NOT fire (no gauge_reseed record in the metrics JSONL) and the
#      result must match the measured pfv4 s0 (1.000).
# Waits for queue E (QUEUE_R5E_DONE marker in the watchdog-fronted log).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 200); do
  grep -q "QUEUE_R5E_DONE" /tmp/tpu_queue_r5e_wd.log 2>/dev/null && break
  sleep 60
done
sleep 60

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5g_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <seed> [extra args...]
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

run r5_reseed_chair_s3 3
run r5_reseed_chair_s0 0

echo QUEUE_R5G_DONE
