#!/bin/bash
# Round-5 TPU queue F: forensics + close-out, behind queue E.
#   1. Plain pfv chair s3 re-run under a new tag: the original
#      r5_pfv_chair_s3 artifact predates evaluate(per_sample=True), so
#      this reproduces the locked run (same datagen seed 0 / init seed
#      3 / recipe) WITH the per-sample residual axis/angle block —
#      scripts/pose_diagnose.py then answers finding 20's open
#      question (azimuth-sector lock vs tumble vs shape collapse).
# Winner-regression runs for queue E (if any composition repairs s3)
# are queued manually after E reads out.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while kill -0 "$(cat /tmp/r5e_queue.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
sleep 60

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5f_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

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

run r5_pfvdiag_chair_s3 chair 3

echo QUEUE_R5F_DONE
