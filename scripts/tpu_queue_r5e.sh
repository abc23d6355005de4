#!/bin/bash
# Round-5 TPU queue E: attack the chair-s3 frame lock (finding 20).
# pfv4 — the composition that repaired car_asym s3 (finding 18) — does
# NOT repair chair s3 (0.469 vs plain pfv 0.438), so this queue runs
# the remaining untried levers, decision-critical first:
#   1. pfv x consistency 1.0 — mechanism (e) has never been RUN against
#      a locked seed (implemented + e2e-tested only). chair s3 shows
#      flip_rate 0.25, i.e. residual per-input gauge inconsistency the
#      cross-view decode Chamfer punishes directly.
#   2. pfv x consistency 5.0 — weight probe (chamfer ~3e-3 vs proj loss
#      ~1e-2..1e-1 scale; 1.0 may be too weak to matter).
#   3. pfv slow-anneal (anneal=steps=40k) — finding 18's interpretation
#      says the lock forms during the high-sigma lock-in window; keep
#      sigma decaying the whole run so the basin stays plastic longer.
#   4. pfv4 x consistency 1.0 — composition, in case (e) helps but
#      needs the pairing pressure too.
#   5. Winner regression on chair s0 is queued MANUALLY once 1-4 read
#      out (don't burn the slot if nothing moves).
# Waits for queue D (pid file) to drain before touching the TPU.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while kill -0 "$(cat /tmp/r5d_queue.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
sleep 60

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5e_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

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

run r5_pfvc1_chair_s3 chair 3 --consistency-weight 1.0
run r5_pfvc5_chair_s3 chair 3 --consistency-weight 5.0
run r5_pfvslow_chair_s3 chair 3 --anneal 40000
run r5_pfv4c1_chair_s3 chair 3 --views-per-step 4 --consistency-weight 1.0

echo QUEUE_R5E_DONE
