#!/bin/bash
# Round-5 TPU queue C: cleanup after queues A/B.
#   1. Retry r5_pfv_car_s2 — the original run died at dataset
#      materialization with RESOURCE_EXHAUSTED 4s after the previous
#      run's process exited (HBM not yet released by the dying client;
#      transient, same one-chip back-to-back pattern as NOTES round-3c).
#      A 60s settle sleep fronts every run here for the same reason.
#   2. Full bench.py on the healthy worker so the roofline + d64 keys
#      are verified on real TPU before the driver's end-of-round run.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 240); do
  grep -q "QUEUE_R5B_DONE" /tmp/r5b_queue.log 2>/dev/null && break
  sleep 60
done

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

run r5_pfv_car_s2 car 2

# round-5 pfv x predict_translation on TPU: the mode intersection closed
# this round (VERDICT r4 missing 4) is CPU-unit/e2e-tested; this run
# demonstrates it trains to quality on hardware on a known-good seed
# (airplane s0 plain-pfv: 0.994) so no round-5 code ships hardware-untested.
run r5_pfvt_airplane_s0 airplane 0 --predict-translation

sleep 60
timeout 3600 python bench.py > /tmp/r5_bench.log 2>&1
echo "DONE bench rc=$?"
tail -1 /tmp/r5_bench.log

echo QUEUE_R5C_DONE
