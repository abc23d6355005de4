#!/bin/bash
# Round-5 TPU queue I: does the gauge_reseed detector (30 deg @ 10k,
# finding 23) generalize beyond chairs?
#   1. airplane s0, plain pfv (the shipped airplane recipe) — healthy
#      seed, the detector must NOT fire (false-positive control).
#   2. car_asym s0, pfv4 (the shipped car_asym recipe) — same control.
#   3. car s2, plain pfv (the shipped car recipe) — the symmetric
#      category: is the coherent up-to-flip mirror gauge LOW-spread as
#      finding 21's theory predicts (detector safe to ship), or does
#      per-view mirror flipping inflate the spread (detector would
#      reseed forever — do NOT ship the knobs there)?
# Waits for queue H (QUEUE_R5H_DONE in its stdout log).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 200); do
  grep -q "QUEUE_R5H_DONE" /tmp/r5h_queue.log 2>/dev/null && break
  sleep 60
done
sleep 60

# No internal probe: this queue is ALWAYS launched via
# tpu_watchdog_r5.sh, whose probe already proved the worker up; a
# second back-to-back probe here wedged the worker twice this session
# (timed-out probe kills a client mid backend-init — NOTES pattern).

run () {  # run <tag> <category> <seed> [extra args...]
  local tag="$1" cat="$2" seed="$3"; shift 3
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  sleep 60
  timeout 5400 python scripts/pose_r2.py --tag "$tag" \
    --category "$cat" --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views --gauge-reseed-threshold 30 --gauge-reseed-step 10000 \
    --log-every 200 "$@" > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
  grep -h gauge_reseed "/tmp/dpcx_pose_r2_$tag/metrics.jsonl" | tail -3
}

run r5_reseed_airplane_s0 airplane 0
run r5_reseed_car_asym_s0 car_asym 0 --views-per-step 4
run r5_reseed_car_s2 car 2

echo QUEUE_R5I_DONE
