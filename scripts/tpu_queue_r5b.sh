#!/bin/bash
# Round-5 TPU queue B: chair seed 3 exposed the SAME frame-lock mode
# finding 18 repaired on car_asym (acc 0.438, up-to-flip 0.456, chamfer
# elevated — not a mirror flip), so the chair 4-seed pfv mean is 0.847,
# not the 3-seed 0.983. Decision-critical first: does views_per_step=4
# repair chair s3 like it repaired car_asym s3? Then chair pfv4 s0-s2
# (shippable-recipe regression) and airplane pfv4 s2/s3 (complete that
# 4-seed set; s0/s1 ran in queue A). Waits for queue A to finish.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 200); do
  grep -q "QUEUE_R5A_DONE" /tmp/r5a_queue.log 2>/dev/null && break
  sleep 60
done

run () {  # run <tag> <category> <seed> [extra args...]
  local tag="$1" cat="$2" seed="$3"; shift 3
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  timeout 3600 python scripts/pose_r2.py --tag "$tag" \
    --category "$cat" --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views "$@" \
    --log-every 200 > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
}

run r5_pfv4_chair_s3 chair 3 --views-per-step 4
run r5_pfv4_chair_s0 chair 0 --views-per-step 4
run r5_pfv4_chair_s1 chair 1 --views-per-step 4
run r5_pfv4_chair_s2 chair 2 --views-per-step 4
run r5_pfv4_airplane_s2 airplane 2 --views-per-step 4
run r5_pfv4_airplane_s3 airplane 3 --views-per-step 4

echo QUEUE_R5B_DONE
