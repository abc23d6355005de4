#!/bin/bash
# Round-4 phase 8: repair the one sub-target pfv seed (car_asym s3,
# acc 0.519 — finding 17: a wrong-canonical-frame lock with degraded
# geometry, NOT a mirror flip). Two single-knob probes, decisive first:
#   (a) pfv x azimuth-only anchor (w=1.0 decaying by 20k) — finding 14a
#       measured that this anchor removes exactly the wrong-sector/
#       rotated-frame modes; composition with pfv is untested.
#   (b) pfv with views_per_step=4 — more cross-view constraint per step.
# Then regression checks of the winner on seeds 0-2 (only if (a) or (b)
# repairs s3) are queued behind; the skip-if-artifact-exists guard makes
# re-running this script after a kill safe.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4l_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

run () {  # run <tag> <category> <seed> [extra args...]
  local tag="$1" cat="$2" seed="$3"; shift 3
  if [ -f "artifacts/pose_r2_$tag.json" ]; then echo "SKIP $tag (exists)"; return; fi
  timeout 3600 python scripts/pose_r2.py --tag "$tag" \
    --category "$cat" --seed "$seed" --k 8 --batch 8 --lr 1e-4 \
    --pose-from-views "$@" \
    --log-every 200 > "/tmp/$tag.log" 2>&1
  echo "DONE $tag rc=$?"
}

run r4_pfvaz_car_asym_s3 car_asym 3 --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth
run r4_pfv4_car_asym_s3 car_asym 3 --views-per-step 4
echo PROBES_DONE

# Regression checks for the anchor composition (cheap; run regardless —
# if s3 stayed broken these still tell us whether the composition is
# shippable on the seeds pfv already wins).
run r4_pfvaz_car_asym_s0 car_asym 0 --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth
run r4_pfvaz_car_asym_s1 car_asym 1 --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth
run r4_pfvaz_car_asym_s2 car_asym 2 --anchor-weight 1.0 --anchor-steps 20000 --anchor-mode azimuth

echo QUEUE_R4L_DONE
