#!/bin/bash
# TPU worker recovery watchdog (NOTES round-3 session C pattern: after a
# client is killed mid backend-init, every subsequent init HANGS until the
# worker restarts). Probe with a short timeout on a fixed cadence; once a
# probe completes, launch the given queue script and exit.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
QUEUE="${1:-scripts/tpu_queue_r5a.sh}"

for i in $(seq 1 120); do
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r5_watchdog_probe.log 2>&1 && { echo "WORKER_UP after $i probes"; break; }
  echo "probe $i failed; sleeping"
  sleep 180
done

if grep -q "probe ok" /tmp/r5_watchdog_probe.log; then
  QLOG="/tmp/$(basename "$QUEUE" .sh)_wd.log"
  bash "$QUEUE" > "$QLOG" 2>&1
  echo "WATCHDOG_QUEUE_DONE rc=$?"
else
  echo "WATCHDOG_GAVE_UP"
fi
