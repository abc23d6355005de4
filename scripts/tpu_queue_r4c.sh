#!/bin/bash
# Round-4 TPU queue, phase 3: B=48 shell decomposition (VERDICT r3
# missing 5 — measure before building a fused pre-pass) + a fresh bench
# sanity run. Waits for phase 2 (pid in /tmp/r4b_queue.pid).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -f /tmp/r4b_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4b_queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
print('probe ok', float(x.sum()), jax.devices())
" > /tmp/r4c_probe.log 2>&1 || { echo PROBE_FAILED; exit 1; }

timeout 2400 python scripts/time_shell_b48.py > /tmp/r4c_shell.log 2>&1

timeout 3600 python bench.py > /tmp/r4c_bench.log 2>&1

echo QUEUE_R4C_DONE
