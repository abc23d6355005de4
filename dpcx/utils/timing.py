"""Canonical device-side timing harness for this runtime.

Every timing rule in here was learned the hard way (NOTES.md "axon
runtime dispatch facts") and is enforced structurally so scripts cannot
rediscover the bugs:

1. operands are threaded as JIT ARGUMENTS — an operand reaching a
   pallas_call as a closure constant forces a synchronous ~0.9 ms
   dispatch path (and appears to degrade the process afterwards);
2. iterations run inside ONE jitted lax.scan with a carry data
   dependency, so the tunnel cannot parallelize or elide them;
3. completion is detected by a VALUE FETCH (`float(...)`) —
   block_until_ready can return ~1 us into a 300 ms scan here;
4. repeats perturb the float operands — identical calls are served from
   a result cache (~40 us);
5. callers should pick `iters` large enough to amortize the fixed
   ~25-30 ms per-dispatch round trip (>= 100 for sub-ms kernels).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench_scan(
    body,
    carry0: jax.Array,
    operands: tuple = (),
    iters: int = 100,
    repeats: int = 3,
) -> float:
    """Best-of-``repeats`` seconds per iteration of ``body``.

    ``body(carry, *operands) -> (new_carry, probe)``: new_carry must
    depend on the iteration's result (serialization) and ``probe`` is any
    scalar/array whose sum is cheap to fetch. Floating-point operands are
    perturbed by 1e-6 per repeat (rule 4); pass ints/bools freely.
    """

    @jax.jit
    def run(carry, *ops):
        def step(c, _):
            c, probe = body(c, *ops)
            return c, jnp.sum(probe)

        _, s = jax.lax.scan(step, carry, None, length=iters)
        return s.sum()

    float(run(carry0, *operands))  # compile + warm
    best = float("inf")
    for i in range(repeats):
        ops = tuple(
            o * (1.0 + 1e-6 * (i + 1))
            if isinstance(o, jax.Array)
            and jnp.issubdtype(o.dtype, jnp.floating)
            else o
            for o in operands
        )
        t0 = time.perf_counter()
        float(run(carry0, *ops))  # value fetch = true barrier
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def render_throughput_mpts(
    cfg,
    pts: jax.Array,
    quat: jax.Array,
    sigma: jax.Array,
    iters: int = 100,
    backward: bool = False,
) -> float:
    """Mpoints splatted+projected per second for the standard renderer —
    forward, or forward + backward (grad wrt points) when ``backward``."""
    from dpcx.render.project import pointcloud_project_fn

    if backward:

        def body(carry, q, sg):
            g = jax.grad(
                lambda p: pointcloud_project_fn(
                    cfg, p, q, sg
                ).silhouette.sum()
            )(carry)
            return carry + g * 1e-9, g.sum()

    else:

        def body(carry, q, sg):
            sil = pointcloud_project_fn(cfg, carry, q, sg).silhouette
            return carry + sil.sum() * 1e-17, sil.sum()

    sec = bench_scan(body, pts, (quat, sigma), iters=iters)
    B, N = pts.shape[:2]
    return B * N / sec / 1e6
