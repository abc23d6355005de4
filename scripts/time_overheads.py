"""Measure the fixed costs that bound the fused renderer's throughput:
(a) an empty lax.scan iteration, (b) a no-op pallas_call per iteration,
(c) the full fused render at B = 16 / 32 / 48 (48 = the flagship training
step's actual render batch: batch 16 x 3 views). Device-side timing.
"""
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn

N, D, ITERS = 16384, 64, 300


def bench(make_run, *args):
    run = make_run()
    float(run(*args))
    best = float("inf")
    for i in range(3):
        a2 = tuple(a * (1.0 + 1e-6 * (i + 1)) for a in args)
        t0 = time.perf_counter()
        float(run(*a2))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


x = jax.random.uniform(jax.random.PRNGKey(0), (8, 128))


def empty_scan():
    @jax.jit
    def run(v):
        def body(c, _):
            return c * 1.0000001, c[0, 0]

        _, s = jax.lax.scan(body, v, None, length=ITERS)
        return s.sum()

    return run


def noop_pallas():
    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 2.0

    def call(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)

    @jax.jit
    def run(v):
        def body(c, _):
            return call(c), c[0, 0]

        _, s = jax.lax.scan(body, v, None, length=ITERS)
        return s.sum()

    return run


print(json.dumps({"what": "empty_scan_iter_us",
                  "us": round(bench(empty_scan, x), 1)}), flush=True)
print(json.dumps({"what": "noop_pallas_iter_us",
                  "us": round(bench(noop_pallas, x), 1)}), flush=True)

for B in (16, 32, 48):
    cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
                 pallas_acc_dtype="bfloat16", proj_depth=False)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (B, N, 3), minval=-0.4, maxval=0.4
    )
    quat = jax.random.normal(jax.random.PRNGKey(2), (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)

    def fused(B=B, pts=pts, quat=quat):
        @jax.jit
        def run(p, q, sg):
            def body(carry, _):
                sil = pointcloud_project_fn(cfg, carry, q, sg).silhouette
                return carry + sil.sum() * 1e-17, sil.sum()

            _, s = jax.lax.scan(body, p, None, length=ITERS)
            return s.sum()

        return run

    us = bench(fused, pts, quat, jnp.asarray(0.02))
    print(json.dumps({"what": f"fused_B{B}", "us": round(us, 1),
                      "mpts": round(B * N / us, 1)}), flush=True)
