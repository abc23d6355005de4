"""Time the fused kernel's XLA pre-pass pieces in isolation: perspective
transform, the 5-operand z-sort, window metadata. Device-side scan timing.
"""
import json
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render import pallas_kernel as pk
from dpcx.render.transform import pc_perspective_transform
from dpcx.render.voxelize import ndc_to_grid

B, N, D, ITERS = 16, 16384, 64, 300
cfg = Config(vox_size=D, pc_num_points=N)
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def timed(step):
    @jax.jit
    def run(p, q):
        def body(carry, _):
            out = step(carry, q)
            return carry + out * 1e-17, out

        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()

    float(run(pts, quat))
    best = float("inf")
    for i in range(3):
        q2 = quat * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(run(pts, q2))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


def transform_only(p, q):
    t = pc_perspective_transform(p, q)
    return t.sum() * 1e-17 + p[0, 0, 0]


def transform_sort(p, q):
    t = pc_perspective_transform(p, q)
    g = ndc_to_grid(t, D)
    w = jnp.ones(g.shape[:2], g.dtype)
    cw = jnp.concatenate([g, w[..., None]], axis=-1)
    sorted_t, order = pk._sort_with_order(cw)
    return sorted_t[0, 0, 0] + order[0, 0].astype(jnp.float32)


def full_prepass(p, q):
    t = pc_perspective_transform(p, q)
    g = ndc_to_grid(t, D)
    w = jnp.ones(g.shape[:2], g.dtype)
    cw = jnp.concatenate([g, w[..., None]], axis=-1)
    sorted_t, order = pk._sort_with_order(cw)
    G, C, S, Gb = pk._pack_params(B, N, D)
    zb, nt = pk._window_metadata(sorted_t[:, 0, :], D, G, C)
    return sorted_t[0, 0, 0] + zb.sum().astype(jnp.float32)


for name, fn in (
    ("transform", transform_only),
    ("transform+sort", transform_sort),
    ("full_prepass", full_prepass),
):
    print(json.dumps({"step": name, "us": round(timed(fn), 1)}), flush=True)
