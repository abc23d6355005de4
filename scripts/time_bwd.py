"""Decompose the 64^3 fused fwd+bwd cost (B=16, N=16384, bf16):
forward-only, full value_and_grad, the backward kernel alone, and the
un-sort. Device-side scan timing (NOTES.md rules)."""
import json
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render import pallas_kernel as pk
from dpcx.render.project import pointcloud_project_fn

B, N, D, ITERS = 16, 16384, 64, 60
cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
             pallas_acc_dtype="bfloat16", proj_depth=False)
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D))


def timed(step, *args):
    @jax.jit
    def run(a0, *rest):
        def body(carry, _):
            out = step(carry, *rest)
            return carry + out * 1e-17, out

        _, s = jax.lax.scan(body, a0, None, length=ITERS)
        return s.sum()

    float(run(*args))
    best = float("inf")
    for i in range(3):
        a2 = (args[0] * (1.0 + 1e-6 * (i + 1)),) + args[1:]
        t0 = time.perf_counter()
        float(run(*a2))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


def fwd(p, q, sg):
    return pointcloud_project_fn(cfg, p, q, sg).silhouette.sum()


def fwdbwd(p, q, sg, t):
    def loss(p_):
        s = pointcloud_project_fn(cfg, p_, q, sg).silhouette
        return jnp.mean((s - t) ** 2)

    return jax.grad(loss)(p).sum()


# pieces: pre-sorted coords + fixed cotangents -> backward kernel alone
from dpcx.render.gauss import blur_matrix  # noqa: E402
from dpcx.render.project import kernel_radius  # noqa: E402
from dpcx.render.transform import pc_perspective_transform_t  # noqa: E402

radius = kernel_radius(cfg.pc_relative_sigma, D, cfg.gauss_kernel_truncate)
kmat = blur_matrix(sigma * D, D, radius)
ndc_t = pc_perspective_transform_t(pts, quat)
g_t = (ndc_t[:, ::-1, :] + 0.5) * D - 0.5
coords_t = jnp.concatenate([g_t, jnp.ones((B, 1, N))], axis=1)
sorted_t, order = pk._sort_with_order(coords_t)
dsil = jax.random.uniform(jax.random.PRNGKey(3), (B, D, D))
dzero = jnp.zeros_like(dsil)


def bwd_kernel_only(st, km, ds, dz):
    return pk._pallas_backward(
        st, km, ds, dz, D, False, "bfloat16", False
    ).sum()


def sort5(ct, o):
    outs = jax.lax.sort(
        (o, ct[:, 0], ct[:, 1], ct[:, 2], ct[:, 3]),
        dimension=1, num_keys=1,
    )
    return outs[1].sum()


for name, fn, args in (
    ("fwd", fwd, (pts, quat, sigma)),
    ("fwd+bwd", fwdbwd, (pts, quat, sigma, tgt)),
    ("bwd_kernel_only", bwd_kernel_only, (sorted_t, kmat, dsil, dzero)),
    ("unsort_sort5", sort5, (coords_t, order)),
):
    us = timed(fn, *args)
    print(json.dumps({"what": name, "us": round(us, 1),
                      "mpts": round(B * N / us, 1)}), flush=True)
