"""Decompose the fused renderer's per-call cost at the FLAGSHIP render
batch (B=48 = batch 16 x 3 views, N=16384, D=64, bf16) into kernel vs
"shell" (XLA pre-pass + scan floor + dispatch scaffolding).

Round-2 measured the split at B=16 (NOTES.md: shell ~58%); VERDICT r3
missing 5 asks what the split is at the HEADLINE batch before deciding
whether a fused pallas pre-pass (transform+sort+metadata) is worth
building. Pieces (device-side scan timing, dpcx/utils/timing.bench_scan):

  empty      — scan-harness floor (us/iter)
  transform  — pc_perspective_transform_t only (the production form)
  prepass    — transform -> grid units -> pad -> 4-op primal sort ->
               window metadata -> blur matrix (everything before the
               pallas_call)
  sort4/sort3— the primal lax.sort alone, 4 operands vs 3 (w dropped:
               the candidate optimization when point_weights is None)
  full       — pallas_project_t forward (prepass + pallas_call)

kernel share = full - prepass; shell share = prepass + floor.
"""
import json

import jax
import jax.numpy as jnp

from dpcx.render import pallas_kernel as pk
from dpcx.render.transform import pc_perspective_transform_t
from dpcx.render.gauss import blur_matrix
from dpcx.utils.timing import bench_scan

B, N, D, ITERS = 48, 16384, 64, 150
RADIUS = 3

pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02 * D, jnp.float32)


def report(tag, sec):
    print(
        json.dumps(
            {
                "what": tag,
                "us": round(sec * 1e6, 1),
                "mpts": round(B * N / sec / 1e6, 1),
            }
        ),
        flush=True,
    )
    return sec * 1e6


def empty(c, q):
    return c * 1.0000001, c[0, 0, 0]


def transform_only(c, q):
    t = pc_perspective_transform_t(c, q)
    return c + t.sum() * 1e-17, t[0, 0, 0]


def _coords(p, q):
    ndc_t = pc_perspective_transform_t(p, q)
    g_t = (ndc_t[:, ::-1, :] + 0.5) * D - 0.5
    w = jnp.ones((B, 1, N), g_t.dtype)
    return jnp.concatenate([g_t, w], axis=1)


def prepass(c, q, s):
    coords_t = _coords(c, q)
    sorted_t, _ = pk._sort_with_order(coords_t, with_order=False)
    G, C, _, _ = pk._pack_params(B, N, D)
    zb, nt = pk._window_metadata(sorted_t[:, 0, :], D, G, C)
    kmat = blur_matrix(s, D, RADIUS)
    probe = sorted_t[0, 0, 0] + zb[0, 0] + nt[0, 0] + kmat[0, 0]
    return c + probe * 1e-17, probe


def sort4(c, q):
    coords_t = _coords(c, q)
    sorted_t, _ = pk._sort_with_order(coords_t, with_order=False)
    return c + sorted_t[0, 0, 0] * 1e-17, sorted_t[0, 0, 0]


def sort3(c, q):
    coords_t = _coords(c, q)
    ops = tuple(coords_t[:, k, :] for k in range(3))
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    return c + out[0][0, 0] * 1e-17, out[0][0, 0]


def full(c, q, s):
    ndc_t = pc_perspective_transform_t(c, q)
    sil, _ = pk.pallas_project_t(
        ndc_t, D, s, RADIUS, acc_dtype="bfloat16", save_grid=False
    )
    return c + sil.sum() * 1e-17, sil[0, 0, 0]


t_empty = report("empty", bench_scan(empty, pts, (quat,), ITERS))
t_tf = report("transform", bench_scan(transform_only, pts, (quat,), ITERS))
t_sort4 = report("sort4(+transform)", bench_scan(sort4, pts, (quat,), ITERS))
t_sort3 = report("sort3(+transform)", bench_scan(sort3, pts, (quat,), ITERS))
t_pre = report("prepass", bench_scan(prepass, pts, (quat, sigma), ITERS))
t_full = report("full", bench_scan(full, pts, (quat, sigma), ITERS))

print(
    json.dumps(
        {
            "what": "split_b48",
            "kernel_us": round(t_full - t_pre, 1),
            "shell_us": round(t_pre, 1),
            "shell_share": round(t_pre / t_full, 3),
            "sort_us": round(t_sort4 - t_tf, 1),
            "sort3_saving_us": round(t_sort4 - t_sort3, 1),
            "transform_us": round(t_tf - t_empty, 1),
        }
    ),
    flush=True,
)
