"""Sweep the fused 64^3 kernel's splat tiling (VERDICT round-1 item 5).

The dense-window splat burns G*D*C work per trip while each point only
touches 2 z-slabs x 2 y-rows x 2 x-cols; shrinking the z-window G (and
retuning the chunk size C) is the cheap end of the sparse-splat ladder —
the two-level (z, y) sort is the expensive end, only worth it if this
sweep shows the splat still dominating at G=2. Timing: device-side
lax.scan with a value fetch (NOTES.md timing rules).

Usage: python scripts/sweep_fused_tiles.py [--bwd]
"""
import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render import pallas_kernel as pk
from dpcx.render.project import pointcloud_project_fn

ap = argparse.ArgumentParser()
ap.add_argument("--bwd", action="store_true", help="time fwd+bwd too")
ap.add_argument("--iters", type=int, default=150)
args = ap.parse_args()

B, N, D = 16, 16384, 64
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D))
cfg = Config(
    vox_size=D, pc_num_points=N, renderer="pallas",
    pallas_acc_dtype="bfloat16", proj_depth=False,
)


def timed(run, *a):
    float(run(*a))  # compile + warm
    best = float("inf")
    for i in range(3):
        sg = sigma * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(run(*a[:-1], sg))
        best = min(best, (time.perf_counter() - t0) / args.iters)
    return B * N / best / 1e6


def fwd_fn():
    @jax.jit
    def run(p, q, sg):
        def body(carry, _):
            sil = pointcloud_project_fn(cfg, carry, q, sg).silhouette
            return carry + sil.sum() * 1e-17, sil.sum()

        _, s = jax.lax.scan(body, p, None, length=args.iters)
        return s.sum()

    return run


def fwdbwd_fn():
    def loss(p, q, sg):
        s = pointcloud_project_fn(cfg, p, q, sg).silhouette
        return jnp.mean((s - tgt) ** 2)

    g = jax.grad(loss)

    @jax.jit
    def run(p, q, sg):
        def body(carry, _):
            dp = g(carry, q, sg)
            return carry + dp * 1e-9, dp.sum()

        _, s = jax.lax.scan(body, p, None, length=max(args.iters // 3, 10))
        return s.sum()

    return run


results = []
for G, C in itertools.product((8, 4, 2, 1), (512, 1024)):
    if N % C:
        continue
    pk.TILE_OVERRIDES.clear()
    pk.TILE_OVERRIDES.update({"z_group": G, "n_chunk": C})
    jax.clear_caches()
    rec = {"G": G, "C": C}
    try:
        rec["fwd_mpts"] = round(timed(fwd_fn(), pts, quat, sigma), 1)
        if args.bwd:
            n_it = max(args.iters // 3, 10)
            run = fwdbwd_fn()
            float(run(pts, quat, sigma))
            best = float("inf")
            for i in range(3):
                sg = sigma * (1.0 + 1e-6 * (i + 1))
                t0 = time.perf_counter()
                float(run(pts, quat, sg))
                best = min(best, (time.perf_counter() - t0) / n_it)
            rec["fwdbwd_mpts"] = round(B * N / best / 1e6, 1)
    except Exception as e:  # noqa: BLE001 — record and keep sweeping
        rec["error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(rec), flush=True)
    results.append(rec)
pk.TILE_OVERRIDES.clear()

best = max((r for r in results if "fwd_mpts" in r), key=lambda r: r["fwd_mpts"])
print("BEST:", json.dumps(best))
