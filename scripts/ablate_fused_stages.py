"""Stage ablation of the fused 64^3 kernel: time the full forward, then
with each stage skipped (DEBUG_SKIP), at the current tiling and at a
G override. Device-side lax.scan timing (NOTES.md rules).

Usage: python scripts/ablate_fused_stages.py [--g N]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render import pallas_blocked as pb
from dpcx.render import pallas_kernel as pk
from dpcx.render.project import pointcloud_project_fn

ap = argparse.ArgumentParser()
ap.add_argument("--g", type=int, default=0)
ap.add_argument("--iters", type=int, default=150)
args = ap.parse_args()

B, N, D = 16, 16384, 64
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
cfg = Config(
    vox_size=D, pc_num_points=N, renderer="pallas",
    pallas_acc_dtype="bfloat16", proj_depth=False,
)
if args.g:
    pk.TILE_OVERRIDES.update({"z_group": args.g})


def timed():
    @jax.jit
    def run(p, q, sg):
        def body(carry, _):
            sil = pointcloud_project_fn(cfg, carry, q, sg).silhouette
            return carry + sil.sum() * 1e-17, sil.sum()

        _, s = jax.lax.scan(body, p, None, length=args.iters)
        return s.sum()

    float(run(pts, quat, sigma))
    best = float("inf")
    for i in range(3):
        sg = sigma * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(run(pts, quat, sg))
        best = min(best, (time.perf_counter() - t0) / args.iters)
    return best * 1e6  # us per call


full = timed()
print(json.dumps({"skip": "none", "us": round(full, 1),
                  "mpts": round(B * N / full, 1)}), flush=True)
for skip in (
    "splat", "yxblur", "zblur", "drc",
    "splat+yxblur+zblur+drc",
):
    pb.DEBUG_SKIP = frozenset(skip.split("+"))
    jax.clear_caches()
    t = timed()
    print(json.dumps({
        "skip": skip, "us": round(t, 1),
        "stage_share_pct": round(100 * (full - t) / full, 1),
    }), flush=True)
pb.DEBUG_SKIP = frozenset()
