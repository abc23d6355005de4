"""Sweep blocked-kernel tilings on real TPU at 128^3 flagship shapes.

Round-3 rewrite: device-side bench_scan timing (the original used
host-side block_until_ready, which lies through the tunnel — NOTES.md),
B=16 to match the shipped bench shapes.
"""
import jax
import jax.numpy as jnp

import dpcx.render.pallas_blocked as pb
from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn as pointcloud_project
from dpcx.utils.timing import bench_scan

D, N, B = 128, 16000, 16
cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
             pallas_acc_dtype="bfloat16", proj_depth=False)
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D))


def run_one(tag):
    out = []

    def fwd_body(carry, p, q, sg):
        sil = pointcloud_project(cfg, p + carry * 1e-17, q, sg).silhouette
        return carry + 1e-17, sil.sum()

    def fb_body(carry, p, q, sg, t):
        def loss(p_):
            sil = pointcloud_project(cfg, p_, q, sg).silhouette
            return jnp.mean((sil - t) ** 2)

        g = jax.grad(loss)(p + carry * 1e-17)
        return carry + 1e-17, g.sum()

    for lbl, body, ops, iters in (
        ("fwd", fwd_body, (pts, quat, sigma), 60),
        ("fb", fb_body, (pts, quat, sigma, tgt), 40),
    ):
        try:
            sec = bench_scan(body, jnp.zeros(()), ops, iters=iters)
            out.append(f"{lbl} {B * N / sec / 1e6:.1f}")
        except Exception as e:  # noqa: BLE001 — report and move on
            out.append(f"{lbl} FAIL({str(e)[:60]})")
    print(f"{tag}: " + " | ".join(out) + " Mpts/s", flush=True)


for ov in (
    {},                                  # defaults: Dz32 G4 C128 Gby1
    {"G": 2},
    {"G": 8},
    {"C": 256},
    {"Dz": 64},
    {"Dz": 64, "G": 2},
    {"Gby": 2},
):
    pb.TILE_OVERRIDES.clear()
    pb.TILE_OVERRIDES.update(ov)
    jax.clear_caches()
    run_one(str(ov) or "defaults")
pb.TILE_OVERRIDES.clear()
