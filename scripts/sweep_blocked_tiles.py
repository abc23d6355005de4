"""Sweep blocked-kernel tilings on real TPU at 128^3 flagship shapes."""
import time

import jax
import jax.numpy as jnp

import dpcx.render.pallas_blocked as pb
from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn as pointcloud_project

D, N, B = 128, 16000, 4
ITERS = 20
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D))
cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
             pallas_acc_dtype="bfloat16", proj_depth=False)


def run_one(tag):
    @jax.jit
    def fwd(p):
        def body(carry, _):
            sil = pointcloud_project(cfg, carry, quat, sigma).silhouette
            return carry + 1e-20 * sil.sum(), sil[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()

    @jax.jit
    def fwdbwd(p):
        def loss(q):
            sil = pointcloud_project(cfg, q, quat, sigma).silhouette
            return jnp.mean((sil - tgt) ** 2)
        def body(carry, _):
            g = jax.grad(loss)(carry)
            return carry + 1e-20 * g.sum(), g[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()

    out = []
    for f, lbl in ((fwd, "fwd"), (fwdbwd, "fb")):
        try:
            f(pts).block_until_ready()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                f(pts).block_until_ready()
                best = min(best, (time.perf_counter() - t0) / ITERS)
            out.append(f"{lbl} {B*N/best/1e6:.1f}")
        except Exception as e:
            out.append(f"{lbl} FAIL({str(e)[:60]})")
    print(f"{tag}: " + " | ".join(out) + " Mpts/s", flush=True)


for ov in (
    {},                                  # defaults: Dz32 G4 C128 Gby1
    {"G": 2},
    {"G": 1},
    {"C": 256},
    {"C": 256, "G": 2},
    {"Dz": 64},
    {"Dz": 64, "G": 2},
    {"Gby": 2},
    {"Gby": 4},
    {"Dz": 64, "G": 2, "C": 256},
):
    pb.TILE_OVERRIDES.clear()
    pb.TILE_OVERRIDES.update(ov)
    jax.clear_caches()
    run_one(str(ov) or "defaults")
pb.TILE_OVERRIDES.clear()
