"""Benchmark the depth-blocked 128^3 kernel on real TPU: fwd and fwd+bwd
throughput at multicat flagship shapes (B=4, N=16000, bf16 perf mode)."""
import functools
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn as pointcloud_project

D, N, B = 128, 16000, 4
ITERS = 30
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D))


def bench(f, label):
    f(pts).block_until_ready()  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        f(pts).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label}: {best*1e6:.0f} us -> {B*N/best/1e6:.1f} Mpts/s",
          flush=True)


for mode in ("bfloat16", "float32"):
    cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
                 pallas_acc_dtype=mode, proj_depth=False)

    @functools.partial(jax.jit, static_argnames=())
    def fwd_impl(p, quat, sigma, cfg=cfg):
        def body(carry, _):
            sil = pointcloud_project(cfg, carry, quat, sigma).silhouette
            return carry + 1e-20 * sil.sum(), sil[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()
    fwd = lambda p: fwd_impl(p, quat, sigma)

    @functools.partial(jax.jit, static_argnames=())
    def fwdbwd_impl(p, quat, sigma, tgt, cfg=cfg):
        def loss(q):
            sil = pointcloud_project(cfg, q, quat, sigma).silhouette
            return jnp.mean((sil - tgt) ** 2)

        def body(carry, _):
            g = jax.grad(loss)(carry)
            return carry + 1e-20 * g.sum(), g[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()
    fwdbwd = lambda p: fwdbwd_impl(p, quat, sigma, tgt)

    t0 = time.perf_counter()
    bench(fwd, f"{mode} fwd")
    print(f"  (compile+2 runs took {time.perf_counter()-t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    bench(fwdbwd, f"{mode} fwd+bwd")
    print(f"  (compile+2 runs took {time.perf_counter()-t0:.0f}s)", flush=True)
