import jax, jax.numpy as jnp, time
from functools import partial
from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn as pointcloud_project

D, N, B = 64, 8192, 16
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)
ITERS = 100

def make_scan(cfg):
    @jax.jit
    def run(p):
        def body(carry, _):
            sil = pointcloud_project(cfg, carry, quat, sigma).silhouette
            # data dependency so iterations can't be parallelized/elided
            carry = carry + 1e-20 * sil.sum()
            return carry, sil[0, 0, 0]
        out, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()
    return run

for name, cfg in [
    ('pallas_bf16', Config(vox_size=D, renderer="pallas", pallas_acc_dtype="bfloat16")),
    ('pallas_f32', Config(vox_size=D, renderer="pallas", pallas_acc_dtype="float32")),
]:
    f = make_scan(cfg)
    f(pts).block_until_ready()
    t0 = time.perf_counter()
    f(pts).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{name}: {dt*1e6:.1f} us/render -> {B*N/dt/1e6:.0f} Mpts/s')
