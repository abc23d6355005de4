import jax, jax.numpy as jnp, time
from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn as pointcloud_project

ITERS = 60
def scan_bench(cfg, B, N):
    pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
    quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    sigma = jnp.asarray(0.02)
    @jax.jit
    def run(p):
        def body(carry, _):
            sil = pointcloud_project(cfg, carry, quat, sigma).silhouette
            carry = carry + 1e-20 * sil.sum()
            return carry, sil[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()
    run(pts).block_until_ready()
    t0 = time.perf_counter(); run(pts).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return dt, B * N / dt / 1e6

for name, cfg, B, N in [
    ('pallas_bf16 B16 N16k', Config(vox_size=64, renderer="pallas", pallas_acc_dtype="bfloat16"), 16, 16384),
    ('pallas_bf16 B32 N16k', Config(vox_size=64, renderer="pallas", pallas_acc_dtype="bfloat16"), 32, 16384),
    ('xla_scatter B16 N8k', Config(vox_size=64, renderer="xla", xla_splat="scatter"), 16, 8192),
]:
    try:
        dt, mpts = scan_bench(cfg, B, N)
        print(f'{name}: {dt*1e6:.0f} us/render -> {mpts:.0f} Mpts/s')
    except Exception as e:
        print(f'{name}: FAILED {type(e).__name__}: {str(e)[:120]}')
