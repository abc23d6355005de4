import jax, jax.numpy as jnp, time
from functools import partial
from dpcx.config import Config
from dpcx.render.project import pointcloud_project

D, N, B = 64, 8192, 16
cfg = Config(vox_size=D, pc_num_points=N, renderer="pallas",
             pallas_acc_dtype="bfloat16", proj_depth=False)
cfg_f32 = cfg.replace(pallas_acc_dtype="float32")
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)

def bench(f, n=50, block_each=False):
    f().block_until_ready()
    t0=time.perf_counter()
    if block_each:
        for _ in range(n): f().block_until_ready()
    else:
        for _ in range(n): o=f()
        o.block_until_ready()
    return (time.perf_counter()-t0)/n

for name, c in [('bf16', cfg), ('f32', cfg_f32)]:
    f = lambda: pointcloud_project(c, pts, quat, sigma).silhouette
    t1 = bench(f, block_each=False)
    t2 = bench(f, block_each=True)
    print(f'{name}: async {t1*1e3:.3f} ms | block-each {t2*1e3:.3f} ms -> {B*N/t2/1e6:.0f} Mpts/s')
