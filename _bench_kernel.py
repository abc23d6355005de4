import jax, jax.numpy as jnp, time
from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.gauss import kernel_radius
D, N, B = 64, 8192, 16
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
sigma = jnp.asarray(0.02*D); r = kernel_radius(0.05, D, 2.5)
for dt in ['bfloat16', 'float32']:
    f = lambda: pallas_project(pts, D, sigma, r, acc_dtype=dt)[0]
    s = f(); s.block_until_ready()
    t0=time.perf_counter()
    for _ in range(30): o=f()
    o.block_until_ready()
    tp=(time.perf_counter()-t0)/30
    print(f'{dt}: {tp*1e3:.2f} ms/iter -> {B*N/tp/1e6:.1f} Mpts/s, sum {float(s.sum()):.2f}')
