import jax, jax.numpy as jnp
from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.gauss import kernel_radius
for B, N in [(1, 16384), (4, 16384), (2, 8192)]:
    pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
    try:
        sil, _ = pallas_project(pts, 64, jnp.asarray(1.28), kernel_radius(0.05, 64, 2.5), acc_dtype='bfloat16')
        sil.block_until_ready()
        print(f'B{B} N{N}: OK sum={float(sil.sum()):.1f}')
    except Exception as e:
        print(f'B{B} N{N}: FAIL {str(e)[:200]}')
