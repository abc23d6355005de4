import jax, jax.numpy as jnp
from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.gauss import kernel_radius
D = 128
for B, N, dt in [(1, 16384, 'bfloat16'), (4, 16384, 'bfloat16')]:
    pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
    try:
        sil, _ = pallas_project(pts, D, jnp.asarray(0.02*D), kernel_radius(0.05, D, 2.5), acc_dtype=dt)
        sil.block_until_ready()
        print(f'D128 B{B} N{N} {dt}: OK sum={float(sil.sum()):.1f}')
    except Exception as e:
        print(f'D128 B{B} N{N} {dt}: FAIL {str(e)[:160]}')
