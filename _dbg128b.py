import jax, jax.numpy as jnp, traceback
from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.gauss import kernel_radius
D = 128
pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 16384, 3), minval=-0.4, maxval=0.4)
try:
    sil, _ = pallas_project(pts, D, jnp.asarray(0.02*D), kernel_radius(0.05, D, 2.5), acc_dtype='bfloat16')
    sil.block_until_ready()
    print('OK', float(sil.sum()))
except Exception:
    traceback.print_exc()
