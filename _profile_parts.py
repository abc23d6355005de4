import jax, jax.numpy as jnp, time, functools
from dpcx.render import pallas_kernel as pk
from dpcx.render.gauss import kernel_radius, blur_matrix
from dpcx.render.voxelize import ndc_to_grid

D, N, B = 64, 8192, 16
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
sigma = jnp.asarray(0.02*D); r = kernel_radius(0.05, D, 2.5)

@jax.jit
def prepass(p):
    g = ndc_to_grid(p, D)
    cw = jnp.concatenate([g, jnp.ones((B, N, 1))], axis=-1)
    order = jnp.argsort(cw[..., 0], axis=1)
    sorted_cw = jnp.take_along_axis(cw, order[..., None], axis=1)
    G, C = pk._pick_tiling(N, D)
    zb, nt = pk._window_metadata(sorted_cw[..., 0], D, G, C)
    return sorted_cw, zb, nt

def bench(f, n=30):
    jax.block_until_ready(f())
    t0=time.perf_counter()
    for _ in range(n): o=f()
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

t_pre = bench(lambda: prepass(pts))
print(f'prepass (sort+meta): {t_pre*1e3:.3f} ms')

sorted_cw, zb, nt = prepass(pts)
kmat = blur_matrix(sigma, D, r)
t_kern = bench(lambda: pk._pallas_forward(sorted_cw, kmat, D, False, 'bfloat16', False))
print(f'full fwd (sort inside too): {t_kern*1e3:.3f} ms')
print('nt stats: max', int(nt.max()), 'sum', int(nt.sum()), 'per sample', float(nt.sum())/B)
