import jax, jax.numpy as jnp, time
from dpcx.render.voxelize import ndc_to_grid
D, N, B = 64, 8192, 16
ITERS = 50

@jax.jit
def sort_fn(p):
    g = ndc_to_grid(p, D)
    order = jnp.argsort(g[..., 0], axis=1)
    out = jnp.take_along_axis(g, order[..., None], axis=1)
    return (out * (jnp.arange(N)[None, :, None] / N)).sum()

inputs = [jax.random.uniform(jax.random.PRNGKey(i), (B, N, 3)) for i in range(ITERS)]
inputs = [jax.device_put(x) for x in inputs]
jax.block_until_ready(inputs)
r = sort_fn(inputs[0]); r.block_until_ready()

t0 = time.perf_counter()
outs = [sort_fn(x) for x in inputs]
jax.block_until_ready(outs)
t_total = time.perf_counter() - t0
print(f'distinct-input argsort+gather: {t_total/ITERS*1e6:.0f} us/call')

# repeat same input
t0 = time.perf_counter()
outs = [sort_fn(inputs[0]) for _ in range(ITERS)]
jax.block_until_ready(outs)
print(f'same-input repeated:           {(time.perf_counter()-t0)/ITERS*1e6:.0f} us/call')
