import jax, jax.numpy as jnp, time
from dpcx.render.voxelize import ndc_to_grid
D, N, B = 64, 8192, 16
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
ITERS = 100

def scan_time(fn):
    @jax.jit
    def run(p):
        w = jnp.arange(N, dtype=jnp.float32)[None, :, None] / N
        def body(carry, _):
            out = fn(carry)
            carry = carry + 1e-20 * (out * w).sum()  # permutation-sensitive
            return carry, out[0, 0, 0]
        _, s = jax.lax.scan(body, p, None, length=ITERS)
        return s.sum()
    run(pts).block_until_ready()
    t0 = time.perf_counter(); run(pts).block_until_ready()
    return (time.perf_counter() - t0) / ITERS

def argsort_gather(p):
    g = ndc_to_grid(p, D)
    cw = jnp.concatenate([g, jnp.ones((B, N, 1))], axis=-1)
    order = jnp.argsort(cw[..., 0], axis=1)
    return jnp.take_along_axis(cw, order[..., None], axis=1)

def multisort(p):
    g = ndc_to_grid(p, D)
    outs = jax.lax.sort(
        (g[..., 0], g[..., 1], g[..., 2], jnp.ones((B, N))),
        dimension=1, num_keys=1)
    return jnp.stack(outs, axis=-1)

def nosort(p):
    g = ndc_to_grid(p, D)
    return jnp.concatenate([g, jnp.ones((B, N, 1))], axis=-1)

print(f'argsort+gather: {scan_time(argsort_gather)*1e6:.0f} us/iter')
print(f'lax.sort multi: {scan_time(multisort)*1e6:.0f} us/iter')
print(f'no sort:        {scan_time(nosort)*1e6:.0f} us/iter')
