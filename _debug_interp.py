import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, o_ref):
    o_ref[:] = pltpu.repeat(x_ref[:], 3, axis=1)
x = jnp.arange(8*4, dtype=jnp.float32).reshape(8, 4)
out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 12), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), interpret=True)(x)
print('interp repeat row0:', out[0])

from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.voxelize import pointcloud2voxels_scatter
from dpcx.render.gauss import smoothen_voxels3d
from dpcx.render.drc import drc_projection
D, N = 8, 64
pts = jax.random.uniform(jax.random.PRNGKey(0), (1, N, 3), minval=-0.45, maxval=0.45)
sig = jnp.asarray(1e-6)
sp, _ = pallas_project(pts, D, sig, 2, interpret=True)
g = pointcloud2voxels_scatter(pts, D)
g2 = smoothen_voxels3d(g, sig, 2)
sx, _ = drc_projection(g2)
print('v2 identity-blur maxdiff:', float(jnp.abs(sp-sx).max()))
sig = jnp.asarray(0.8)
sp, _ = pallas_project(pts, D, sig, 2, interpret=True)
g2 = smoothen_voxels3d(g, sig, 2)
sx, _ = drc_projection(g2)
print('v2 blur maxdiff:', float(jnp.abs(sp-sx).max()))
