import jax, jax.numpy as jnp, time, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dpcx.render import pallas_kernel as pk
from dpcx.render.gauss import blur_matrix, kernel_radius
from dpcx.render.voxelize import ndc_to_grid

D, N, B = 64, 8192, 16
G, C = pk._pick_tiling(N, D)
pts = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4)
sigma = jnp.asarray(0.02*D); r = kernel_radius(0.05, D, 2.5)
ITERS = 50

def ablated_kernel(stages):
    def kern(zbase_ref, ntrips_ref, g_ref, kmat_ref, kronA_ref, kronB_ref,
             sil_ref, depth_ref, grid_ref, grid2_ref):
        acc_dtype = jnp.bfloat16
        mxu_prec = jax.lax.Precision.DEFAULT
        b = pl.program_id(0)
        n_chunks = N // C
        cell_ids = pk._iota_f32((1, D), 1)
        lane_z = jnp.floor(pk._iota_f32((1, G * D), 1) / D)
        def hat(col, ids):
            return jnp.maximum(0.0, 1.0 - jnp.abs(col - ids))
        grid_ref[:] = jnp.zeros((D + G, D, D), jnp.float32)
        if 'splat' in stages:
            def chunk_body(c, _):
                zb = zbase_ref[b, c]; nt = ntrips_ref[b, c]
                gc = g_ref[0, pl.ds(c * C, C), :]
                gz, pw = gc[:, 0:1], gc[:, 3:4]
                wy_t = pltpu.repeat(hat(gc[:, 1:2], cell_ids).astype(acc_dtype), G, axis=1)
                wx = hat(gc[:, 2:3], cell_ids).astype(acc_dtype)
                def trip(k, _):
                    z0 = zb + k * G
                    ids = lane_z + z0.astype(jnp.float32)
                    a = (hat(gz, ids) * pw).astype(acc_dtype) * wy_t
                    slab = jax.lax.dot_general(a, wx, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=mxu_prec)
                    grid_ref[pl.ds(z0, G), :, :] += slab.reshape(G, D, D)
                    return 0
                jax.lax.fori_loop(0, nt, trip, 0)
                return 0
            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        kmat = kmat_ref[:].astype(acc_dtype)
        kronA = kronA_ref[:].astype(acc_dtype)
        kronB = kronB_ref[:].astype(acc_dtype)
        nzg = D // G
        if 'blur' in stages:
            def blur_xy(zg, _):
                x = grid_ref[pl.ds(zg * G, G), :, :].reshape(G * D, D).astype(acc_dtype)
                t = jax.lax.dot_general(kronA, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=mxu_prec)
                t = jax.lax.dot_general(t.astype(acc_dtype), kmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=mxu_prec)
                grid_ref[pl.ds(zg * G, G), :, :] = t.reshape(G, D, D)
                return 0
            jax.lax.fori_loop(0, nzg, blur_xy, 0)
            def blur_z(yg, _):
                x = grid_ref[:D, pl.ds(yg * G, G), :].reshape(D * G, D).astype(acc_dtype)
                t = jax.lax.dot_general(kronB, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=mxu_prec)
                grid2_ref[:, pl.ds(yg * G, G), :] = t.reshape(D, G, D)
                return 0
            jax.lax.fori_loop(0, nzg, blur_z, 0)
        else:
            grid2_ref[:] = grid_ref[:D]
        if 'drc' in stages:
            def drc_body(zg, carry):
                sil, trans = carry
                og = grid2_ref[pl.ds(zg * G, G), :, :]
                for g in range(G):
                    o = jnp.clip(og[g], 0.0, 1.0 - 1e-5)
                    sil = sil + o * trans
                    trans = trans * (1.0 - o)
                return sil, trans
            sil, trans = jax.lax.fori_loop(0, nzg, drc_body,
                (jnp.zeros((D, D), jnp.float32), jnp.ones((D, D), jnp.float32)))
            sil_ref[0] = sil
        else:
            sil_ref[0] = grid2_ref[0]
        depth_ref[0] = jnp.zeros((D, D), jnp.float32)
    return kern

@functools.partial(jax.jit, static_argnames=('stages',))
def run_scan(p, stages):
    g = ndc_to_grid(p, D)
    cw = jnp.concatenate([g, jnp.ones((B, N, 1))], axis=-1)
    order = jnp.argsort(cw[..., 0], axis=1)
    scw = jnp.take_along_axis(cw, order[..., None], axis=1)
    zb, nt = pk._window_metadata(scw[..., 0], D, G, C)
    kmat = blur_matrix(sigma, D, r)
    kronA = jnp.kron(jnp.eye(G, dtype=kmat.dtype), kmat.T)
    kronB = jnp.kron(kmat.T, jnp.eye(G, dtype=kmat.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 4), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G*D, G*D), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G*D, G*D), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, D, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((D + G, D, D), jnp.float32),
                        pltpu.VMEM((D, D, D), jnp.float32)],
    )
    call = lambda scw_: pl.pallas_call(ablated_kernel(stages), grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, D, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, D, D), jnp.float32)))(zb, nt, scw_, kmat, kronA, kronB)
    def body(carry, _):
        sil, _ = call(carry)
        carry = carry + 1e-20 * sil.sum()
        return carry, sil[0, 0, 0]
    _, s = jax.lax.scan(body, scw, None, length=ITERS)
    return s.sum()

for stages in [('splat',), ('splat','blur'), ('splat','blur','drc'), ('blur','drc'), ()]:
    f = lambda: run_scan(pts, stages)
    f().block_until_ready()
    t0 = time.perf_counter(); f().block_until_ready()
    dt = (time.perf_counter()-t0)/ITERS
    print(f'{str(stages):30s}: {dt*1e6:.0f} us/iter')
