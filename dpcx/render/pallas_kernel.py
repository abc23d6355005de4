"""Fused Pallas TPU kernel: trilinear splat -> Gaussian blur -> DRC project.

This is the framework's native-performance component (SURVEY.md §2.4): the
TPU-idiomatic replacement for the reference's scatter_nd + conv3d + cumprod
chain (dpc/util/point_cloud.py::pointcloud2voxels3d_fast,
::smoothen_voxels3d, dpc/util/drc.py::drc_projection), fused so the D^3
occupancy grid lives only in VMEM and never round-trips HBM.

Design (one grid program per batch sample):

1. SPLAT — TPU has no atomic scatter, so the trilinear splat is a dense
   contraction per z-window (see voxelize.pointcloud2voxels_matmul for the
   dense oracle form):
       grid[z, y, x] = sum_n Wz[n,z] * Wy[n,y] * Wx[n,x],
       W*[n,i] = relu(1 - |g_n - i|)   (hat weights from broadcasted iota)
   The kernel exploits Z-SPARSITY: points arrive SORTED BY DEPTH (an XLA
   argsort pre-pass — sorting is cheap on TPU, scattering is not), so a
   chunk of C consecutive points only touches a narrow band of z-slabs.
   Per chunk, scalar-prefetched window metadata (z_base, n_trips) drives a
   dynamic-trip-count loop over G-slab windows:
       A[n, g*D + y] = Wz[n, z_base + k*G + g] * Wy[n, y]   (VPU)
       grid[z_base + k*G ..+G, :, :] += A^T @ Wx            (MXU, K = C)
   Work scales with the points' actual z-span instead of D — exact for any
   distribution because trips extend until the chunk's span is covered.
   The grid scratch has G pad slabs at the top: out-of-range cells land in
   the pad and are never read (== the reference's out-of-grid clipping).
2. BLUR — separable Gaussian as blockwise IN-PLACE Toeplitz/Kronecker
   matmuls with K [D, D] (values traced, so sigma annealing never
   recompiles): kron(I_Gb, K^T) @ X @ K per Gb z-slabs, then
   kron(K^T, I_Gb) @ X per Gb y-slabs — a single D^3 VMEM grid suffices.
3. DRC — running-transmittance loop over z (VPU):
       p_z = o_z * T;  sil += p_z;  depth += d_z * p_z;  T *= (1 - o_z)

acc_dtype selects fp32 parity mode (HIGHEST matmul precision — this JAX
build defaults f32 matmuls to a single bf16 MXU pass, ~3e-3 rel error) or
bf16 perf mode (bf16 operands, fp32 accumulate).

BACKWARD (SURVEY.md §7 "VJP fidelity"): a handwritten backward kernel
(_fused_bwd_kernel) covers D <= 64 — DRC cotangent via the
total-minus-prefix identity dL/do_z = T_z phi_z - (Total - prefix_z)/(1-o_z),
blur backward through the same symmetric Toeplitz matmuls, and splat
coordinate gradients from two extra MXU matmuls per window trip with
hat-derivative masks. The forward sorts with a multi-operand lax.sort
(index payload only on the VJP path); the backward un-sorts its cotangents
with another multi-operand sort keyed by the saved order (no gather
anywhere). D > 64 dispatches to the depth-blocked kernel
(pallas_blocked.py), whose forward saves the blurred volume as the VJP
residual so its two-pass backward never re-splats/re-blurs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpcx.render import pallas_blocked as _blocked
from dpcx.render.drc import drc_projection
from dpcx.render.gauss import blur_matrix

# stage-ablation switch shared with the blocked kernel (bench-only):
# subset of {"splat", "zblur", "yxblur", "drc"} read at trace time
def _skips():
    return _blocked.DEBUG_SKIP


# trilinear hat weights / derivatives / f32 iota are shared with the
# depth-blocked kernel — single source of the splat-weight definition
from dpcx.render.pallas_blocked import _dhat_t, _hat_t, _iota_f32  # noqa: E402


def _fused_kernel(
    zbase_ref,    # [B, n_chunks] int32 (SMEM, scalar-prefetched)
    ntrips_ref,   # [B, n_chunks] int32 (SMEM, scalar-prefetched)
    counts_ref,   # [2] int32 (SMEM): (n_chunks, S) as runtime values so
                  # Mosaic cannot statically unroll the loops — full unroll
                  # stack-allocates per-iteration temporaries (~70 MB OOM)
    g_ref,        # [S, 4, N] z-sorted grid coords, fields on sublanes and
                  # POINTS ON LANES — a [.., N, 4] layout would pad the
                  # 4-wide trailing dim to 128 lanes (32x VMEM blowup)
    kmat_ref,     # [D, D] blur Toeplitz
    kronA_ref,    # [Gb*D, Gb*D] = kron(I_Gb, K^T) (blur y, Gb slabs/matmul)
    kronB_ref,    # [Gb*D, Gb*D] = kron(K^T, I_Gb) (blur z, Gb y-slabs)
    sil_ref,      # [S, D, D] out
    depth_ref,    # [S, D, D] out
    grid_ref,     # [D + G, D, D] scratch (VMEM; G pad slabs at top).
                  # The ONLY D^3 buffer: all blur passes are blockwise
                  # in-place (each matmul reads and writes its own block)
    *,
    num_points: int,
    vox: int,
    z_group: int,
    blur_group: int,
    n_chunk: int,
    samples_per_program: int,
    with_depth: bool,
    acc_dtype,
):
    D, G, C = vox, z_group, n_chunk
    Gb = blur_group
    S = samples_per_program
    n_chunks = num_points // C
    grid_dtype = grid_ref.dtype
    prog = pl.program_id(0)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # transposed layout: A^T [G*D, C] with cells on SUBLANES, points on
    # LANES — matches the [.., 4, N] input layout with no transposes
    cell_sub = _iota_f32((D, 1), 0)                      # [D, 1]
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)      # [G*D, 1]

    hat_t = _hat_t  # [R, 1] cell ids x [1, C] coords -> [R, C] weights

    kmat = kmat_ref[:].astype(acc_dtype)       # [D, D]
    kronA = kronA_ref[:].astype(acc_dtype)     # [Gb*D, Gb*D]
    kronB = kronB_ref[:].astype(acc_dtype)
    n_bgroups = D // Gb

    def sample_body(s, _):
        b = prog * S + s
        # ---- stage 1: sorted-window splat ----
        grid_ref[:] = jnp.zeros((D + G, D, D), grid_dtype)

        def chunk_body(c, _):
            zb = zbase_ref[b, c]
            nt = ntrips_ref[b, c]
            gz = g_ref[s, 0:1, pl.ds(c * C, C)]  # [1, C]
            gy = g_ref[s, 1:2, pl.ds(c * C, C)]
            gx = g_ref[s, 2:3, pl.ds(c * C, C)]
            pw = g_ref[s, 3:4, pl.ds(c * C, C)]
            wy_t = pltpu.repeat(
                hat_t(cell_sub, gy).astype(acc_dtype), G, axis=0
            )                                              # [G*D, C] tiled
            wx_t = hat_t(cell_sub, gx).astype(acc_dtype)   # [D, C]

            def trip(k, _):
                z0 = zb + k * G
                ids = row_z + z0.astype(jnp.float32)
                a_t = (
                    (hat_t(ids, gz) * pw).astype(acc_dtype) * wy_t
                )                                          # [G*D, C]
                slab = jax.lax.dot_general(  # contract the point lanes
                    a_t,
                    wx_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec,
                )  # [G*D, D]
                grid_ref[pl.ds(z0, G), :, :] += slab.reshape(
                    G, D, D
                ).astype(grid_dtype)
                return 0

            jax.lax.fori_loop(0, nt, trip, 0)
            return 0

        # dynamic bound (from SMEM) so the loop cannot be unrolled
        if "splat" not in _skips():
            jax.lax.fori_loop(0, counts_ref[0], chunk_body, 0)

        # ---- stage 2: separable blur, G slabs per matmul ----
        # Pass A handles y and x for G z-slabs at once on merged (g, y)
        # rows: t = kron(I_G, K^T) @ X @ K    with X [G*D, D]
        # Pass B contracts z for G y-slabs on merged (z, g) rows:
        #   t = kron(K^T, I_G) @ X
        def blur_xy_impl(zg, _):
            x = (
                grid_ref[pl.ds(zg * Gb, Gb), :, :]
                .reshape(Gb * D, D)
                .astype(acc_dtype)
            )  # rows (g, y)
            t = jax.lax.dot_general(  # blur y across all G slabs
                kronA, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec,
            )
            t = jax.lax.dot_general(  # blur x
                t.astype(acc_dtype), kmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec,
            )
            grid_ref[pl.ds(zg * Gb, Gb), :, :] = t.reshape(
                Gb, D, D
            ).astype(grid_dtype)
            return 0

        if "yxblur" not in _skips():
            jax.lax.fori_loop(0, n_bgroups, blur_xy_impl, 0)

        def blur_z(yg, _):
            # in-place: the z-contraction for a y-block reads and writes
            # only that block, so no second D^3 scratch is needed.
            # dim-1 dynamic slicing requires sublane-aligned offsets, so
            # Gb is >= 8 regardless of the splat window G.
            x = (
                grid_ref[:D, pl.ds(yg * Gb, Gb), :]
                .reshape(D * Gb, D)
                .astype(acc_dtype)
            )  # rows (z, g)
            t = jax.lax.dot_general(
                kronB, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec,
            )
            grid_ref[:D, pl.ds(yg * Gb, Gb), :] = t.reshape(
                D, Gb, D
            ).astype(grid_dtype)
            return 0

        if "zblur" not in _skips():
            jax.lax.fori_loop(0, n_bgroups, blur_z, 0)

        # ---- stage 3: DRC expected-visibility reduction over z ----
        # G slabs loaded per dynamic iteration; the (inherently
        # sequential) z recurrence runs statically unrolled in the group.
        def drc_body(zg, carry):
            sil, depth, trans = carry
            og = grid_ref[pl.ds(zg * Gb, Gb), :, :]  # [Gb, D, D]
            for g in range(Gb):
                o = jnp.clip(og[g].astype(jnp.float32), 0.0, 1.0 - 1e-5)
                p_stop = o * trans
                sil = sil + p_stop
                if with_depth:
                    d_z = (
                        (zg * Gb + g).astype(jnp.float32) + 0.5
                    ) / D - 0.5
                    depth = depth + d_z * p_stop
                trans = trans * (1.0 - o)
            return sil, depth, trans

        zero = jnp.zeros((D, D), jnp.float32)
        sil, depth, trans = jax.lax.fori_loop(
            0, 0 if "drc" in _skips() else n_bgroups, drc_body,
            (zero, zero, jnp.ones((D, D), jnp.float32)),
        )
        sil_ref[pl.ds(s, 1)] = sil.reshape(1, D, D)
        if with_depth:
            # rays exiting the volume get background depth 1.0
            depth_ref[pl.ds(s, 1)] = (depth + 1.0 * trans).reshape(1, D, D)
        else:
            depth_ref[pl.ds(s, 1)] = jnp.zeros((1, D, D), jnp.float32)
        return 0

    jax.lax.fori_loop(0, counts_ref[1], sample_body, 0)


def _fused_bwd_kernel(
    zbase_ref,    # [B, n_chunks] int32 (SMEM)
    ntrips_ref,   # [B, n_chunks] int32 (SMEM)
    counts_ref,   # [2] int32 (SMEM): (n_chunks, S)
    g_ref,        # [S, 4, N] z-sorted coords (z, y, x, w), points on lanes
    kmat_ref,     # [D, D]
    kronA_ref,    # [Gb*D, Gb*D]
    kronB_ref,    # [Gb*D, Gb*D]
    dsil_ref,     # [S, D, D] cotangent of the silhouette
    ddepth_ref,   # [S, D, D] cotangent of the depth map
    dout_ref,     # [S, 4, N] out: d(z, y, x, w) per sorted point
    grid_ref,     # [D + G, D, D] f32 scratch
    *,
    num_points: int,
    vox: int,
    z_group: int,
    blur_group: int,
    n_chunk: int,
    samples_per_program: int,
    with_depth: bool,
    acc_dtype,
):
    """Handwritten backward of splat -> blur -> DRC.

    Per sample: (A) recompute the blurred occupancy grid exactly as the
    forward does; (B) one DRC forward pass accumulating
    Total = sum_z p_z*phi_z (+ d_bg term), phi_z = dsil + ddepth*d_z;
    (C) a second pass converting o_z -> dL/do_z in place using
    dL/do_z = T_z*phi_z - R_z/(1-o_z) with R_z = Total - prefix_z
    (the cumprod gradient without materializing per-z transmittances);
    (D) blur backward = the same symmetric Toeplitz matmuls; (E) splat
    backward per chunk window: with a_t the forward left operand,
    v = dG @ wx^T gives dL/da_t and t1 = dG^T @ a_t gives dL/dwx, from
    which the coordinate gradients are hat-derivative masked row/column
    reductions — all in the points-on-lanes layout, two extra MXU matmuls
    per trip.
    """
    D, G, C = vox, z_group, n_chunk
    Gb = blur_group
    S = samples_per_program
    grid_dtype = grid_ref.dtype
    prog = pl.program_id(0)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    cell_sub = _iota_f32((D, 1), 0)                      # [D, 1]
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)      # [G*D, 1]

    hat_t, dhat_t = _hat_t, _dhat_t

    kmat = kmat_ref[:].astype(acc_dtype)
    kronA = kronA_ref[:].astype(acc_dtype)
    kronB = kronB_ref[:].astype(acc_dtype)
    n_bgroups = D // Gb

    def sample_body(s, _):
        b = prog * S + s

        # ---- (A) recompute splat + blur (identical to forward) ----
        grid_ref[:] = jnp.zeros((D + G, D, D), grid_dtype)

        def chunk_fwd(c, _):
            zb = zbase_ref[b, c]
            nt = ntrips_ref[b, c]
            gz = g_ref[s, 0:1, pl.ds(c * C, C)]
            gy = g_ref[s, 1:2, pl.ds(c * C, C)]
            gx = g_ref[s, 2:3, pl.ds(c * C, C)]
            pw = g_ref[s, 3:4, pl.ds(c * C, C)]
            wy_t = pltpu.repeat(
                hat_t(cell_sub, gy).astype(acc_dtype), G, axis=0
            )
            wx_t = hat_t(cell_sub, gx).astype(acc_dtype)

            def trip(k, _):
                z0 = zb + k * G
                ids = row_z + z0.astype(jnp.float32)
                a_t = (hat_t(ids, gz) * pw).astype(acc_dtype) * wy_t
                slab = jax.lax.dot_general(
                    a_t, wx_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec,
                )
                grid_ref[pl.ds(z0, G), :, :] += slab.reshape(
                    G, D, D
                ).astype(grid_dtype)
                return 0

            jax.lax.fori_loop(0, nt, trip, 0)
            return 0

        jax.lax.fori_loop(0, counts_ref[0], chunk_fwd, 0)

        def blur_xy(zg, _):
            x = (
                grid_ref[pl.ds(zg * Gb, Gb), :, :]
                .reshape(Gb * D, D)
                .astype(acc_dtype)
            )
            t = jax.lax.dot_general(
                kronA, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec,
            )
            t = jax.lax.dot_general(
                t.astype(acc_dtype), kmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec,
            )
            grid_ref[pl.ds(zg * Gb, Gb), :, :] = t.reshape(
                Gb, D, D
            ).astype(grid_dtype)
            return 0

        jax.lax.fori_loop(0, n_bgroups, blur_xy, 0)

        def blur_z(yg, _):
            x = (
                grid_ref[:D, pl.ds(yg * Gb, Gb), :]
                .reshape(D * Gb, D)
                .astype(acc_dtype)
            )
            t = jax.lax.dot_general(
                kronB, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec,
            )
            grid_ref[:D, pl.ds(yg * Gb, Gb), :] = t.reshape(
                D, Gb, D
            ).astype(grid_dtype)
            return 0

        jax.lax.fori_loop(0, n_bgroups, blur_z, 0)

        ds = dsil_ref[pl.ds(s, 1)].reshape(D, D)
        dd = ddepth_ref[pl.ds(s, 1)].reshape(D, D)

        def phi(z_scalar):
            if with_depth:
                d_z = (z_scalar + 0.5) / D - 0.5
                return ds + dd * d_z
            return ds

        # ---- (B) DRC forward pass: Total ----
        def total_body(zg, carry):
            total, trans = carry
            og = grid_ref[pl.ds(zg * Gb, Gb), :, :]
            for g in range(Gb):
                o = jnp.clip(og[g].astype(jnp.float32), 0.0, 1.0 - 1e-5)
                z_f = (zg * Gb + g).astype(jnp.float32)
                total = total + o * trans * phi(z_f)
                trans = trans * (1.0 - o)
            return total, trans

        zero = jnp.zeros((D, D), jnp.float32)
        total, trans_final = jax.lax.fori_loop(
            0, n_bgroups, total_body,
            (zero, jnp.ones((D, D), jnp.float32)),
        )
        if with_depth:
            total = total + dd * 1.0 * trans_final  # background depth term

        # ---- (C) o -> dL/do in place ----
        def do_body(zg, carry):
            prefix, trans = carry
            og = grid_ref[pl.ds(zg * Gb, Gb), :, :]
            outs = []
            for g in range(Gb):
                o_raw = og[g].astype(jnp.float32)
                o = jnp.clip(o_raw, 0.0, 1.0 - 1e-5)
                z_f = (zg * Gb + g).astype(jnp.float32)
                ph = phi(z_f)
                prefix = prefix + o * trans * ph
                do = trans * ph - (total - prefix) / (1.0 - o)
                # clip backward: zero gradient where the forward clipped
                do = jnp.where(o_raw < 1.0 - 1e-5, do, 0.0)
                outs.append(do.astype(grid_dtype))
                trans = trans * (1.0 - o)
            grid_ref[pl.ds(zg * Gb, Gb), :, :] = jnp.stack(outs, axis=0)
            return prefix, trans

        jax.lax.fori_loop(
            0, n_bgroups, do_body,
            (zero, jnp.ones((D, D), jnp.float32)),
        )
        # zero the pad slabs so splat-bwd windows reaching into the pad
        # contribute nothing (matches the forward's discard semantics)
        grid_ref[pl.ds(D, G), :, :] = jnp.zeros((G, D, D), grid_dtype)

        # ---- (D) blur backward: same symmetric Toeplitz matmuls ----
        jax.lax.fori_loop(0, n_bgroups, blur_z, 0)
        jax.lax.fori_loop(0, n_bgroups, blur_xy, 0)

        # ---- (E) splat backward per chunk window ----
        def chunk_bwd(c, _):
            zb = zbase_ref[b, c]
            nt = ntrips_ref[b, c]
            gz = g_ref[s, 0:1, pl.ds(c * C, C)]
            gy = g_ref[s, 1:2, pl.ds(c * C, C)]
            gx = g_ref[s, 2:3, pl.ds(c * C, C)]
            pw = g_ref[s, 3:4, pl.ds(c * C, C)]
            hy = hat_t(cell_sub, gy)
            dhy = dhat_t(cell_sub, gy)
            wy_t = pltpu.repeat(hy.astype(acc_dtype), G, axis=0)
            dwy_t = pltpu.repeat(dhy.astype(acc_dtype), G, axis=0)
            wx_t = hat_t(cell_sub, gx).astype(acc_dtype)    # [D, C]
            dwx_t = dhat_t(cell_sub, gx).astype(acc_dtype)  # [D, C]

            wy32 = wy_t.astype(jnp.float32)
            dwy32 = dwy_t.astype(jnp.float32)

            def trip(k, carry):
                agz, agy, agx, apw = carry
                z0 = zb + k * G
                ids = row_z + z0.astype(jnp.float32)
                hz = hat_t(ids, gz).astype(acc_dtype)        # [G*D, C]
                a_t = (hz * pw.astype(acc_dtype)) * wy_t     # [G*D, C]
                dgw = (
                    grid_ref[pl.ds(z0, G), :, :]
                    .reshape(G * D, D)
                    .astype(acc_dtype)
                )
                # dL/da_t[r, c] = sum_x dG[r, x] wx[x, c]
                v = jax.lax.dot_general(
                    dgw, wx_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec,
                )  # [G*D, C]
                # dL/dwx[x, c] = sum_r dG[r, x] a_t[r, c]
                t1 = jax.lax.dot_general(
                    dgw, a_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec,
                )  # [D, C]
                # z/y separability: within a trip, hz/dhz are constant
                # across the D y-rows of each z-slab and hy/dhy are
                # shared across slabs, so the [G*D, C] row reductions
                # factor into per-slab partial sums P/Q times [G, C]
                # hat terms — 2 products + 2 segmented sums instead of
                # 3 triple products + 4 full-height reductions (this
                # loop is VPU-bound; the matmuls above are ~2% of it)
                P = (v * wy32).reshape(G, D, C).sum(axis=1)   # [G, C]
                Q = (v * dwy32).reshape(G, D, C).sum(axis=1)  # [G, C]
                zslab = z0.astype(jnp.float32) + _iota_f32((G, 1), 0)
                hz_g = hat_t(zslab, gz)                       # [G, C]
                dhz_g = dhat_t(zslab, gz)                     # [G, C]
                pw32 = pw
                agz = agz + jnp.sum(
                    dhz_g * P, axis=0, keepdims=True
                ) * pw32
                agy = agy + jnp.sum(
                    hz_g * Q, axis=0, keepdims=True
                ) * pw32
                agx = agx + jnp.sum(
                    t1 * dwx_t.astype(jnp.float32), axis=0, keepdims=True
                )
                apw = apw + jnp.sum(hz_g * P, axis=0, keepdims=True)
                return agz, agy, agx, apw

            z1 = jnp.zeros((1, C), jnp.float32)
            agz, agy, agx, apw = jax.lax.fori_loop(
                0, nt, trip, (z1, z1, z1, z1)
            )
            dout_ref[s, 0:1, pl.ds(c * C, C)] = agz
            dout_ref[s, 1:2, pl.ds(c * C, C)] = agy
            dout_ref[s, 2:3, pl.ds(c * C, C)] = agx
            dout_ref[s, 3:4, pl.ds(c * C, C)] = apw
            return 0

        jax.lax.fori_loop(0, counts_ref[0], chunk_bwd, 0)
        return 0

    jax.lax.fori_loop(0, counts_ref[1], sample_body, 0)


def _pallas_backward(
    sorted_t: jax.Array,  # [B, 4, N]
    kmat: jax.Array,
    d_sil: jax.Array,     # [B, D, D]
    d_depth: jax.Array,   # [B, D, D]
    vox: int,
    with_depth: bool,
    acc_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """-> d(sorted_t) [B, 4, N] via the handwritten backward kernel."""
    B, _, N = sorted_t.shape
    D = vox
    G, C, S, Gb = _pack_params(B, N, D)
    zb, nt = _window_metadata(sorted_t[:, 0, :], D, G, C)
    n_chunks = N // C
    kdt = jnp.dtype(acc_dtype)
    kronA = jnp.kron(jnp.eye(Gb, dtype=kmat.dtype), kmat.T).astype(kdt)
    kronB = jnp.kron(kmat.T, jnp.eye(Gb, dtype=kmat.dtype)).astype(kdt)
    kernel = functools.partial(
        _fused_bwd_kernel,
        num_points=N,
        vox=D,
        z_group=G,
        blur_group=Gb,
        n_chunk=C,
        samples_per_program=S,
        with_depth=with_depth,
        acc_dtype=kdt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec(
                (S, 4, N), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, D), lambda p, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Gb * D, Gb * D), lambda p, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Gb * D, Gb * D), lambda p, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S, D, D), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S, D, D), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (S, 4, N), lambda p, *_: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((D + G, D, D), jnp.float32),
        ],
    )
    args = jax.lax.optimization_barrier(
        (zb, nt, jnp.asarray([n_chunks, S], jnp.int32), sorted_t, kmat,
         kronA, kronB, d_sil, d_depth)
    )
    d_sorted = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4, N), jnp.float32),
        interpret=interpret,
    )(*args)
    return d_sorted


def _chunk_size(num_points: int) -> int:
    """Points per chunk: a multiple of 128 (chunk slices start at c*C in
    the LANE dim — Mosaic needs provably 128-aligned dynamic offsets), as
    large as 512. The caller pads N to a multiple of this."""
    return min(512, 128 * (-(-num_points // 128)))


def _pick_tiling(num_points: int, vox: int) -> tuple[int, int]:
    """(z_group, n_chunk): G*D ~ 256 lanes per window, C sized so a sorted
    chunk's typical z-span fits in about one window. (G*D ~ 512 was the
    round-1 default; the round-2 sweep at D=64/N=16k measured G=4 ~8%
    faster than G=8 — the dense window burns G*D*C work per trip while a
    sorted chunk only spans 2-3 slabs — and G<4 loses it to trip count.)"""
    g = max(1, min(vox, 256 // vox))
    while vox % g:
        g -= 1
    c = _chunk_size(num_points)
    if num_points % c:
        raise ValueError(
            f"N={num_points} must be a multiple of C={c} (pallas_project "
            "pads before calling)"
        )
    return g, c


def _window_metadata(
    gz_sorted: jax.Array, vox: int, z_group: int, n_chunk: int
) -> tuple[jax.Array, jax.Array]:
    """Per-chunk (z_base, n_trips) from sorted depth coords [B, N]."""
    B, N = gz_sorted.shape
    D, G, C = vox, z_group, n_chunk
    gz_c = gz_sorted.reshape(B, N // C, C)
    lo = jnp.floor(gz_c[..., 0])       # lowest cell touched
    hi = jnp.floor(gz_c[..., -1]) + 1  # highest cell touched
    zb = jnp.clip(lo, 0, D - 1)
    ze = jnp.clip(hi, 0, D - 1)
    nt = jnp.ceil((ze - zb + 1) / G)
    nt = jnp.where((hi < 0) | (lo > D - 1), 0, nt)
    return zb.astype(jnp.int32), nt.astype(jnp.int32)


# bench-only tiling overrides (scripts/sweep_fused_tiles.py): keys
# "z_group" / "n_chunk" / "samples" replace the picked values at trace time
TILE_OVERRIDES: dict = {}


def _pack_params(B: int, N: int, D: int) -> tuple[int, int, int, int]:
    """(G, C, S, Gb) tiling for the fused kernels."""
    if D % 8:
        raise ValueError(
            f"fused Pallas kernel requires vox_size % 8 == 0, got {D} "
            "(blur/DRC process z in groups of 8 slabs)"
        )
    G, C = _pick_tiling(N, D)
    G = TILE_OVERRIDES.get("z_group", G)
    C = TILE_OVERRIDES.get("n_chunk", C)
    budget = (2 if D <= 64 else 1) * 1024 * 1024
    S = B
    while S > 1 and (B % S or S * N * 16 > budget):
        S -= 1
    while B % S:
        S -= 1
    S = TILE_OVERRIDES.get("samples", S)
    Gb = min(D, 8)
    return G, C, S, Gb


def _pallas_forward(
    sorted_t: jax.Array,  # [B, 4, N] z-SORTED coords (z,y,x,w), pts on lanes
    kmat: jax.Array,      # [D, D]
    vox: int,
    with_depth: bool,
    acc_dtype: str = "float32",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    B, _, N = sorted_t.shape
    D = vox
    G, C, S, Gb = _pack_params(B, N, D)
    zb, nt = _window_metadata(sorted_t[:, 0, :], D, G, C)
    n_chunks = N // C

    kernel = functools.partial(
        _fused_kernel,
        num_points=N,
        vox=D,
        z_group=G,
        blur_group=Gb,
        n_chunk=C,
        samples_per_program=S,
        with_depth=with_depth,
        acc_dtype=jnp.dtype(acc_dtype),
    )
    # kron matrices are shipped in the acc dtype: at D=128 the f32 pair
    # would cost 8 MB of VMEM on its own
    kdt = jnp.dtype(acc_dtype)
    kronA = jnp.kron(jnp.eye(Gb, dtype=kmat.dtype), kmat.T).astype(kdt)
    kronB = jnp.kron(kmat.T, jnp.eye(Gb, dtype=kmat.dtype)).astype(kdt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec(
                (S, 4, N), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, D), lambda p, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Gb * D, Gb * D), lambda p, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Gb * D, Gb * D), lambda p, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (S, D, D), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S, D, D), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((D + G, D, D), jnp.float32),
        ],
    )
    # operands MUST NOT be XLA constants: a constant pallas operand costs
    # ~0.9 ms per call through the axon runtime (counts always folds;
    # kmat/kron fold when sigma is a literal). See NOTES.md.
    args = jax.lax.optimization_barrier(
        (zb, nt, jnp.asarray([n_chunks, S], jnp.int32), sorted_t, kmat,
         kronA, kronB)
    )
    sil, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * D * 12 + 8 * B * D**4,
            bytes_accessed=B * (N * 16 + 2 * D * D * 4) + D * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return sil, depth


def _xla_reference(
    sorted_t: jax.Array, kmat: jax.Array, vox: int, with_depth: bool
) -> tuple[jax.Array, jax.Array]:
    """Pure-XLA recompute of the fused kernel's math (VJP fallback for
    shapes the handwritten backward kernel does not cover)."""
    D = vox
    coords_w = jnp.moveaxis(sorted_t, 1, 2)  # [B, N, 4]
    g = coords_w[..., :3]
    pw = coords_w[..., 3]
    cells = jnp.arange(D, dtype=coords_w.dtype)
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(g[..., 0:1] - cells)) * pw[..., None]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(g[..., 1:2] - cells))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(g[..., 2:3] - cells))

    def slab(z):
        wzy = wz[:, :, z][..., None] * wy
        return jnp.einsum(
            "bny,bnx->byx", wzy, wx, precision=jax.lax.Precision.HIGHEST
        )

    grid = jnp.moveaxis(jax.lax.map(slab, jnp.arange(D)), 0, 1)
    p = jax.lax.Precision.HIGHEST
    grid = jnp.einsum("bzyx,xi->bzyi", grid, kmat, precision=p)
    grid = jnp.einsum("bzyx,yi->bzix", grid, kmat, precision=p)
    grid = jnp.einsum("bzyx,zi->biyx", grid, kmat, precision=p)
    sil, depth = drc_projection(grid, with_depth=True)
    return sil, depth


def _sort_with_order(
    coords_t: jax.Array, with_order: bool = True
) -> tuple[jax.Array, jax.Array | None]:
    """Depth-sort via multi-operand lax.sort with an index payload — far
    cheaper on TPU than argsort + take_along_axis (no gather in the
    forward). Input is CHANNEL-MAJOR [B, 4, N] (rows z, y, x, w: each sort
    operand is a contiguous row, not a stride-4 slice). Returns
    ([B, 4, N] sorted, [B, N] original indices or None).

    ``with_order=False`` drops the index payload — the primal (non-VJP)
    path never un-sorts, so it saves one [B, N] int32 operand."""
    B, _, N = coords_t.shape
    ops = [coords_t[:, k, :] for k in range(4)]
    if with_order:
        ops.append(
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        )
    out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    return jnp.stack(out[:4], axis=1), (out[4] if with_order else None)


def _forward_dispatch(sorted_t, kmat, vox, radius, with_depth, acc_dtype,
                      interpret):
    """D <= 64: whole-grid-in-VMEM kernel; D > 64: depth-blocked kernel
    (running-transmittance carry, SURVEY.md §5) — 128^3 never
    materializes a full D^3 buffer in VMEM."""
    if vox <= 64:
        return _pallas_forward(
            sorted_t, kmat, vox, with_depth, acc_dtype, interpret
        )
    from dpcx.render.pallas_blocked import blocked_forward

    return blocked_forward(
        sorted_t, kmat, vox, radius, with_depth, acc_dtype, interpret
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7)
)
def _fused_render(coords_t, kmat, vox, radius, with_depth, acc_dtype,
                  interpret, save_grid):
    sorted_t, _ = _sort_with_order(coords_t, with_order=False)
    return _forward_dispatch(
        sorted_t, kmat, vox, radius, with_depth, acc_dtype, interpret
    )


def _fused_fwd(coords_t, kmat, vox, radius, with_depth, acc_dtype,
               interpret, save_grid):
    sorted_t, order = _sort_with_order(coords_t)
    if vox <= 64:
        out = _pallas_forward(
            sorted_t, kmat, vox, with_depth, acc_dtype, interpret
        )
        grid = None
    elif save_grid:
        from dpcx.render.pallas_blocked import blocked_forward

        # save the blurred volume as the VJP residual so the two-pass
        # backward never re-splats/re-blurs (HBM trade: 8 MB/sample f32
        # at 128^3, held from forward to backward — gate off via
        # cfg.remat for memory-constrained K-candidate graphs)
        sil, depth, grid = blocked_forward(
            sorted_t, kmat, vox, radius, with_depth, acc_dtype,
            interpret, save_grid=True,
        )
        out = (sil, depth)
    else:
        from dpcx.render.pallas_blocked import blocked_forward

        out = blocked_forward(
            sorted_t, kmat, vox, radius, with_depth, acc_dtype, interpret
        )
        grid = None
    return out, (sorted_t, order, kmat, grid)


def _fused_bwd(vox, radius, with_depth, acc_dtype, interpret, save_grid,
               res, cts):
    """Backward: handwritten Pallas kernel for D <= 64 (whole grid in
    VMEM) or the two-pass depth-blocked kernel for D > 64 — no XLA
    fallback at any shipped shape. Cotangents come back in sorted order
    and are un-sorted here by a multi-operand lax.sort keyed on the saved
    `order` (a permutation sorts back to identity) — no gather on either
    the forward or backward path.

    NOTE: the cotangent for kmat (i.e. for the blur sigma) is ZERO on the
    kernel path — the sigma anneal is a schedule, not a learned parameter.
    """
    sorted_t, order, kmat, grid = res
    d_sil, d_depth = cts
    if d_depth is None or not with_depth:
        d_depth = jnp.zeros_like(d_sil)
    if vox <= 64:
        d_sorted = _pallas_backward(
            sorted_t, kmat, d_sil, d_depth, vox, with_depth, acc_dtype,
            interpret,
        )
    else:
        from dpcx.render.pallas_blocked import blocked_backward

        d_sorted = blocked_backward(
            sorted_t, kmat, d_sil, d_depth, vox, radius, with_depth,
            acc_dtype, interpret, grid=grid,
        )
    dkmat = jnp.zeros_like(kmat)
    # un-sort WITHOUT a gather: `order` is a permutation, so sorting by it
    # restores original point positions — one multi-operand lax.sort
    # (cheap on TPU) instead of argsort + a [B, 4, N] take_along_axis
    # (gathers are slow on TPU; see NOTES.md)
    _, d0, d1, d2, d3 = jax.lax.sort(
        (order, d_sorted[:, 0], d_sorted[:, 1], d_sorted[:, 2],
         d_sorted[:, 3]),
        dimension=1,
        num_keys=1,
    )
    d_ct = jnp.stack([d0, d1, d2, d3], axis=1)
    return d_ct, dkmat


_fused_render.defvjp(_fused_fwd, _fused_bwd)


def pallas_project(
    points_ndc: jax.Array,
    vox_size: int,
    sigma_vox: jax.Array,
    kernel_radius: int,
    point_weights: jax.Array | None = None,
    with_depth: bool = False,
    acc_dtype: str = "float32",
    interpret: bool | None = None,
    save_grid: bool = True,
) -> tuple[jax.Array, jax.Array | None]:
    """Fused splat->blur->DRC. points_ndc [B, N, 3] -> sil [B, D, D].

    Drop-in replacement for the XLA stage-2..4 pipeline in
    project.pointcloud_project (stage 1, the perspective transform, stays in
    XLA where it fuses with upstream compute).
    """
    return pallas_project_t(
        jnp.swapaxes(points_ndc, -1, -2),
        vox_size,
        sigma_vox,
        kernel_radius,
        point_weights=point_weights,
        with_depth=with_depth,
        acc_dtype=acc_dtype,
        interpret=interpret,
        save_grid=save_grid,
    )


def pallas_project_t(
    ndc_t: jax.Array,
    vox_size: int,
    sigma_vox: jax.Array,
    kernel_radius: int,
    point_weights: jax.Array | None = None,
    with_depth: bool = False,
    acc_dtype: str = "float32",
    interpret: bool | None = None,
    save_grid: bool = True,
) -> tuple[jax.Array, jax.Array | None]:
    """CHANNEL-MAJOR fused projection: ndc_t [B, 3, N] (rows x, y, z_ndc,
    from pc_perspective_transform_t) -> sil [B, D, D].

    This is the production entry for the model layer: keeping N on the
    lanes from the transform through the sort avoids the [B, N, 3]
    lane-padded elementwise chain and the stride-4 field slices the
    row-major wrapper pays for."""
    B, _, N = ndc_t.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # NDC -> grid units, row order (z, y, x) (== ndc_to_grid, transposed)
    g_t = (ndc_t[:, ::-1, :] + 0.5) * vox_size - 0.5
    pw = (
        jnp.ones((B, 1, N), ndc_t.dtype)
        if point_weights is None
        else point_weights[:, None, :]
    )
    coords_t = jnp.concatenate([g_t, pw], axis=1)  # [B, 4, N]
    # pad N to a multiple of the chunk size (Mosaic lane alignment) with
    # zero-weight points far past the grid top: they sort to the end,
    # their hat weights at every valid cell are zero, and the padding sits
    # OUTSIDE the custom VJP so cotangents slice back automatically
    c = _chunk_size(N)
    Np = -(-N // c) * c
    if Np != N:
        pad = jnp.zeros((B, 4, Np - N), coords_t.dtype)
        pad = pad.at[:, 0, :].set(4.0 * vox_size)
        coords_t = jnp.concatenate([coords_t, pad], axis=2)
    kmat = blur_matrix(sigma_vox, vox_size, kernel_radius)
    # save_grid: D > 64 forwards stash the blurred volume in HBM as the
    # VJP residual (backward skips both recompute passes); False = the
    # recompute backward (memory-constrained runs; tied to cfg.remat at
    # the model layer). No effect at D <= 64 (whole grid lives in VMEM).
    sil, depth = _fused_render(
        coords_t, kmat, vox_size, kernel_radius, with_depth, acc_dtype,
        interpret, save_grid,
    )
    return sil, (depth if with_depth else None)
