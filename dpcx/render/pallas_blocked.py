"""Depth-blocked fused Pallas kernel for large grids (D > 64, e.g. 128^3).

This is the SURVEY.md §5 "long-context analogue" the round-1 kernel lacked:
the DRC reduction is blocked along the depth axis with a RUNNING-
TRANSMITTANCE CARRY, so the D^3 occupancy grid NEVER fully materializes in
VMEM — only one z-block of Dz slabs (plus a 2R blur halo) is resident at a
time. Same reference semantics as the unblocked kernel
(dpc/util/point_cloud.py::pointcloud2voxels3d_fast + ::smoothen_voxels3d +
dpc/util/drc.py::drc_projection; SURVEY.md §2.2 #1/#5/#6), same z-sorted
windowed-matmul splat (see pallas_kernel.py) — restructured per SURVEY.md §7:
"at 128^3 block along the depth axis with a running-transmittance carry so
blur+DRC fuse per block".

Structure (grid = (B, n_zblocks), both dimensions sequential):

  for each sample b:                                  # grid dim 0
    for each z-block j (Dz slabs):                    # grid dim 1
      1. SPLAT the chunks whose z-span intersects the block's RAW range
         [j*Dz - R, (j+1)*Dz + R) into a local scratch of L = Dz + 2R
         slabs (+G pad for window overshoot). Points arrive z-sorted, so
         the intersecting chunks form a contiguous range [c_lo, c_hi)
         precomputed in XLA and scalar-prefetched. Halo slabs are
         recomputed by neighbouring blocks (2R/Dz duplicated splat work)
         so blocks stay independent.
      2. BLUR z with a banded [Dz, L] matrix (kron I_8 on the y sublane
         groups for the dim-1 alignment rule), writing the Dz interior
         slabs in place; then blur y and x on the interior slabs only —
         per-slab-group Toeplitz matmuls, NO kron waste at large D.
      3. DRC the interior slabs into (sil, depth) output blocks that are
         revisited across z-blocks, carrying the transmittance T in a
         VMEM scratch that persists across grid steps.

The backward is two pallas_calls (the cumprod cotangent needs the ray total
before per-z gradients can be formed):
  pass 1: recompute per block, accumulate Total = sum_z p_z*phi_z
          (+ background-depth term at the last block);
  pass 2: recompute per block again, convert o -> dL/do in place via the
          total-minus-prefix identity, run the symmetric blur backward +
          the banded-z transpose, then the windowed splat backward,
          ACCUMULATING per-point gradients into a revisited [B, 4, N]
          output block across z-blocks (a boundary-straddling point gets
          partial gradients from each block it touches; the sum is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota_f32(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32
    )


def _hat_t(cells_col, coord_row):
    # [Rows, 1] cell ids x [1, C] coords -> [Rows, C] trilinear hat weights
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord_row - cells_col))


def _dhat_t(cells_col, coord_row):
    diff = coord_row - cells_col
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)


def blocked_params(N: int, D: int, radius: int) -> dict:
    """Static tiling for the blocked kernels.

    Dz: z-block size (largest of 32/16/8 dividing D); L = Dz + 2R raw
    slabs per block; G: splat window slabs per trip; C: points per chunk;
    Gbz: y sublane group for the z-blur (8, the dim-1 dynamic slicing
    alignment). The y/x blur needs no grouping — it runs as two
    full-interior matmuls with a y<->x transpose (_blur_yx_interior).
    """
    if D % 8:
        raise ValueError(f"blocked kernel needs vox_size % 8 == 0, got {D}")
    if N % 128:
        raise ValueError(
            f"blocked kernel needs N % 128 == 0 (pad first), got {N}"
        )
    over = TILE_OVERRIDES
    dz = over.get("Dz") or next(d for d in (32, 16, 8) if D % d == 0)
    g = over.get("G") or max(1, min(512 // D, D))
    # chunks start at c*C in the LANE dim: Mosaic requires provably
    # 128-aligned dynamic offsets there, so C is a multiple of 128.
    # Large C = fewer, bigger window trips — per-trip overhead, not
    # matmul FLOPs, dominates this kernel (measured on v5e), so the
    # biggest chunk the VMEM temporaries tolerate wins. N is padded to a
    # multiple of C by _pad_points.
    c = _chunk_size(N)
    if N % c:
        raise ValueError(f"N={N} must be a multiple of C={c} (pad first)")
    return dict(Dz=dz, L=dz + 2 * radius, G=g, C=c, Gbz=8)


# benchmark-time tiling overrides (keys: Dz, G, C); not for
# production configs — blocked_params picks sane defaults
TILE_OVERRIDES: dict = {}

# benchmark-time stage ablation for the FORWARD kernel only (subset of
# {"splat", "zblur", "yxblur", "drc"}): skipped stages produce wrong
# output by design — used to attribute kernel time to stages on hardware
DEBUG_SKIP: frozenset = frozenset()


def _chunk_size(N: int) -> int:
    """Points per chunk: a multiple of 128 (lane alignment), as large as
    512 (bigger trips amortize the measured ~2us/trip fixed cost)."""
    c = TILE_OVERRIDES.get("C") or min(512, 128 * (-(-N // 128)))
    if c % 128:
        raise ValueError(f"chunk size must be a multiple of 128, got {c}")
    return c


def _z_band_matrix(kmat: jax.Array, radius: int, Dz: int, L: int):
    """[Dz, L] banded z-blur matrix from the Toeplitz kmat's taps.

    kmat[R, j] = tap(R - j), so centered tap t = kmat[R, R - t]; the
    blurred interior slab i reads raw local rows m = i..i+2R with tap
    (m - i - R): Kz[i, m] = kmat[R, 2R - (m - i)].
    """
    R = radius
    i_idx = jnp.arange(Dz)[:, None]
    m_idx = jnp.arange(L)[None, :]
    off = m_idx - i_idx  # in [0, 2R] inside the band
    in_band = (off >= 0) & (off <= 2 * R)
    taps = kmat[R, : 2 * R + 1]  # taps[j] = tap(R - j)
    return jnp.where(in_band, taps[jnp.clip(2 * R - off, 0, 2 * R)], 0.0)


def _blocked_metadata(
    gz_sorted: jax.Array, D: int, Dz: int, R: int, C: int
):
    """Host/XLA prep: per-chunk z-cell span + per-block chunk ranges.

    Returns (f_lo, f_hi) [B, n_chunks] i32 — first/last z-cell touched by
    each sorted chunk — and (c_lo, c_hi) [B, n_zb] i32, the contiguous
    chunk range intersecting each block's raw slab range.
    """
    B, N = gz_sorted.shape
    nc = N // C
    n_zb = D // Dz
    gz_c = gz_sorted.reshape(B, nc, C)
    f_lo = jnp.clip(jnp.floor(gz_c[..., 0]), -2 * D, 2 * D).astype(jnp.int32)
    f_hi = (
        jnp.clip(jnp.floor(gz_c[..., -1]), -2 * D, 2 * D).astype(jnp.int32)
        + 1
    )
    j = jnp.arange(n_zb, dtype=jnp.int32)
    lo_c = jnp.maximum(j * Dz - R, 0)          # [n_zb] first valid cell
    hi_c = jnp.minimum(j * Dz + Dz + R, D)     # exclusive
    overlap = (f_hi[:, None, :] >= lo_c[None, :, None]) & (
        f_lo[:, None, :] <= hi_c[None, :, None] - 1
    )  # [B, n_zb, nc]
    any_nz = overlap.any(axis=2)
    c_lo = jnp.where(any_nz, jnp.argmax(overlap, axis=2), 0)
    c_hi = jnp.where(
        any_nz, nc - jnp.argmax(overlap[..., ::-1], axis=2), 0
    )
    return f_lo, f_hi, c_lo.astype(jnp.int32), c_hi.astype(jnp.int32)


def _chunk_window(flo_ref, fhi_ref, b, c, zj, D, Dz, R, G):
    """In-kernel scalar window for (block zj, chunk c): (zb_loc, z0_base,
    nt). Must match _blocked_metadata's overlap condition exactly."""
    lo_raw = zj * Dz - R
    lo_c = jnp.maximum(lo_raw, 0)
    hi_c = jnp.minimum(zj * Dz + Dz + R, D)
    f_lo = flo_ref[b, c]
    f_hi = fhi_ref[b, c]
    zb_g = jnp.clip(f_lo, lo_c, hi_c - 1)
    ze_g = jnp.clip(f_hi, lo_c, hi_c - 1)
    nt = (ze_g - zb_g + G) // G
    overlap = (f_hi >= lo_c) & (f_lo <= hi_c - 1)
    nt = jnp.where(overlap, nt, 0)
    return zb_g - lo_raw, zb_g, nt


def _splat_block(
    flo_ref, fhi_ref, clo_ref, chi_ref, g_ref, grid_ref,
    *, b, zj, D, Dz, R, G, C, L, acc_dtype, mxu_prec, grid_dtype,
):
    """Stage 1: z-sorted windowed-matmul splat of the block's chunk range
    into the local raw scratch (rows = global slab - (zj*Dz - R))."""
    cell_sub = _iota_f32((D, 1), 0)
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)
    grid_ref[:] = jnp.zeros((L + G, D, D), grid_dtype)

    def chunk_body(c, _):
        zb_loc, zb_g, nt = _chunk_window(
            flo_ref, fhi_ref, b, c, zj, D, Dz, R, G
        )
        gz = g_ref[0, 0:1, pl.ds(c * C, C)]
        gy = g_ref[0, 1:2, pl.ds(c * C, C)]
        gx = g_ref[0, 2:3, pl.ds(c * C, C)]
        pw = g_ref[0, 3:4, pl.ds(c * C, C)]
        wy_t = pltpu.repeat(
            _hat_t(cell_sub, gy).astype(acc_dtype), G, axis=0
        )
        wx_t = _hat_t(cell_sub, gx).astype(acc_dtype)

        def trip(k, _):
            z0_g = zb_g + k * G  # global slab of the window start
            ids = row_z + z0_g.astype(jnp.float32)
            # window overshoot past the grid's top lands in local rows the
            # z-blur READS (unlike the unblocked kernel's never-read pad),
            # so invalid global cells must contribute exactly zero
            valid = (ids <= D - 1).astype(jnp.float32)
            a_t = (_hat_t(ids, gz) * valid * pw).astype(
                acc_dtype
            ) * wy_t
            slab = jax.lax.dot_general(
                a_t, wx_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec,
            )
            grid_ref[pl.ds(zb_loc + k * G, G), :, :] += slab.reshape(
                G, D, D
            ).astype(grid_dtype)
            return 0

        jax.lax.fori_loop(0, nt, trip, 0)
        return 0

    jax.lax.fori_loop(clo_ref[b, zj], chi_ref[b, zj], chunk_body, 0)


def _blur_yx_interior(
    kmat, grid_ref, *, D, Dz, R, acc_dtype, mxu_prec, grid_dtype
):
    """y+x Toeplitz blur on the Dz interior rows, as TWO full-size MXU
    matmuls instead of 2*Dz per-slab [D, D] ones (which are latency-, not
    throughput-bound — measured ~4x slower on v5e): x-blur on merged
    (z, y) rows, transpose y<->x per slab, x-blur again (= y), transpose
    back. kmat is symmetric so the same matrix serves forward and
    backward blur."""
    x = grid_ref[pl.ds(R, Dz), :, :].astype(acc_dtype)  # [Dz, D, D]
    t = jax.lax.dot_general(
        x.reshape(Dz * D, D), kmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=mxu_prec,
    )  # blur x on lanes
    t = jnp.swapaxes(t.reshape(Dz, D, D).astype(acc_dtype), 1, 2)
    t = jax.lax.dot_general(
        t.reshape(Dz * D, D), kmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=mxu_prec,
    )  # blur y (now on lanes)
    t = jnp.swapaxes(t.reshape(Dz, D, D), 1, 2)
    grid_ref[pl.ds(R, Dz), :, :] = t.astype(grid_dtype)


def _blur_block(
    kmat_ref, kronz_ref, counts_ref, grid_ref,
    *, D, Dz, R, L, Gbz, acc_dtype, mxu_prec, grid_dtype,
):
    """Stage 2: z-blur raw[0:L] -> interior rows [R, R+Dz) via the banded
    kron matrix, then y+x Toeplitz blurs on the interior rows only."""
    kmat = kmat_ref[:].astype(acc_dtype)
    kronz = kronz_ref[:].astype(acc_dtype)

    def blur_z(yg, _):
        x = (
            grid_ref[0:L, pl.ds(yg * Gbz, Gbz), :]
            .reshape(L * Gbz, D)
            .astype(acc_dtype)
        )  # rows (z_raw, g)
        t = jax.lax.dot_general(
            kronz, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_prec,
        )  # [Dz*Gbz, D]
        grid_ref[pl.ds(R, Dz), pl.ds(yg * Gbz, Gbz), :] = t.reshape(
            Dz, Gbz, D
        ).astype(grid_dtype)
        return 0

    if "zblur" not in DEBUG_SKIP:
        jax.lax.fori_loop(0, counts_ref[0], blur_z, 0)
    if "yxblur" not in DEBUG_SKIP:
        _blur_yx_interior(
            kmat, grid_ref, D=D, Dz=Dz, R=R, acc_dtype=acc_dtype,
            mxu_prec=mxu_prec, grid_dtype=grid_dtype,
        )


def _blocked_fwd_kernel(
    flo_ref, fhi_ref, clo_ref, chi_ref, counts_ref,  # SMEM prefetch
    g_ref,       # [1, 4, N] z-sorted (z, y, x, w), points on lanes
    kmat_ref,    # [D, D]
    kronz_ref,   # [Dz*Gbz, L*Gbz]
    sil_ref,     # [1, D, D] out (revisited across z-blocks)
    depth_ref,   # [1, D, D] out
    *refs,       # [gout_ref if save_grid], grid_ref, trans_ref
    vox: int, dz_block: int, radius: int, z_group: int, n_chunk: int,
    z_sub_group: int, with_depth: bool, acc_dtype,
    save_grid: bool = False,
):
    if save_grid:
        gout_ref, grid_ref, trans_ref = refs
    else:
        grid_ref, trans_ref = refs
    D, Dz, R, G, C = vox, dz_block, radius, z_group, n_chunk
    L = Dz + 2 * R
    b = pl.program_id(0)
    zj = pl.program_id(1)
    n_zb = pl.num_programs(1)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    common = dict(acc_dtype=acc_dtype, mxu_prec=mxu_prec,
                  grid_dtype=grid_ref.dtype)

    if "splat" not in DEBUG_SKIP:
        _splat_block(
            flo_ref, fhi_ref, clo_ref, chi_ref, g_ref, grid_ref,
            b=b, zj=zj, D=D, Dz=Dz, R=R, G=G, C=C, L=L, **common,
        )
    elif "zero" not in DEBUG_SKIP:
        grid_ref[:] = jnp.zeros((L + G, D, D), grid_ref.dtype)
    _blur_block(
        kmat_ref, kronz_ref, counts_ref, grid_ref,
        D=D, Dz=Dz, R=R, L=L, Gbz=z_sub_group, **common,
    )
    if save_grid:
        # stash the blurred interior block for the backward: both bwd
        # passes only need the interior (pass 2's blur-bwd regenerates
        # the halo rows itself), so the residual is exactly the blurred
        # occupancy grid and the backward never re-splats/re-blurs
        gout_ref[:] = (
            grid_ref[pl.ds(R, Dz), :, :]
            .reshape(1, Dz, D, D)
            .astype(gout_ref.dtype)
        )

    @pl.when(zj == 0)
    def _():
        sil_ref[:] = jnp.zeros((1, D, D), jnp.float32)
        depth_ref[:] = jnp.zeros((1, D, D), jnp.float32)
        trans_ref[:] = jnp.ones((D, D), jnp.float32)

    def drc_body(zg, carry):
        sil, depth, trans = carry
        og = grid_ref[pl.ds(R + zg * 8, 8), :, :]
        for g in range(8):
            o = jnp.clip(og[g].astype(jnp.float32), 0.0, 1.0 - 1e-5)
            p_stop = o * trans
            sil = sil + p_stop
            if with_depth:
                d_z = (
                    (zj * Dz + zg * 8 + g).astype(jnp.float32) + 0.5
                ) / D - 0.5
                depth = depth + d_z * p_stop
            trans = trans * (1.0 - o)
        return sil, depth, trans

    if "io" in DEBUG_SKIP:
        sil_ref[:] = jnp.zeros((1, D, D), jnp.float32)
        return
    sil, depth, trans = jax.lax.fori_loop(
        0, 0 if "drc" in DEBUG_SKIP else counts_ref[1], drc_body,
        (sil_ref[0], depth_ref[0], trans_ref[:]),
    )
    trans_ref[:] = trans
    sil_ref[:] = sil.reshape(1, D, D)
    if with_depth:
        # rays exiting the volume get background depth 1.0
        depth = jnp.where(zj == n_zb - 1, depth + 1.0 * trans, depth)
        depth_ref[:] = depth.reshape(1, D, D)


def _blocked_total_kernel(
    flo_ref, fhi_ref, clo_ref, chi_ref, counts_ref,
    g_ref, kmat_ref, kronz_ref,
    dsil_ref,    # [1, D, D] silhouette cotangent
    ddepth_ref,  # [1, D, D] depth cotangent
    *refs,       # [gin_ref if use_saved], total_ref, grid_ref, trans_ref
    vox: int, dz_block: int, radius: int, z_group: int, n_chunk: int,
    z_sub_group: int, with_depth: bool, acc_dtype,
    use_saved: bool = False,
):
    """Backward pass 1: the DRC forward accumulation of Total, blocked.

    With ``use_saved`` the blurred interior block comes in as an input
    (the forward's residual) instead of being recomputed."""
    if use_saved:
        gin_ref, total_ref, grid_ref, trans_ref = refs
    else:
        total_ref, grid_ref, trans_ref = refs
    D, Dz, R, G, C = vox, dz_block, radius, z_group, n_chunk
    L = Dz + 2 * R
    b = pl.program_id(0)
    zj = pl.program_id(1)
    n_zb = pl.num_programs(1)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    common = dict(acc_dtype=acc_dtype, mxu_prec=mxu_prec,
                  grid_dtype=grid_ref.dtype)
    if use_saved:
        grid_ref[pl.ds(R, Dz), :, :] = gin_ref[0].astype(grid_ref.dtype)
    else:
        _splat_block(
            flo_ref, fhi_ref, clo_ref, chi_ref, g_ref, grid_ref,
            b=b, zj=zj, D=D, Dz=Dz, R=R, G=G, C=C, L=L, **common,
        )
        _blur_block(
            kmat_ref, kronz_ref, counts_ref, grid_ref,
            D=D, Dz=Dz, R=R, L=L, Gbz=z_sub_group, **common,
        )

    @pl.when(zj == 0)
    def _():
        total_ref[:] = jnp.zeros((1, D, D), jnp.float32)
        trans_ref[:] = jnp.ones((D, D), jnp.float32)

    ds = dsil_ref[0]
    dd = ddepth_ref[0]

    def body(zg, carry):
        total, trans = carry
        og = grid_ref[pl.ds(R + zg * 8, 8), :, :]
        for g in range(8):
            o = jnp.clip(og[g].astype(jnp.float32), 0.0, 1.0 - 1e-5)
            if with_depth:
                d_z = (
                    (zj * Dz + zg * 8 + g).astype(jnp.float32) + 0.5
                ) / D - 0.5
                phi = ds + dd * d_z
            else:
                phi = ds
            total = total + o * trans * phi
            trans = trans * (1.0 - o)
        return total, trans

    total, trans = jax.lax.fori_loop(
        0, counts_ref[1], body, (total_ref[0], trans_ref[:])
    )
    trans_ref[:] = trans
    if with_depth:
        total = jnp.where(zj == n_zb - 1, total + dd * trans, total)
    total_ref[:] = total.reshape(1, D, D)


def _blocked_bwd_kernel(
    flo_ref, fhi_ref, clo_ref, chi_ref, counts_ref,
    g_ref, kmat_ref, kronz_ref,
    kronzT_ref,  # [L*Gbz, Dz*Gbz] transpose of the banded z matrix
    dsil_ref, ddepth_ref,
    total_ref,   # [1, D, D] from pass 1
    *refs,       # [gin_ref if use_saved], dout_ref, grid, prefix, trans
    vox: int, dz_block: int, radius: int, z_group: int, n_chunk: int,
    z_sub_group: int, with_depth: bool, acc_dtype,
    use_saved: bool = False,
):
    """Backward pass 2: (re)load the blurred block, o -> dL/do in place,
    blur backward (+ banded-z transpose), windowed splat backward."""
    if use_saved:
        gin_ref, dout_ref, grid_ref, prefix_ref, trans_ref = refs
    else:
        dout_ref, grid_ref, prefix_ref, trans_ref = refs
    D, Dz, R, G, C = vox, dz_block, radius, z_group, n_chunk
    Gbz = z_sub_group
    L = Dz + 2 * R
    N = dout_ref.shape[-1]
    b = pl.program_id(0)
    zj = pl.program_id(1)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    grid_dtype = grid_ref.dtype
    common = dict(acc_dtype=acc_dtype, mxu_prec=mxu_prec,
                  grid_dtype=grid_dtype)
    if use_saved:
        # only the interior rows are needed: the do conversion reads and
        # rewrites them, and the z-blur backward regenerates all L raw
        # rows from the interior
        grid_ref[pl.ds(R, Dz), :, :] = gin_ref[0].astype(grid_dtype)
    else:
        _splat_block(
            flo_ref, fhi_ref, clo_ref, chi_ref, g_ref, grid_ref,
            b=b, zj=zj, D=D, Dz=Dz, R=R, G=G, C=C, L=L, **common,
        )
        _blur_block(
            kmat_ref, kronz_ref, counts_ref, grid_ref,
            D=D, Dz=Dz, R=R, L=L, Gbz=Gbz, **common,
        )

    @pl.when(zj == 0)
    def _():
        prefix_ref[:] = jnp.zeros((D, D), jnp.float32)
        trans_ref[:] = jnp.ones((D, D), jnp.float32)
        dout_ref[:] = jnp.zeros((1, 4, N), jnp.float32)

    ds = dsil_ref[0]
    dd = ddepth_ref[0]
    total = total_ref[0]

    # ---- o -> dL/do in place on the interior rows ----
    def do_body(zg, carry):
        prefix, trans = carry
        og = grid_ref[pl.ds(R + zg * 8, 8), :, :]
        outs = []
        for g in range(8):
            o_raw = og[g].astype(jnp.float32)
            o = jnp.clip(o_raw, 0.0, 1.0 - 1e-5)
            if with_depth:
                d_z = (
                    (zj * Dz + zg * 8 + g).astype(jnp.float32) + 0.5
                ) / D - 0.5
                phi = ds + dd * d_z
            else:
                phi = ds
            prefix = prefix + o * trans * phi
            do = trans * phi - (total - prefix) / (1.0 - o)
            do = jnp.where(o_raw < 1.0 - 1e-5, do, 0.0)
            outs.append(do.astype(grid_dtype))
            trans = trans * (1.0 - o)
        grid_ref[pl.ds(R + zg * 8, 8), :, :] = jnp.stack(outs, axis=0)
        return prefix, trans

    prefix, trans = jax.lax.fori_loop(
        0, counts_ref[1], do_body, (prefix_ref[:], trans_ref[:])
    )
    prefix_ref[:] = prefix
    trans_ref[:] = trans

    # ---- blur backward: x and y are symmetric Toeplitz (the same two
    # full-size matmuls as the forward); z is the banded transpose,
    # interior rows -> all L raw rows ----
    kmat = kmat_ref[:].astype(acc_dtype)
    kronzT = kronzT_ref[:].astype(acc_dtype)
    _blur_yx_interior(
        kmat, grid_ref, D=D, Dz=Dz, R=R, acc_dtype=acc_dtype,
        mxu_prec=mxu_prec, grid_dtype=grid_dtype,
    )

    def blur_z_bwd(yg, _):
        x = (
            grid_ref[pl.ds(R, Dz), pl.ds(yg * Gbz, Gbz), :]
            .reshape(Dz * Gbz, D)
            .astype(acc_dtype)
        )
        t = jax.lax.dot_general(
            kronzT, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_prec,
        )  # [L*Gbz, D]
        grid_ref[0:L, pl.ds(yg * Gbz, Gbz), :] = t.reshape(
            L, Gbz, D
        ).astype(grid_dtype)
        return 0

    jax.lax.fori_loop(0, counts_ref[0], blur_z_bwd, 0)
    # zero the overshoot pad so splat-bwd windows reaching it add nothing
    grid_ref[pl.ds(L, G), :, :] = jnp.zeros((G, D, D), grid_dtype)

    # ---- windowed splat backward over the block's chunk range ----
    cell_sub = _iota_f32((D, 1), 0)
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)

    def chunk_bwd(c, _):
        zb_loc, zb_g, nt = _chunk_window(
            flo_ref, fhi_ref, b, c, zj, D, Dz, R, G
        )
        gz = g_ref[0, 0:1, pl.ds(c * C, C)]
        gy = g_ref[0, 1:2, pl.ds(c * C, C)]
        gx = g_ref[0, 2:3, pl.ds(c * C, C)]
        pw = g_ref[0, 3:4, pl.ds(c * C, C)]
        hy = _hat_t(cell_sub, gy)
        dhy = _dhat_t(cell_sub, gy)
        wy_t = pltpu.repeat(hy.astype(acc_dtype), G, axis=0)
        dwy_t = pltpu.repeat(dhy.astype(acc_dtype), G, axis=0)
        wx_t = _hat_t(cell_sub, gx).astype(acc_dtype)
        dwx_t = _dhat_t(cell_sub, gx).astype(acc_dtype)

        wy32 = wy_t.astype(jnp.float32)
        dwy32 = dwy_t.astype(jnp.float32)

        def trip(k, carry):
            agz, agy, agx, apw = carry
            z0_g = zb_g + k * G
            ids = row_z + z0_g.astype(jnp.float32)
            # same invalid-cell mask as the forward splat: cells >= D
            # never existed, so they carry no gradient either
            valid = (ids <= D - 1).astype(jnp.float32)
            hz = (_hat_t(ids, gz) * valid).astype(acc_dtype)
            a_t = (hz * pw.astype(acc_dtype)) * wy_t
            dgw = (
                grid_ref[pl.ds(zb_loc + k * G, G), :, :]
                .reshape(G * D, D)
                .astype(acc_dtype)
            )
            v = jax.lax.dot_general(
                dgw, wx_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec,
            )  # [G*D, C] = dL/da_t
            t1 = jax.lax.dot_general(
                dgw, a_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec,
            )  # [D, C] = dL/dwx
            # z/y separability (see pallas_kernel.py's trip): the row
            # reductions factor into per-slab partial sums times [G, C]
            # hat terms — the full-height triple products + 4 reductions
            # were the VPU hot spot of this loop
            P = (v * wy32).reshape(G, D, C).sum(axis=1)   # [G, C]
            Q = (v * dwy32).reshape(G, D, C).sum(axis=1)  # [G, C]
            zslab = z0_g.astype(jnp.float32) + _iota_f32((G, 1), 0)
            valid_g = (zslab <= D - 1).astype(jnp.float32)
            hz_g = _hat_t(zslab, gz) * valid_g            # [G, C]
            dhz_g = _dhat_t(zslab, gz) * valid_g          # [G, C]
            agz = agz + jnp.sum(dhz_g * P, axis=0, keepdims=True) * pw
            agy = agy + jnp.sum(hz_g * Q, axis=0, keepdims=True) * pw
            agx = agx + jnp.sum(
                t1 * dwx_t.astype(jnp.float32), axis=0, keepdims=True
            )
            apw = apw + jnp.sum(hz_g * P, axis=0, keepdims=True)
            return agz, agy, agx, apw

        z1 = jnp.zeros((1, C), jnp.float32)
        agz, agy, agx, apw = jax.lax.fori_loop(
            0, nt, trip, (z1, z1, z1, z1)
        )
        dout_ref[0, 0:1, pl.ds(c * C, C)] += agz
        dout_ref[0, 1:2, pl.ds(c * C, C)] += agy
        dout_ref[0, 2:3, pl.ds(c * C, C)] += agx
        dout_ref[0, 3:4, pl.ds(c * C, C)] += apw
        return 0

    jax.lax.fori_loop(clo_ref[b, zj], chi_ref[b, zj], chunk_bwd, 0)


def _pad_points(sorted_t: jax.Array, vox: int) -> jax.Array:
    """Pad N up to a multiple of the chunk size with zero-weight points
    far past the grid top — appended AFTER the real points, so the z-sort
    order is preserved, their hat weights at every valid cell are exactly
    zero, and all-pad chunks fall outside every block's chunk range."""
    B, F, N = sorted_t.shape
    c = _chunk_size(N)
    Np = -(-N // c) * c
    if Np == N:
        return sorted_t
    pad = jnp.zeros((B, F, Np - N), sorted_t.dtype)
    pad = pad.at[:, 0, :].set(4.0 * vox)  # z far beyond the grid
    return jnp.concatenate([sorted_t, pad], axis=-1)


def _prep_call(sorted_t, kmat, vox, radius, acc_dtype):
    """Shared call-time prep: tiling, metadata, kron matrices, counts."""
    B, _, N = sorted_t.shape
    D = vox
    p = blocked_params(N, D, radius)
    Dz, L, C, Gbz = p["Dz"], p["L"], p["C"], p["Gbz"]
    flo, fhi, clo, chi = _blocked_metadata(
        sorted_t[:, 0, :], D, Dz, radius, C
    )
    kdt = jnp.dtype(acc_dtype)
    kz = _z_band_matrix(kmat, radius, Dz, L)
    kronz = jnp.kron(kz, jnp.eye(Gbz, dtype=kmat.dtype)).astype(kdt)
    counts = jnp.asarray([D // Gbz, Dz // 8], jnp.int32)
    # CRITICAL (axon/v5e, measured): a pallas_call operand that XLA
    # constant-folds (counts always; kmat/kronz when sigma is a literal)
    # costs ~0.9 ms PER CALL through the runtime — the barrier forces
    # every operand to be a plain device buffer. See NOTES.md.
    flo, fhi, clo, chi, kmat, kronz, counts = (
        jax.lax.optimization_barrier(
            (flo, fhi, clo, chi, kmat, kronz, counts)
        )
    )
    return p, flo, fhi, clo, chi, kmat, kronz, counts, kdt


def _scalar_specs(D, N, p):
    """(in_specs for tensor args keyed by role)."""
    return dict(
        g=pl.BlockSpec(
            (1, 4, N), lambda b, zj, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        kmat=pl.BlockSpec(
            (D, D), lambda b, zj, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        kronz=pl.BlockSpec(
            (p["Dz"] * p["Gbz"], p["L"] * p["Gbz"]),
            lambda b, zj, *_: (0, 0), memory_space=pltpu.VMEM,
        ),
        kronzT=pl.BlockSpec(
            (p["L"] * p["Gbz"], p["Dz"] * p["Gbz"]),
            lambda b, zj, *_: (0, 0), memory_space=pltpu.VMEM,
        ),
        img=pl.BlockSpec(
            (1, D, D), lambda b, zj, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )


def blocked_forward(
    sorted_t: jax.Array,  # [B, 4, N] z-sorted (z, y, x, w)
    kmat: jax.Array,      # [D, D]
    vox: int,
    radius: int,
    with_depth: bool,
    acc_dtype: str = "float32",
    interpret: bool = False,
    save_grid: bool = False,
):
    """-> (sil, depth) or, with ``save_grid``, (sil, depth, grid) where
    grid [B, D, D, D] is the blurred occupancy volume — the VJP residual
    that lets blocked_backward skip both of its splat+blur recomputes
    (HBM: D=128 is 8 MB/sample). The residual is ALWAYS float32, even in
    bf16 perf mode: the backward's (total-prefix)/(1-o) identity
    amplifies residual rounding by up to ~1/(1-o) ~ 1e5 near o -> 1, so
    a bf16-rounded residual would diverge from the recompute path
    (which stores the grid in f32 VMEM scratch) exactly where it
    matters. Memory-constrained runs gate saving off entirely
    (cfg.remat) rather than rounding the residual."""
    sorted_t = _pad_points(sorted_t, vox)
    B, _, N = sorted_t.shape
    D = vox
    p, flo, fhi, clo, chi, kmat, kronz, counts, kdt = _prep_call(
        sorted_t, kmat, vox, radius, acc_dtype
    )
    specs = _scalar_specs(D, N, p)
    kernel = functools.partial(
        _blocked_fwd_kernel,
        vox=D, dz_block=p["Dz"], radius=radius, z_group=p["G"],
        n_chunk=p["C"], z_sub_group=p["Gbz"],
        with_depth=with_depth, acc_dtype=kdt, save_grid=save_grid,
    )
    out_specs = [specs["img"], specs["img"]]
    out_shapes = [
        jax.ShapeDtypeStruct((B, D, D), jnp.float32),
        jax.ShapeDtypeStruct((B, D, D), jnp.float32),
    ]
    if save_grid:
        out_specs.append(
            pl.BlockSpec(
                (1, p["Dz"], D, D), lambda b, zj, *_: (b, zj, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((B, D, D, D), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, D // p["Dz"]),
        in_specs=[specs["g"], specs["kmat"], specs["kronz"]],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((p["L"] + p["G"], D, D), jnp.float32),
            pltpu.VMEM((D, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(flo, fhi, clo, chi, counts, sorted_t, kmat, kronz)
    return out if save_grid else (out[0], out[1])


def blocked_backward(
    sorted_t: jax.Array,
    kmat: jax.Array,
    d_sil: jax.Array,
    d_depth: jax.Array,
    vox: int,
    radius: int,
    with_depth: bool,
    acc_dtype: str = "float32",
    interpret: bool = False,
    grid: jax.Array | None = None,
) -> jax.Array:
    """-> d(sorted_t) [B, 4, N] via the two-pass blocked backward.

    ``grid`` is the forward's saved blurred volume (blocked_forward with
    save_grid=True); when given, both passes read their interior block
    from it instead of re-splatting and re-blurring."""
    n_real = sorted_t.shape[-1]
    sorted_t = _pad_points(sorted_t, vox)
    B, _, N = sorted_t.shape
    D = vox
    p, flo, fhi, clo, chi, kmat, kronz, counts, kdt = _prep_call(
        sorted_t, kmat, vox, radius, acc_dtype
    )
    specs = _scalar_specs(D, N, p)
    use_saved = grid is not None
    common = dict(
        vox=D, dz_block=p["Dz"], radius=radius, z_group=p["G"],
        n_chunk=p["C"], z_sub_group=p["Gbz"],
        with_depth=with_depth, acc_dtype=kdt, use_saved=use_saved,
    )
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=32 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )
    grid_scratch = pltpu.VMEM((p["L"] + p["G"], D, D), jnp.float32)
    gin_spec = pl.BlockSpec(
        (1, p["Dz"], D, D), lambda b, zj, *_: (b, zj, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gin = (grid,) if use_saved else ()
    gin_specs = [gin_spec] if use_saved else []

    total = pl.pallas_call(
        functools.partial(_blocked_total_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, D // p["Dz"]),
            in_specs=[specs["g"], specs["kmat"], specs["kronz"],
                      specs["img"], specs["img"]] + gin_specs,
            out_specs=specs["img"],
            scratch_shapes=[grid_scratch, pltpu.VMEM((D, D), jnp.float32)],
        ),
        compiler_params=cparams,
        out_shape=jax.ShapeDtypeStruct((B, D, D), jnp.float32),
        interpret=interpret,
    )(flo, fhi, clo, chi, counts, sorted_t, kmat, kronz,
      d_sil, d_depth, *gin)

    d_sorted = pl.pallas_call(
        functools.partial(_blocked_bwd_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, D // p["Dz"]),
            in_specs=[specs["g"], specs["kmat"], specs["kronz"],
                      specs["kronzT"], specs["img"],
                      specs["img"], specs["img"]] + gin_specs,
            out_specs=pl.BlockSpec(
                (1, 4, N), lambda b, zj, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                grid_scratch,
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
            ],
        ),
        compiler_params=cparams,
        out_shape=jax.ShapeDtypeStruct((B, 4, N), jnp.float32),
        interpret=interpret,
    )(flo, fhi, clo, chi, counts, sorted_t, kmat, kronz,
      jnp.swapaxes(kronz, 0, 1), d_sil, d_depth, total, *gin)
    return d_sorted[:, :, :n_real]
