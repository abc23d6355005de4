"""Fused Pallas TPU kernel: trilinear splat -> Gaussian blur -> DRC project.

This is the framework's one native-performance component (SURVEY.md §2.4):
the TPU-idiomatic replacement for the reference's scatter_nd + conv3d +
cumprod chain (dpc/util/point_cloud.py::pointcloud2voxels3d_fast,
::smoothen_voxels3d, dpc/util/drc.py::drc_projection), fused so the D^3
occupancy grid lives only in VMEM and never round-trips HBM.

Algorithm (one grid program per batch sample):

1. SPLAT — TPU has no atomic scatter, so the trilinear splat is a dense
   contraction (see voxelize.pointcloud2voxels_matmul):
       grid[z, y, x] = sum_n Wz[n,z] * Wy[n,y] * Wx[n,x]
   with hat weights W*[n,i] = relu(1 - |g_n - i|) built in-register from a
   broadcasted iota. Z-slabs are processed in groups of G (G*D lanes-worth of
   output per matmul so the 128x128 MXU tiles are filled), and points in
   chunks of C to bound VMEM:
       A[n, g*D + y] = Wz[n, z_g] * Wy[n, y]         (VPU, chunk-local)
       grid[z_g.., :, :] += A^T @ Wx                  (MXU, K = C)
2. BLUR — separable Gaussian as three Toeplitz matmuls with K [D, D]
   (values traced, so sigma annealing never recompiles): per-slab
   K^T @ (slab @ K), then one [D, D*D] contraction along z.
3. DRC — running-transmittance loop over z (VPU):
       p_z = o_z * T;  sil += p_z;  depth += d_z * p_z;  T *= (1 - o_z)

VMEM budget at D=64, N=8192, fp32: Wy/Wx/Wz 3 x C*D or N*D tiles ~6 MB,
grid 2 x 1 MB, A-chunk C*G*D ~4 MB -> fits the ~16 MB/core budget; D=128
requires bf16 operands + z-blocking (later round).

The custom VJP recomputes the forward in pure XLA and differentiates it
(scatter grad = trilinear gather; cumprod grad via XLA's cumprod VJP) — the
Pallas kernel accelerates the forward; a handwritten backward kernel is a
later optimization (SURVEY.md §7 "VJP fidelity").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpcx.render.drc import drc_projection
from dpcx.render.gauss import blur_matrix, smoothen_voxels3d
from dpcx.render.voxelize import ndc_to_grid


def _fused_kernel(
    g_ref,        # [1, N, 4] grid coords (z, y, x, w) — weight folded in
    kmat_ref,     # [D, D] blur Toeplitz
    sil_ref,      # [1, D, D] out
    depth_ref,    # [1, D, D] out
    grid_ref,     # [D, D, D] scratch (VMEM)
    *,
    num_points: int,
    vox: int,
    z_group: int,
    n_chunk: int,
    with_depth: bool,
    acc_dtype,
):
    D, G, C = vox, z_group, n_chunk
    n_groups = D // G
    n_chunks = num_points // C

    g = g_ref[0]  # [N, 4]
    cell_ids = jax.lax.broadcasted_iota(jnp.float32, (1, D), 1)  # [1, D]

    def hat(coord_col):
        # coord_col [C, 1] -> [C, D] trilinear hat weights
        return jnp.maximum(0.0, 1.0 - jnp.abs(coord_col - cell_ids))

    # ---- stage 1: splat (grouped slab matmuls) ----
    def chunk_body(c, _):
        off = c * C
        gc = g[pl.ds(off, C), :]  # [C, 4]
        wz = hat(gc[:, 0:1]) * gc[:, 3:4]  # fold point weight into z-hat
        wy = hat(gc[:, 1:2])
        wx = hat(gc[:, 2:3]).astype(acc_dtype)  # [C, D]

        def group_body(gi, _):
            wz_grp = wz[:, pl.ds(gi * G, G)]  # [C, G]
            a = (wz_grp[:, :, None] * wy[:, None, :]).reshape(C, G * D)
            slab = jax.lax.dot_general(
                a.astype(acc_dtype),
                wx,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*D, D]
            prev = grid_ref[pl.ds(gi * G, G), :, :]
            add = slab.reshape(G, D, D)
            grid_ref[pl.ds(gi * G, G), :, :] = jnp.where(
                c == 0, add, prev + add
            )
            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ---- stage 2: separable blur via Toeplitz matmuls ----
    kmat = kmat_ref[:].astype(acc_dtype)  # [D, D]

    def blur_xy(z, _):
        slab = grid_ref[z].astype(acc_dtype)  # [D(y), D(x)]
        t = jax.lax.dot_general(  # blur x: slab @ K
            slab, kmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = jax.lax.dot_general(  # blur y: K^T @ t  (K symmetric-banded)
            kmat, t.astype(acc_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grid_ref[z] = t
        return 0

    jax.lax.fori_loop(0, D, blur_xy, 0)
    # blur z: contract slab axis in one [D, D*D] matmul
    flat = grid_ref[:].reshape(D, D * D).astype(acc_dtype)
    blurred = jax.lax.dot_general(
        kmat, flat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, D*D]

    # ---- stage 3: DRC expected-visibility reduction over z ----
    occ = jnp.clip(blurred, 0.0, 1.0 - 1e-5)

    def drc_body(z, carry):
        sil, depth, trans = carry
        o = occ[pl.ds(z, 1), :]  # [1, D*D]
        p_stop = o * trans
        sil = sil + p_stop
        if with_depth:
            d_z = (z.astype(jnp.float32) + 0.5) / D - 0.5
            depth = depth + d_z * p_stop
        trans = trans * (1.0 - o)
        return sil, depth, trans

    zero = jnp.zeros((1, D * D), jnp.float32)
    sil, depth, trans = jax.lax.fori_loop(
        0, D, drc_body, (zero, zero, jnp.ones((1, D * D), jnp.float32))
    )
    sil_ref[0] = sil.reshape(D, D)
    if with_depth:
        # rays exiting the volume get background depth 1.0
        depth_ref[0] = (depth + 1.0 * trans).reshape(D, D)
    else:
        depth_ref[0] = jnp.zeros((D, D), jnp.float32)


def _pick_tiling(num_points: int, vox: int) -> tuple[int, int]:
    """(z_group, n_chunk): G*D ~ 512 output lanes, C points per chunk."""
    g = max(1, min(vox, 512 // vox))
    while vox % g:
        g -= 1
    c = min(num_points, 2048)
    while num_points % c:
        c -= 1
    return g, c


@functools.partial(
    jax.jit,
    static_argnames=("vox", "with_depth", "acc_dtype", "interpret"),
)
def _pallas_forward(
    coords_w: jax.Array,  # [B, N, 4] grid coords + folded weight
    kmat: jax.Array,      # [D, D]
    vox: int,
    with_depth: bool,
    acc_dtype: str = "float32",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    B, N, _ = coords_w.shape
    D = vox
    G, C = _pick_tiling(N, D)
    kernel = functools.partial(
        _fused_kernel,
        num_points=N,
        vox=D,
        z_group=G,
        n_chunk=C,
        with_depth=with_depth,
        acc_dtype=jnp.dtype(acc_dtype),
    )
    sil, depth = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, N, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, D, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((D, D, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * D * D + 8 * B * D**4,
            bytes_accessed=B * (N * 16 + 2 * D * D * 4) + D * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords_w, kmat)
    return sil, depth


def _xla_reference(
    coords_w: jax.Array, kmat: jax.Array, vox: int, with_depth: bool
) -> tuple[jax.Array, jax.Array]:
    """Pure-XLA recompute of the fused kernel's math (for the VJP)."""
    D = vox
    g = coords_w[..., :3]
    pw = coords_w[..., 3]
    # hat-splat (same math as voxelize.pointcloud2voxels_matmul, but on
    # pre-converted grid coords)
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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def _fused_render(coords_w, kmat, vox, with_depth, acc_dtype, interpret):
    return _pallas_forward(
        coords_w, kmat, vox, with_depth, acc_dtype, interpret
    )


def _fused_fwd(coords_w, kmat, vox, with_depth, acc_dtype, interpret):
    out = _pallas_forward(
        coords_w, kmat, vox, with_depth, acc_dtype, interpret
    )
    return out, (coords_w, kmat)


def _fused_bwd(vox, with_depth, acc_dtype, interpret, res, cts):
    coords_w, kmat = res
    _, vjp = jax.vjp(
        lambda c, k: _xla_reference(c, k, vox, with_depth), coords_w, kmat
    )
    d_sil, d_depth = cts
    if not with_depth:
        d_depth = jnp.zeros_like(d_sil)
    return vjp((d_sil, d_depth))


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
) -> tuple[jax.Array, jax.Array | None]:
    """Fused splat->blur->DRC. points_ndc [B, N, 3] -> sil [B, D, D].

    Drop-in replacement for the XLA stage-2..4 pipeline in
    project.pointcloud_project (stage 1, the perspective transform, stays in
    XLA where it fuses with upstream compute).
    """
    B, N, _ = points_ndc.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = ndc_to_grid(points_ndc, vox_size)  # [B, N, 3] (z, y, x)
    pw = (
        jnp.ones((B, N), points_ndc.dtype)
        if point_weights is None
        else point_weights
    )
    coords_w = jnp.concatenate([g, pw[..., None]], axis=-1)
    kmat = blur_matrix(sigma_vox, vox_size, kernel_radius)
    sil, depth = _fused_render(
        coords_w, kmat, vox_size, with_depth, acc_dtype, interpret
    )
    return sil, (depth if with_depth else None)
