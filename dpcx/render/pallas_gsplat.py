"""Pallas TPU kernel: anisotropic Gaussian (3DGS-style) density + color
splatting — the native fast path for BASELINE config 5 (rgb_splats).

No reference counterpart (eldar/differentiable-point-clouds has no
anisotropic splats); the XLA formulations live in dpcx/render/gsplat.py:
`anisotropic_density_grid` (dense: every point on every cell, N*D^3 VPU
exps — measured at VPU f32 speed-of-light, 6.4 ms fwd at B=8/N=4096/
D=32) and `_windowed` (one-hot matmul placement — measured 8x SLOWER
than dense on TPU: W=14 contractions and relayouts dominate).

This kernel beats the dense form by exploiting the same z-sparsity as
the isotropic splat kernel (pallas_kernel.py): points arrive SORTED BY
DEPTH, so a chunk of C points only touches the z-band covered by its
3-sigma_z windows — N * Wz * D^2 cells instead of N * D^3 — and every
cell is evaluated exactly once in VMEM with no HBM round trips or XLA
layout changes.

Forward, per chunk / per G-slab trip (rows r = (g, y) on sublanes,
points c on lanes — the [.., rows, N] layout of the isotropic kernels):

    q[r, c]   = 0.5 A00 dz^2 + A01 dz dy + 0.5 A11 dy^2      (VPU)
    e_x[r, c] = exp((log w - q) - (A02 dz + A12 dy) dx - 0.5 A22 dx^2)
                for each x in 0..D (fori; the full PSD form is assembled
                inside the exp so partial terms cannot overflow)
    E_x = e_x @ rgbw^T                 [G*D, 8] (MXU: density + 3 color
                                       rows + 4 zero pad rows)
    slab_k += E_x[:, k] * onehot(x)    (VPU FMA into [G*D, D] carries —
                                       no transposes, no dynamic lane
                                       stores)

Backward (same trip structure, one pass, no saved residuals — recompute
of e is ~8 VPU ops/cell): all ten Sigma^-1/mu/w gradients are moments
sum_{r,x} zc^a yc^b dx^m * u with u = ct_eff * contrib, (a+b) <= 2,
m <= 2. Cell coordinates zc, yc are POINT-INDEPENDENT, so the row
reductions ride the MXU as one [8, G*D] @ [G*D, C] matmul per x against
a polynomial basis matrix F (rows 1, zc, yc, zc^2, zc*yc, yc^2) — the
generalization of the separable-reduction rewrite in the isotropic
backward. Gradients are assembled from raw moments once per chunk and
un-sorted with a multi-operand lax.sort (no gather), mirroring
pallas_kernel.py.

Cotangents for cells the forward never touched (outside the z-window)
are dropped by construction on both sides: the forward writes no mass
there, the backward reads zero-padded cotangent slabs only inside the
window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpcx.render.pallas_blocked import _iota_f32

# bench-only tiling overrides, same contract as pallas_kernel.TILE_OVERRIDES
TILE_OVERRIDES: dict = {}


def _tiling(num_points: int, vox: int) -> tuple[int, int]:
    """(z_group, chunk): G*D ~ 256 rows per trip; C lanes per chunk."""
    g = max(1, min(vox, 256 // vox))
    while vox % g:
        g -= 1
    c = min(512, 128 * (-(-num_points // 128)))
    g = TILE_OVERRIDES.get("z_group", g)
    c = TILE_OVERRIDES.get("chunk", c)
    return g, c


def _x_hi(vox: int, counts_ref):
    """Upper bound for the per-cell x loop of both kernels. D <= 32:
    the static Python int — Mosaic unrolls the loop, which is the
    measured-fastest form at these sizes (round-3c: D=32 bf16 fwd+bwd
    4.0 Mpts/s). D > 32: the SAME value, but read from SMEM so the
    bound is a runtime scalar and Mosaic CANNOT unroll — at D=64 the
    unrolled backward stack-allocates each iteration's temporaries
    (e, t1-t3, u at [G*D, C] f32 each, plus the bf16 .astype copies
    the bf16 acc mode adds) and blows VMEM: round-3c measured 'D=64
    bf16 fwd+bwd FAILS remote compile (likely VMEM)'. The dynamic
    bound trades unrolled pipelining for a bounded working set."""
    return vox if vox <= 32 else counts_ref[1]


def _aniso_fwd_kernel(
    zbase_ref,   # [B, n_chunks] int32 (SMEM)
    ntrips_ref,  # [B, n_chunks] int32 (SMEM)
    counts_ref,  # [2] int32: (n_chunks, D) as runtime values (no
                 # unrolling — see _x_hi)
    pk_ref,      # [1, 13, N] z-sorted packed points (rows: mu_z, mu_y,
                 # mu_x, A00, A01, A02, A11, A12, A22, w, r, g, b;
                 # points on LANES)
    out_ref,     # [1, CH, D, D, D] out: density (+ 3 color accumulators
                 # when with_rgb)
    grid_ref,    # [CH, D + G, D, D] f32 scratch (G pad slabs: trips may
                 # overshoot the top; pad cells are never copied out)
    *,
    num_points: int,
    vox: int,
    z_group: int,
    chunk: int,
    acc_dtype,
    with_rgb: bool,
):
    D, G, C = vox, z_group, chunk
    CH = 4 if with_rgb else 1
    acc = jnp.dtype(acc_dtype)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    b = pl.program_id(0)
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)        # [G*D, 1]
    row_y = _iota_f32((G * D, 1), 0) - D * row_z           # [G*D, 1]
    x_lane = _iota_f32((1, D), 1)                          # [1, D]

    grid_ref[:] = jnp.zeros((CH, D + G, D, D), jnp.float32)

    def chunk_body(c_i, _):
        zb = zbase_ref[b, c_i]
        nt = ntrips_ref[b, c_i]

        def ld(i):
            return pk_ref[0, i : i + 1, pl.ds(c_i * C, C)]  # [1, C]

        muz, muy, mux = ld(0), ld(1), ld(2)
        a00, a01, a02 = ld(3), ld(4), ld(5)
        a11, a12, a22 = ld(6), ld(7), ld(8)
        w = ld(9)
        lw = jnp.log(jnp.maximum(w, 1e-30))                # [1, C]
        color_rows = (
            [ld(10), ld(11), ld(12)]
            if with_rgb
            else [jnp.zeros((3, C), jnp.float32)]
        )
        rgbw = jnp.concatenate(
            [jnp.ones((1, C), jnp.float32)] + color_rows
            + [jnp.zeros((4, C), jnp.float32)],
            axis=0,
        ).astype(acc)                                      # [8, C]
        dy = row_y - muy                                   # [G*D, C]
        ty = (0.5 * a11) * dy * dy                         # [G*D, C]
        h = 0.5 * a22                                      # [1, C]

        def trip(k, _):
            z0 = zb + k * G
            dz = (row_z + z0.astype(jnp.float32)) - muz    # [G*D, C]
            base = (
                lw - ((0.5 * a00) * dz * dz + (a01 * dz) * dy + ty)
            )                                              # [G*D, C]
            m = a02 * dz + a12 * dy                        # [G*D, C]

            def xloop(x, slabs):
                xf = x.astype(jnp.float32)
                dx = xf - mux                              # [1, C]
                e = jnp.exp(base - (m * dx + (h * dx) * dx)).astype(acc)
                E = jax.lax.dot_general(   # [G*D, 8]: dens + rgb rows
                    e, rgbw, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec,
                )
                oh = (x_lane == xf).astype(jnp.float32)    # [1, D]
                return tuple(
                    s + E[:, kk : kk + 1] * oh
                    for kk, s in enumerate(slabs)
                )

            z4 = jnp.zeros((G * D, D), jnp.float32)
            slabs = jax.lax.fori_loop(
                0, _x_hi(D, counts_ref), xloop, (z4,) * CH
            )
            for kk, s in enumerate(slabs):
                grid_ref[kk, pl.ds(z0, G)] += s.reshape(G, D, D)
            return 0

        jax.lax.fori_loop(0, nt, trip, 0)
        return 0

    jax.lax.fori_loop(0, counts_ref[0], chunk_body, 0)
    out_ref[0] = grid_ref[:, :D]


def _aniso_bwd_kernel(
    zbase_ref,   # [B, n_chunks] int32 (SMEM)
    ntrips_ref,  # [B, n_chunks] int32 (SMEM)
    counts_ref,  # [2] int32: (n_chunks, D)
    pk_ref,      # [1, 13, N] z-sorted packed points
    ct_ref,      # [1, CH, D + G, D, D] cotangents of (dens[, cols]),
                 # zero-padded G slabs at the top
    gout_ref,    # [1, 13, N] out: grads in SORTED order (color rows
                 # zero when not with_rgb)
    *,
    num_points: int,
    vox: int,
    z_group: int,
    chunk: int,
    acc_dtype,
    with_rgb: bool,
):
    D, G, C = vox, z_group, chunk
    acc = jnp.dtype(acc_dtype)
    mxu_prec = (
        jax.lax.Precision.HIGHEST
        if acc == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    b = pl.program_id(0)
    row_z = jnp.floor(_iota_f32((G * D, 1), 0) / D)
    row_y = _iota_f32((G * D, 1), 0) - D * row_z
    x_sub = _iota_f32((D, 1), 0)                            # [D, 1]

    def chunk_body(c_i, _):
        zb = zbase_ref[b, c_i]
        nt = ntrips_ref[b, c_i]

        def ld(i):
            return pk_ref[0, i : i + 1, pl.ds(c_i * C, C)]

        muz, muy, mux = ld(0), ld(1), ld(2)
        a00, a01, a02 = ld(3), ld(4), ld(5)
        a11, a12, a22 = ld(6), ld(7), ld(8)
        w = ld(9)
        if with_rgb:
            rr, gg, bb = ld(10), ld(11), ld(12)
        lw = jnp.log(jnp.maximum(w, 1e-30))
        dy = row_y - muy
        ty = (0.5 * a11) * dy * dy
        h = 0.5 * a22

        z8c = jnp.zeros((8, C), jnp.float32)
        # raw-moment accumulators (P[a,b,m] rows, see module docstring)
        # and color-cotangent accumulators, carried across trips
        def trip(k, carry):
            z0 = zb + k * G
            zc = row_z + z0.astype(jnp.float32)             # [G*D, 1]
            dz = zc - muz
            base = lw - ((0.5 * a00) * dz * dz + (a01 * dz) * dy + ty)
            m = a02 * dz + a12 * dy
            # polynomial basis over cell coords: rows 1, zc, yc, zc^2,
            # zc*yc, yc^2 (+2 zero rows) — POINT-independent, so the
            # row reductions are one matmul per x. Built directly with
            # cells on LANES (no in-kernel transpose).
            il = _iota_f32((1, G * D), 1)                   # [1, G*D]
            zl = jnp.floor(il / D) + z0.astype(jnp.float32)
            yl = il - D * jnp.floor(il / D)
            F = jnp.concatenate(
                [jnp.ones((1, G * D), jnp.float32), zl, yl, zl * zl,
                 zl * yl, yl * yl,
                 jnp.zeros((2, G * D), jnp.float32)],
                axis=0,
            ).astype(acc)                                   # [8, G*D]
            ct_d = (
                ct_ref[0, 0, pl.ds(z0, G), :, :]
                .reshape(G * D, D)
                .astype(jnp.float32)
            )
            if with_rgb:
                ct_r = ct_ref[0, 1, pl.ds(z0, G), :, :].reshape(G * D, D)
                ct_g = ct_ref[0, 2, pl.ds(z0, G), :, :].reshape(G * D, D)
                ct_b = ct_ref[0, 3, pl.ds(z0, G), :, :].reshape(G * D, D)

            def xloop(x, carry):
                if with_rgb:
                    acc0, acc1, acc2, v1, v2, v3 = carry
                else:
                    acc0, acc1, acc2 = carry
                xf = x.astype(jnp.float32)
                dx = xf - mux                               # [1, C]
                e = jnp.exp(base - (m * dx + (h * dx) * dx))
                oh8 = jnp.broadcast_to(
                    (x_sub == xf).astype(jnp.float32), (D, 8)
                )                                           # [D, 8]

                def col(ct2):
                    # [G*D, 1] cotangent column at x via a one-hot
                    # matmul (no dynamic lane slicing)
                    return jax.lax.dot_general(
                        ct2.astype(jnp.float32), oh8,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )[:, 0:1]

                cd = col(ct_d)

                def red(mat):
                    return jax.lax.dot_general(
                        F, mat.astype(acc), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mxu_prec,
                    )                                       # [8, C]

                if with_rgb:
                    t1 = e * col(ct_r)
                    t2 = e * col(ct_g)
                    t3 = e * col(ct_b)
                    u = e * cd + (rr * t1 + gg * t2 + bb * t3)
                else:
                    u = e * cd
                Su = red(u)
                acc0 = acc0 + Su
                acc1 = acc1 + Su * dx
                acc2 = acc2 + (Su * dx) * dx
                if not with_rgb:
                    return acc0, acc1, acc2
                v1 = v1 + red(t1)
                v2 = v2 + red(t2)
                v3 = v3 + red(t3)
                return acc0, acc1, acc2, v1, v2, v3

            return jax.lax.fori_loop(0, _x_hi(D, counts_ref), xloop, carry)

        n_carry = 6 if with_rgb else 3
        carry_out = jax.lax.fori_loop(
            0, nt, trip, (z8c,) * n_carry
        )
        if with_rgb:
            acc0, acc1, acc2, v1, v2, v3 = carry_out
        else:
            acc0, acc1, acc2 = carry_out

        # assemble gradients from raw moments (centering in z/y happens
        # here — dx was centered inside the loop)
        P000, Pz00, Py00 = acc0[0:1], acc0[1:2], acc0[2:3]
        Pzz0, Pzy0, Pyy0 = acc0[3:4], acc0[4:5], acc0[5:6]
        P001, Pz01, Py01 = acc1[0:1], acc1[1:2], acc1[2:3]
        P002 = acc2[0:1]
        Sdz = Pz00 - muz * P000
        Sdy = Py00 - muy * P000
        Sdx = P001
        Sdzdz = Pzz0 - 2.0 * muz * Pz00 + muz * muz * P000
        Sdzdy = Pzy0 - muz * Py00 - muy * Pz00 + muz * muy * P000
        Sdydy = Pyy0 - 2.0 * muy * Py00 + muy * muy * P000
        Sdzdx = Pz01 - muz * P001
        Sdydx = Py01 - muy * P001
        Sdxdx = P002

        def st(i, v):
            gout_ref[0, i : i + 1, pl.ds(c_i * C, C)] = v

        st(0, a00 * Sdz + a01 * Sdy + a02 * Sdx)   # d/d mu_z
        st(1, a01 * Sdz + a11 * Sdy + a12 * Sdx)   # d/d mu_y
        st(2, a02 * Sdz + a12 * Sdy + a22 * Sdx)   # d/d mu_x
        st(3, -0.5 * Sdzdz)                        # d/d A00
        st(4, -Sdzdy)                              # d/d A01
        st(5, -Sdzdx)                              # d/d A02
        st(6, -0.5 * Sdydy)                        # d/d A11
        st(7, -Sdydx)                              # d/d A12
        st(8, -0.5 * Sdxdx)                        # d/d A22
        st(9, jnp.where(w > 1e-30, P000 / jnp.maximum(w, 1e-30), 0.0))
        if with_rgb:
            st(10, v1[0:1])                        # d/d rgb
            st(11, v2[0:1])
            st(12, v3[0:1])
        else:
            z1c = jnp.zeros((1, C), jnp.float32)
            st(10, z1c)
            st(11, z1c)
            st(12, z1c)
        return 0

    jax.lax.fori_loop(0, counts_ref[0], chunk_body, 0)


def _window_metadata(
    muz_sorted: jax.Array, rz_sorted: jax.Array, vox: int, z_group: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-chunk (z_base, n_trips) covering every point's +-rz z-window."""
    B, N = muz_sorted.shape
    D, G, C = vox, z_group, chunk
    mu_c = muz_sorted.reshape(B, N // C, C)
    rz_c = rz_sorted.reshape(B, N // C, C)
    lo = jnp.floor(jnp.min(mu_c - rz_c, axis=-1))
    hi = jnp.floor(jnp.max(mu_c + rz_c, axis=-1)) + 1.0
    zb = jnp.clip(lo, 0, D - 1)
    ze = jnp.clip(hi, 0, D - 1)
    nt = jnp.ceil((ze - zb + 1.0) / G)
    nt = jnp.where((hi < 0) | (lo > D - 1), 0.0, nt)
    return zb.astype(jnp.int32), nt.astype(jnp.int32)


def _sort_packed(
    pk: jax.Array, rz: jax.Array, with_order: bool
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Depth-sort [B, 13, N] packed points (+ rz) by row 0 via one
    multi-operand lax.sort; returns (sorted pk, sorted rz, order)."""
    B, R, N = pk.shape
    ops = [pk[:, i, :] for i in range(R)] + [rz]
    if with_order:
        ops.append(
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        )
    out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    pk_s = jnp.stack(out[:R], axis=1)
    return pk_s, out[R], (out[R + 1] if with_order else None)


def _pad_points(arrs: list[jax.Array], N: int, C: int) -> list[jax.Array]:
    """Pad the point axis (last) to a multiple of C. mu_z (row 0 of the
    packed array) pads with +1e4 so pads sort to the end and their
    chunks get n_trips == 0; weights pad with 0 so mixed chunks are
    exact."""
    pad = (-N) % C
    if pad == 0:
        return arrs
    out = []
    for a in arrs:
        if a.ndim == 3:  # packed [B, 13, N]
            fill = jnp.zeros((a.shape[0], a.shape[1], pad), a.dtype)
            fill = fill.at[:, 0, :].set(1e4)
            # identity-ish precision keeps exp args finite for pads
            fill = fill.at[:, 3, :].set(1.0)
            fill = fill.at[:, 6, :].set(1.0)
            fill = fill.at[:, 8, :].set(1.0)
            out.append(jnp.concatenate([a, fill], axis=2))
        else:  # rz [B, N]
            out.append(
                jnp.concatenate(
                    [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1
                )
            )
    return out


def _fwd_call(pk_s, zb, nt, vox, G, C, acc_dtype, interpret, with_rgb):
    B, _, N = pk_s.shape
    D = vox
    CH = 4 if with_rgb else 1
    kernel = functools.partial(
        _aniso_fwd_kernel,
        num_points=N, vox=D, z_group=G, chunk=C, acc_dtype=acc_dtype,
        with_rgb=with_rgb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 13, N), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, CH, D, D, D), lambda p, *_: (p, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((CH, D + G, D, D), jnp.float32)],
    )
    args = jax.lax.optimization_barrier(
        (zb, nt, jnp.asarray([N // C, D], jnp.int32), pk_s)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((B, CH, D, D, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * D * (16 if with_rgb else 10),
            bytes_accessed=B * (13 * N + CH * D**3) * 4,
            transcendentals=B * N * D * D * 4,
        ),
        interpret=interpret,
    )(*args)
    return out


def _bwd_call(pk_s, ct_pad, zb, nt, vox, G, C, acc_dtype, interpret,
              with_rgb):
    B, _, N = pk_s.shape
    D = vox
    CH = 4 if with_rgb else 1
    kernel = functools.partial(
        _aniso_bwd_kernel,
        num_points=N, vox=D, z_group=G, chunk=C, acc_dtype=acc_dtype,
        with_rgb=with_rgb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 13, N), lambda p, *_: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, CH, D + G, D, D), lambda p, *_: (p, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 13, N), lambda p, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    args = jax.lax.optimization_barrier(
        (zb, nt, jnp.asarray([N // C, D], jnp.int32), pk_s, ct_pad)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 13, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * D * (40 if with_rgb else 16),
            bytes_accessed=B * (26 * N + CH * D**3) * 4,
            transcendentals=B * N * D * D * 4,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def aniso_density_pallas(
    mu: jax.Array,    # [B, N, 3] grid coords (z, y, x)
    A6: jax.Array,    # [B, N, 6] precision entries (A00, A01, A02,
                      # A11, A12, A22), cell units
    w: jax.Array,     # [B, N] weight (normalization * opacity)
    rgb: jax.Array | None,  # [B, N, 3], or None for density-only (the
                      # kernel then skips all color slab/cotangent work)
    rz: jax.Array,    # [B, N] z window radius, cells (truncate * sigma_z)
    vox: int = 32,
    acc_dtype: str = "float32",
    interpret: bool = False,
):
    """-> (density [B, D, D, D], color accumulators [B, 3, D, D, D]),
    or density alone when rgb is None.

    Exact in-window anisotropic Gaussian mass; mass beyond rz cells of a
    center in z is truncated (choose rz = truncate * sqrt(Sigma_zz))."""
    dens, cols, _ = _aniso_fwd_res(
        mu, A6, w, rgb, rz, vox, acc_dtype, interpret
    )
    return dens if cols is None else (dens, cols)


def _pack(mu, A6, w, rgb):
    B, N, _ = mu.shape
    rgb_rows = (
        jnp.zeros((B, 3, N), mu.dtype)
        if rgb is None
        else jnp.moveaxis(rgb, -1, 1)
    )
    return jnp.concatenate(
        [
            jnp.moveaxis(mu, -1, 1),       # [B, 3, N]
            jnp.moveaxis(A6, -1, 1),       # [B, 6, N]
            w[:, None, :],                 # [B, 1, N]
            rgb_rows,                      # [B, 3, N]
        ],
        axis=1,
    ).astype(jnp.float32)                  # [B, 13, N]


def _aniso_fwd_res(mu, A6, w, rgb, rz, vox, acc_dtype, interpret):
    B, N0, _ = mu.shape
    with_rgb = rgb is not None
    G, C = _tiling(N0, vox)
    pk = _pack(mu, A6, w, rgb)
    pk, rz_p = _pad_points([pk, rz.astype(jnp.float32)], N0, C)
    pk_s, rz_s, order = _sort_packed(pk, rz_p, with_order=True)
    zb, nt = _window_metadata(pk_s[:, 0, :], rz_s, vox, G, C)
    out = _fwd_call(
        pk_s, zb, nt, vox, G, C, acc_dtype, interpret, with_rgb
    )
    cols = out[:, 1:4] if with_rgb else None
    return out[:, 0], cols, (pk_s, order, zb, nt)


def _aniso_vjp_fwd(mu, A6, w, rgb, rz, vox, acc_dtype, interpret):
    dens, cols, res = _aniso_fwd_res(
        mu, A6, w, rgb, rz, vox, acc_dtype, interpret
    )
    out = dens if cols is None else (dens, cols)
    return out, (res, mu.shape[1], cols is not None)


def _aniso_vjp_bwd(vox, acc_dtype, interpret, res, cts):
    (pk_s, order, zb, nt), N0, with_rgb = res
    if with_rgb:
        ct_d, ct_c = cts
        ct = jnp.concatenate(
            [ct_d[:, None], ct_c], axis=1
        ).astype(jnp.float32)                   # [B, 4, D, D, D]
    else:
        ct_d = cts
        ct = ct_d[:, None].astype(jnp.float32)  # [B, 1, D, D, D]
    B = ct_d.shape[0]
    D = vox
    CH = ct.shape[1]
    G, C = _tiling(N0, vox)
    ct_pad = jnp.concatenate(
        [ct, jnp.zeros((B, CH, G, D, D), jnp.float32)], axis=2
    )
    g_s = _bwd_call(
        pk_s, ct_pad, zb, nt, vox, G, C, acc_dtype, interpret, with_rgb
    )
    # un-sort: one multi-operand sort keyed by the saved order
    ops = (order,) + tuple(g_s[:, i, :] for i in range(13))
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    g = jnp.stack(out[1:], axis=1)[:, :, :N0]   # drop pad points
    gmu = jnp.moveaxis(g[:, 0:3], 1, -1)
    gA6 = jnp.moveaxis(g[:, 3:9], 1, -1)
    gw = g[:, 9]
    grgb = (
        jnp.moveaxis(g[:, 10:13], 1, -1) if with_rgb else None
    )
    return gmu, gA6, gw, grgb, jnp.zeros((B, N0), jnp.float32)


aniso_density_pallas.defvjp(_aniso_vjp_fwd, _aniso_vjp_bwd)
