"""Depth-blocked fused kernel (D > 64 path) vs the XLA oracle, interpret
mode on CPU (SURVEY.md §4 items 1/3/4). Covers multi-block grids (D=24 ->
3 blocks of 8), the flagship D=128 shape (4 blocks of 32), out-of-bounds
points on both z ends (the blocked kernel's halo rows ARE read by the
blur, unlike the unblocked kernel's pad — regression for the invalid-cell
mask), and the two-pass blocked backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.render.gauss import blur_matrix
from dpcx.render.pallas_blocked import (
    blocked_backward,
    blocked_forward,
    blocked_params,
)
from dpcx.render.pallas_kernel import _sort_with_order, _xla_reference
from dpcx.render.voxelize import ndc_to_grid


def _sorted_coords(key, D, B, N, lim):
    pts = jax.random.uniform(key, (B, N, 3), minval=-lim, maxval=lim)
    g = ndc_to_grid(pts, D)
    cw = jnp.concatenate([g, jnp.ones((B, N, 1))], -1)
    st, _ = _sort_with_order(jnp.swapaxes(cw, 1, 2))
    return st


def _check(D, R, sigma_rel, lim, N=128, B=2, with_depth=True):
    st = _sorted_coords(jax.random.PRNGKey(0), D, B, N, lim)
    kmat = blur_matrix(jnp.asarray(sigma_rel) * D, D, R)
    sil_b, dep_b = blocked_forward(
        st, kmat, D, R, with_depth, "float32", True
    )
    sil_o, dep_o = _xla_reference(st, kmat, D, with_depth)
    np.testing.assert_allclose(sil_b, sil_o, atol=3e-5)
    if with_depth:
        np.testing.assert_allclose(dep_b, dep_o, atol=3e-5)

    ds = jax.random.normal(jax.random.PRNGKey(1), (B, D, D))
    dd = (
        jax.random.normal(jax.random.PRNGKey(2), (B, D, D))
        if with_depth
        else jnp.zeros((B, D, D))
    )
    d_b = blocked_backward(
        st, kmat, ds, dd, D, R, with_depth, "float32", True
    )
    if with_depth:
        _, vjp = jax.vjp(
            lambda s: _xla_reference(s, kmat, D, True), st
        )
        (d_o,) = vjp((ds, dd))
    else:
        _, vjp = jax.vjp(
            lambda s: _xla_reference(s, kmat, D, False)[0], st
        )
        (d_o,) = vjp(ds)
    np.testing.assert_allclose(d_b, d_o, atol=5e-5)


def test_blocked_multiblock_parity():
    # D=24 -> Dz=8, three z-blocks; in-range points
    _check(24, 3, 0.1, lim=0.45)


def test_blocked_oob_both_ends():
    # points past both grid ends; halo rows must stay exactly zero
    _check(24, 3, 0.1, lim=0.6)


def test_blocked_silhouette_only():
    _check(24, 3, 0.1, lim=0.5, with_depth=False)


def test_blocked_d128_flagship_parity():
    # the flagship 128^3 shape (VERDICT round-1 item 1): 4 blocks of 32
    _check(128, 6, 0.02, lim=0.52, N=128, B=1)


def test_blocked_top_edge_point_exact():
    """A point in [D-1, D) splats weight into cell D-1 only; its would-be
    cell-D weight must vanish, not leak into the blur halo."""
    D, R = 24, 3
    kmat = blur_matrix(jnp.asarray(0.1) * D, D, R)
    st = jnp.asarray(
        [[[5.0, 10.0, 23.5], [12.0, 12.0, 12.0],
          [12.0, 12.0, 12.0], [1.0, 1.0, 1.0]]]
    )  # [1, 4, 3] z-sorted
    sil_b, _ = blocked_forward(st, kmat, D, R, False, "float32", True)
    sil_o, _ = _xla_reference(st, kmat, D, False)
    np.testing.assert_allclose(sil_b, sil_o, atol=2e-6)


def test_blocked_params_validation():
    with pytest.raises(ValueError):
        blocked_params(64, 12, 3)
    p = blocked_params(16384, 128, 8)
    assert p["Dz"] == 32 and p["L"] == 48 and p["Gbz"] == 8
    assert 128 % p["Dz"] == 0


def test_project_dispatch_blocked_at_d72():
    """pointcloud_project routes D > 64 through the blocked kernel and
    matches the XLA renderer end-to-end (sort/unsort + dispatch)."""
    from dpcx.config import Config
    from dpcx.render.project import pointcloud_project

    cfg = Config(vox_size=72, pc_relative_sigma=0.05, renderer="pallas",
                 proj_depth=True)
    pts = jax.random.uniform(
        jax.random.PRNGKey(7), (1, 96, 3), minval=-0.3, maxval=0.3
    )
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    sigma = jnp.asarray(0.05)
    out_p = pointcloud_project(cfg, pts, quat, sigma)
    out_x = pointcloud_project(
        cfg.replace(renderer="xla"), pts, quat, sigma
    )
    np.testing.assert_allclose(
        out_p.silhouette, out_x.silhouette, atol=3e-5
    )
    np.testing.assert_allclose(out_p.depth, out_x.depth, atol=3e-5)


def test_blocked_gradient_through_dispatch():
    """jax.grad through pointcloud_project at D=72 (blocked backward,
    un-sorted cotangents) vs the XLA path."""
    from dpcx.config import Config
    from dpcx.render.project import pointcloud_project

    cfg_p = Config(vox_size=72, pc_relative_sigma=0.05, renderer="pallas")
    cfg_x = cfg_p.replace(renderer="xla")
    pts = jax.random.uniform(
        jax.random.PRNGKey(8), (1, 64, 3), minval=-0.3, maxval=0.3
    )
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    sigma = jnp.asarray(0.05)
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (1, 72, 72))

    def loss(cfg, p):
        out = pointcloud_project(cfg, p, quat, sigma)
        return jnp.mean((out.silhouette - tgt) ** 2)

    g_p = jax.grad(lambda p: loss(cfg_p, p))(pts)
    g_x = jax.grad(lambda p: loss(cfg_x, p))(pts)
    np.testing.assert_allclose(g_p, g_x, atol=1e-5)


@pytest.mark.parametrize("acc", ["float32", "bfloat16"])
def test_blocked_backward_saved_grid_matches_recompute(acc):
    """blocked_backward with the forward's saved blurred volume (the VJP
    residual path) produces the SAME gradients as the recompute path.
    The residual is stored in f32 regardless of acc dtype (the
    (total-prefix)/(1-o) identity amplifies residual rounding ~1/(1-o)
    near saturation), so bf16 perf mode — the production 128^3 training
    dtype — must match its recompute path as tightly as f32 does."""
    D, R, B, N = 16, 2, 2, 256
    st = _sorted_coords(jax.random.PRNGKey(5), D, B, N, 0.45)
    kmat = blur_matrix(jnp.asarray(0.06) * D, D, R)
    ds = jax.random.normal(jax.random.PRNGKey(6), (B, D, D))
    dd = jax.random.normal(jax.random.PRNGKey(7), (B, D, D))
    sil, dep, grid = blocked_forward(
        st, kmat, D, R, True, acc, True, save_grid=True
    )
    assert grid.dtype == jnp.float32  # residual never bf16-rounded
    sil2, dep2 = blocked_forward(st, kmat, D, R, True, acc, True)
    np.testing.assert_allclose(sil, sil2, atol=1e-6)
    d_saved = blocked_backward(
        st, kmat, ds, dd, D, R, True, acc, True, grid=grid
    )
    d_recomp = blocked_backward(
        st, kmat, ds, dd, D, R, True, acc, True
    )
    np.testing.assert_allclose(
        np.asarray(d_saved), np.asarray(d_recomp), atol=1e-5
    )


def test_save_grid_gate_matches_saved_path():
    """pallas_project with save_grid=False (the cfg.remat path) takes the
    recompute backward through the custom VJP dispatch and must produce
    the same values+grads as the default saved-residual path."""
    from dpcx.render.pallas_kernel import pallas_project

    D, B, N = 72, 2, 192  # > 64 -> blocked kernel
    pts = jax.random.uniform(
        jax.random.PRNGKey(3), (B, N, 3), minval=-0.45, maxval=0.45
    )
    sigma = jnp.asarray(0.05) * D
    tgt = jax.random.uniform(jax.random.PRNGKey(4), (B, D, D))

    def loss(p, save):
        s, _ = pallas_project(
            p, D, sigma, 3, interpret=True, save_grid=save
        )
        return jnp.mean((s - tgt) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(pts)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, False))(pts)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=1e-5
    )
