"""Pallas fused kernel vs XLA oracle (SURVEY.md §4 items 1, 3, 4): runs in
interpreter mode on CPU; parity on silhouette+depth; custom-VJP gradients
match the scatter-path gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.render.gauss import kernel_radius
from dpcx.render.pallas_kernel import pallas_project
from dpcx.render.project import pointcloud_project

D = 8
N = 64
CFG = Config(vox_size=D, pc_relative_sigma=0.12, proj_depth=True)
SIGMA = jnp.asarray(0.1)
RADIUS = kernel_radius(CFG.pc_relative_sigma, D, CFG.gauss_kernel_truncate)


def _ndc_points(key, b=2, n=N):
    return jax.random.uniform(key, (b, n, 3), minval=-0.45, maxval=0.45)


def _xla_out(pts, pw=None):
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (pts.shape[0], 1))
    # identity quat + zero focal shift: feed NDC directly by inverting the
    # perspective transform is fiddly; instead compare through the same
    # entry: pallas_project consumes NDC, so build the XLA reference on the
    # same NDC input via the internal stages.
    from dpcx.render.drc import drc_projection
    from dpcx.render.gauss import blur_matrix, smoothen_voxels3d
    from dpcx.render.voxelize import pointcloud2voxels_scatter

    grid = pointcloud2voxels_scatter(pts, D, point_weights=pw)
    grid = smoothen_voxels3d(grid, SIGMA * D, RADIUS)
    return drc_projection(grid, with_depth=True)


def test_pallas_matches_xla_forward():
    pts = _ndc_points(jax.random.PRNGKey(0))
    sil_p, depth_p = pallas_project(
        pts, D, SIGMA * D, RADIUS, with_depth=True, interpret=True
    )
    sil_x, depth_x = _xla_out(pts)
    np.testing.assert_allclose(sil_p, sil_x, atol=2e-5)
    np.testing.assert_allclose(depth_p, depth_x, atol=2e-5)


def test_pallas_point_weights():
    pts = _ndc_points(jax.random.PRNGKey(1))
    pw = jax.random.uniform(jax.random.PRNGKey(2), pts.shape[:2])
    sil_p, _ = pallas_project(
        pts, D, SIGMA * D, RADIUS, point_weights=pw, interpret=True
    )
    sil_x, _ = _xla_out(pts, pw=pw)
    np.testing.assert_allclose(sil_p, sil_x, atol=2e-5)


def test_pallas_gradients_match_scatter_path():
    pts = _ndc_points(jax.random.PRNGKey(3), b=1)

    def loss_pallas(p):
        sil, _ = pallas_project(p, D, SIGMA * D, RADIUS, interpret=True)
        return (sil**2).sum()

    def loss_xla(p):
        sil, _ = _xla_out(p)
        return (sil**2).sum()

    gp = jax.grad(loss_pallas)(pts)
    gx = jax.grad(loss_xla)(pts)
    np.testing.assert_allclose(gp, gx, atol=1e-4)
    assert float(jnp.abs(gp).max()) > 0


def test_pallas_vjp_finite_differences():
    """SURVEY.md §4 item 3: finite-difference check of the custom VJP on
    small shapes (includes the splat gather, blur transpose, and cumprod
    gradients)."""
    from jax.test_util import check_grads

    pts = _ndc_points(jax.random.PRNGKey(7), b=1, n=16) * 0.6

    def f(p):
        sil, depth = pallas_project(
            p, D, SIGMA * D, RADIUS, with_depth=True, interpret=True
        )
        return (sil**2).sum() + (depth**2).sum()

    check_grads(f, (pts,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_pallas_out_of_bounds_safe():
    pts = jnp.asarray([[[2.0, -3.0, 0.9], [0.0, 0.0, 0.0]]])
    sil, _ = pallas_project(pts, D, SIGMA * D, RADIUS, interpret=True)
    assert jnp.all(jnp.isfinite(sil))


def test_project_dispatch_pallas_renderer():
    """cfg.renderer='pallas' end-to-end through pointcloud_project."""
    cfg = CFG.replace(renderer="pallas")
    pts = _ndc_points(jax.random.PRNGKey(4)) * 0.5
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    out_p = pointcloud_project(cfg, pts, quat, SIGMA)
    out_x = pointcloud_project(CFG, pts, quat, SIGMA)
    np.testing.assert_allclose(
        out_p.silhouette, out_x.silhouette, atol=2e-5
    )


def test_project_dispatch_falls_through_on_unaligned_vox():
    """vox_size % 8 != 0 must NOT reach the fused kernel (which would
    silently drop the top D % 8 z-slabs): the dispatch falls back to the
    XLA matmul path and matches the scatter oracle."""
    cfg12 = Config(
        vox_size=12, pc_relative_sigma=0.12, renderer="pallas"
    )
    pts = _ndc_points(jax.random.PRNGKey(5)) * 0.5
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    out_p = pointcloud_project(cfg12, pts, quat, SIGMA)
    out_x = pointcloud_project(cfg12.replace(renderer="xla"), pts, quat,
                               SIGMA)
    np.testing.assert_allclose(
        out_p.silhouette, out_x.silhouette, atol=2e-5
    )


def test_project_dispatch_honors_logsum_flag():
    """drc_logsum=True must not silently use the kernel's product DRC."""
    cfg = CFG.replace(renderer="pallas", drc_logsum=True)
    pts = _ndc_points(jax.random.PRNGKey(6)) * 0.5
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    out_p = pointcloud_project(cfg, pts, quat, SIGMA)
    out_x = pointcloud_project(
        cfg.replace(renderer="xla"), pts, quat, SIGMA
    )
    np.testing.assert_allclose(
        out_p.silhouette, out_x.silhouette, atol=2e-5
    )


def test_pack_params_rejects_unaligned_vox():
    import pytest

    from dpcx.render.pallas_kernel import _pack_params

    with pytest.raises(ValueError):
        _pack_params(2, 64, 12)
