"""Splat unit tests (SURVEY.md §4 item 2): trilinear weights sum to 1, mass
conservation, scatter == matmul formulations, OOB handling, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.render.voxelize import (
    pointcloud2voxels_matmul,
    pointcloud2voxels_scatter,
)

D = 16


def _rand_ndc(key, b, n, lo=-0.45, hi=0.45):
    return jax.random.uniform(key, (b, n, 3), minval=lo, maxval=hi)


def test_mass_conservation_interior():
    pts = _rand_ndc(jax.random.PRNGKey(0), 2, 100)
    grid = pointcloud2voxels_scatter(pts, D)
    # each interior point deposits total weight 1
    np.testing.assert_allclose(grid.sum(axis=(1, 2, 3)), 100.0, rtol=1e-5)


def test_single_point_at_cell_center():
    # NDC position of cell center (i+0.5)/D - 0.5 -> all mass in one cell
    i = 5
    p = (i + 0.5) / D - 0.5
    pts = jnp.asarray([[[p, p, p]]])
    grid = pointcloud2voxels_scatter(pts, D)
    assert grid[0, i, i, i] == 1.0
    assert grid.sum() == 1.0


def test_scatter_matmul_equivalence():
    # including out-of-bounds points: hat clipping == scatter drop semantics
    pts = _rand_ndc(jax.random.PRNGKey(1), 2, 200, lo=-0.7, hi=0.7)
    gs = pointcloud2voxels_scatter(pts, D)
    gm = pointcloud2voxels_matmul(pts, D)
    np.testing.assert_allclose(gs, gm, atol=1e-5)


def test_scatter_matmul_rgb_equivalence():
    """The MXU matmul splat's rgb grid matches the scatter oracle's
    (VERDICT round-1 weak item 6: TPU RGB training must not fall back to
    the ~13 Mpts/s scatter path)."""
    pts = _rand_ndc(jax.random.PRNGKey(4), 2, 100)
    rgb = jax.random.uniform(jax.random.PRNGKey(5), (2, 100, 3))
    gs, cs = pointcloud2voxels_scatter(pts, D, rgb=rgb)
    gm, cm = pointcloud2voxels_matmul(pts, D, rgb=rgb)
    np.testing.assert_allclose(gs, gm, atol=1e-5)
    np.testing.assert_allclose(cs, cm, atol=1e-5)


def test_point_weights():
    pts = _rand_ndc(jax.random.PRNGKey(2), 1, 50)
    w = jax.random.uniform(jax.random.PRNGKey(3), (1, 50))
    gs = pointcloud2voxels_scatter(pts, D, point_weights=w)
    gm = pointcloud2voxels_matmul(pts, D, point_weights=w)
    np.testing.assert_allclose(gs.sum(), w.sum(), rtol=1e-5)
    np.testing.assert_allclose(gs, gm, atol=1e-5)


def test_out_of_grid_dropped():
    pts = jnp.asarray([[[5.0, 5.0, 5.0], [-5.0, 0.0, 0.0]]])
    grid = pointcloud2voxels_scatter(pts, D)
    np.testing.assert_allclose(grid.sum(), 0.0, atol=1e-7)


def test_gradients_match():
    pts = _rand_ndc(jax.random.PRNGKey(4), 1, 30)

    def loss_s(p):
        return (pointcloud2voxels_scatter(p, D) ** 2).sum()

    def loss_m(p):
        return (pointcloud2voxels_matmul(p, D) ** 2).sum()

    gs, gm = jax.grad(loss_s)(pts), jax.grad(loss_m)(pts)
    np.testing.assert_allclose(gs, gm, atol=1e-4)
    assert jnp.abs(gs).max() > 0


def test_rgb_splat():
    pts = _rand_ndc(jax.random.PRNGKey(5), 1, 40)
    rgb = jax.random.uniform(jax.random.PRNGKey(6), (1, 40, 3))
    grid, rgb_grid = pointcloud2voxels_scatter(pts, D, rgb=rgb)
    assert rgb_grid.shape == (1, D, D, D, 3)
    # normalized colors stay inside the color range
    assert float(rgb_grid.max()) <= 1.0 + 1e-4
