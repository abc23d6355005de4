"""Renderer stage tests: Gaussian kernel normalization, DRC identities,
full projection sanity + schedules (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.render.drc import drc_projection, sum_projection
from dpcx.render.gauss import blur_matrix, gauss_kernel_1d, smoothen_voxels3d
from dpcx.render.project import (
    keep_prob_schedule,
    pointcloud_project,
    sigma_schedule,
)

CFG = Config(vox_size=16, pc_num_points=64, pc_relative_sigma=0.08,
             proj_depth=True)


def test_gauss_kernel_normalized():
    for s in [0.5, 1.0, 3.0]:
        k = gauss_kernel_1d(jnp.asarray(s), radius=4)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)


def test_blur_conserves_interior_mass():
    D = 16
    grid = jnp.zeros((1, D, D, D)).at[0, 8, 8, 8].set(1.0)
    out = smoothen_voxels3d(grid, jnp.asarray(1.0), radius=3)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)
    assert out[0, 8, 8, 8] < 1.0  # mass actually spread


def test_blur_matrix_matches_numpy_conv():
    D, r = 12, 2
    K = blur_matrix(jnp.asarray(0.8), D, r)
    k1d = np.asarray(gauss_kernel_1d(jnp.asarray(0.8), r))
    x = np.random.default_rng(0).normal(size=D)
    want = np.convolve(np.pad(x, r), k1d, mode="valid")
    got = np.asarray(x @ np.asarray(K))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_drc_empty_grid_zero_silhouette():
    o = jnp.zeros((1, 8, 8, 8))
    sil, _ = drc_projection(o)
    np.testing.assert_allclose(sil, 0.0, atol=1e-7)


def test_drc_solid_slab_depth():
    # Fully occupied slab at z=3: silhouette ~1, depth = slab-3 depth value
    Z = 8
    o = jnp.zeros((1, Z, 8, 8)).at[:, 3].set(1.0)
    sil, depth = drc_projection(o, with_depth=True)
    np.testing.assert_allclose(sil, 1.0, atol=1e-4)
    expected_depth = (3 + 0.5) / Z - 0.5
    np.testing.assert_allclose(depth, expected_depth, atol=1e-4)


def test_drc_first_surface_wins():
    # opaque slab at z=2 hides slab at z=5
    Z = 8
    o = jnp.zeros((1, Z, 4, 4)).at[:, 2].set(1.0).at[:, 5].set(1.0)
    _, depth = drc_projection(o, with_depth=True)
    np.testing.assert_allclose(depth, (2 + 0.5) / Z - 0.5, atol=1e-4)


def test_drc_logsum_matches_prod():
    o = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 8), maxval=0.9)
    s1, _ = drc_projection(o, logsum=False)
    s2, _ = drc_projection(o, logsum=True)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_sum_projection_clips():
    o = jnp.ones((1, 8, 4, 4))
    sil, _ = sum_projection(o)
    np.testing.assert_allclose(sil, 1.0)


def test_full_projection_shapes_and_grad():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 64, 3), minval=-0.4, maxval=0.4)
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    out = pointcloud_project(CFG, pts, quat, jnp.asarray(0.05),
                             return_voxels=True)
    assert out.silhouette.shape == (2, 16, 16)
    assert out.depth.shape == (2, 16, 16)
    assert out.voxels.shape == (2, 16, 16, 16)
    assert float(out.silhouette.max()) <= 1.0 + 1e-5

    def loss(p):
        return (
            pointcloud_project(CFG, p, quat, jnp.asarray(0.05)).silhouette
            ** 2
        ).sum()

    g = jax.grad(loss)(pts)
    assert jnp.all(jnp.isfinite(g)) and jnp.abs(g).max() > 0


def test_schedules():
    s0 = sigma_schedule(CFG, jnp.asarray(0))
    s1 = sigma_schedule(CFG, jnp.asarray(CFG.sigma_anneal_steps))
    np.testing.assert_allclose(s0, CFG.pc_relative_sigma, rtol=1e-4)
    np.testing.assert_allclose(s1, CFG.pc_relative_sigma_end, rtol=1e-4)
    k0 = keep_prob_schedule(CFG, jnp.asarray(0))
    k1 = keep_prob_schedule(CFG, jnp.asarray(10**9))
    np.testing.assert_allclose(k0, CFG.pc_point_dropout, rtol=1e-5)
    np.testing.assert_allclose(k1, 1.0, rtol=1e-6)


def test_transform_channel_major_matches():
    """pc_perspective_transform_t (the fused-kernel pre-pass form) is the
    exact transpose of pc_perspective_transform, incl. translation."""
    from dpcx.render.transform import (
        pc_perspective_transform,
        pc_perspective_transform_t,
    )

    k = jax.random.PRNGKey(3)
    pts = jax.random.uniform(k, (4, 257, 3), minval=-0.5, maxval=0.5)
    q = jax.random.normal(jax.random.PRNGKey(4), (4, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (4, 3))
    a = pc_perspective_transform(pts, q, translation=t)
    b = pc_perspective_transform_t(pts, q, translation=t)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(jnp.swapaxes(a, 1, 2)), atol=1e-6
    )
