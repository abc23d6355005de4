"""RBF slow-path voxelizer (ref #2), visualization, profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.render.gauss import blur_matrix
from dpcx.render.voxelize import (
    pointcloud2voxels_rbf,
    pointcloud2voxels_scatter,
)
from dpcx.utils.profiling import benchmark_fn
from dpcx.utils.visualise import render_cloud_image, save_image_grid

D = 16


def test_rbf_matches_splat_plus_blur():
    """RBF voxelization == trilinear splat + Gaussian blur for interior
    points (the trilinear hat is a 2nd-order approximation, so tolerance is
    loose but the mass and structure must agree)."""
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (1, 50, 3), minval=-0.3, maxval=0.3
    )
    sigma = jnp.asarray(1.2)
    rbf = pointcloud2voxels_rbf(pts, D, sigma)
    grid = pointcloud2voxels_scatter(pts, D)
    K = blur_matrix(sigma, D, radius=5)
    p = jax.lax.Precision.HIGHEST
    blurred = jnp.einsum("bzyx,xi->bzyi", grid, K, precision=p)
    blurred = jnp.einsum("bzyx,yi->bzix", blurred, K, precision=p)
    blurred = jnp.einsum("bzyx,zi->biyx", blurred, K, precision=p)
    # total mass agrees closely; pointwise within a few percent of peak
    np.testing.assert_allclose(rbf.sum(), blurred.sum(), rtol=0.02)
    assert float(jnp.abs(rbf - blurred).max()) < 0.1 * float(blurred.max())


def test_render_cloud_image():
    cfg = Config(vox_size=16)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (200, 3), minval=-0.3, maxval=0.3
    )
    img = render_cloud_image(cfg, pts)
    assert img.shape == (16, 16)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0  # something rendered


def test_save_image_grid(tmp_path):
    imgs = [np.random.default_rng(i).random((8, 8)) for i in range(5)]
    p = tmp_path / "grid.png"
    save_image_grid(imgs, p, cols=3)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100


def test_benchmark_fn():
    f = jax.jit(lambda: jnp.ones((8, 8)).sum())
    stats = benchmark_fn(lambda: f(), iters=3, warmup=1)
    assert stats["sec_per_iter"] > 0
