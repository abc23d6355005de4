"""Point-sharded renderer == unsharded renderer on the 8-device CPU mesh
(SURVEY.md §4 item 5, §2.3 point/grid sharding lever)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.config import Config
from dpcx.parallel.mesh import make_mesh
from dpcx.render.project import pointcloud_project
from dpcx.render.sharded import pointcloud_project_point_sharded

CFG = Config(vox_size=12, pc_relative_sigma=0.1)


def test_point_sharded_matches_unsharded():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    mesh = make_mesh(CFG)
    n_dev = mesh.devices.size
    N = 16 * n_dev
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (2, N, 3), minval=-0.4, maxval=0.4
    )
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    sigma = jnp.asarray(0.1)
    sharded = pointcloud_project_point_sharded(CFG, mesh, pts, quat, sigma)
    ref = pointcloud_project(CFG, pts, quat, sigma).silhouette
    np.testing.assert_allclose(sharded, ref, atol=1e-5)
