"""Camera round-trips (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.geometry import camera_from_view_angles, look_at_quaternion
from dpcx.geometry.camera import matrix_to_quaternion
from dpcx.geometry.quaternion import (
    quaternion_rotate,
    quaternion_to_matrix,
    random_quaternion,
)


def test_matrix_quaternion_roundtrip():
    q = random_quaternion(jax.random.PRNGKey(0), (64,))
    m = quaternion_to_matrix(q)
    q2 = matrix_to_quaternion(m)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_front_camera_maps_origin_axis():
    # Camera on +z axis looking at origin: a point toward the camera
    # (world +z) must land at negative camera depth (closer than center).
    q, pos = camera_from_view_angles(jnp.asarray(0.0), jnp.asarray(0.0), 2.0)
    np.testing.assert_allclose(pos, [0.0, 0.0, 2.0], atol=1e-6)
    p = quaternion_rotate(jnp.asarray([[0.0, 0.0, 0.3]]), q)
    np.testing.assert_allclose(p, [[0.0, 0.0, -0.3]], atol=1e-6)
    # CV frame: world +y (up) maps to -y_cam (y_cam is down); +x stays right
    p = quaternion_rotate(jnp.asarray([[0.0, 0.2, 0.0], [0.2, 0.0, 0.0]]), q)
    np.testing.assert_allclose(p, [[0.0, -0.2, 0.0], [0.2, 0.0, 0.0]],
                               atol=1e-6)


def test_camera_position_maps_to_minus_depth():
    # Any camera: its own position normalized must map to (0, 0, -1)*|pos|.
    az = jnp.asarray([0.3, 1.2, -2.0, 3.0])
    el = jnp.asarray([0.1, -0.4, 0.8, 0.0])
    q, pos = camera_from_view_angles(az, el, 2.0)
    p = quaternion_rotate(pos[:, None, :], q)[:, 0]
    np.testing.assert_allclose(
        p, jnp.tile(jnp.asarray([0.0, 0.0, -2.0]), (4, 1)), atol=1e-5
    )


def test_look_at_consistency():
    pos = jnp.asarray([[1.0, 1.0, 1.0], [-0.5, 2.0, 0.3]])
    q = look_at_quaternion(pos)
    p = quaternion_rotate(pos[:, None, :], q)[:, 0]
    norms = jnp.linalg.norm(pos, axis=-1)
    np.testing.assert_allclose(p[:, 2], -norms, atol=1e-5)
    np.testing.assert_allclose(p[:, :2], 0.0, atol=1e-5)
