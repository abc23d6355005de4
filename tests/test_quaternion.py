"""Quaternion identities (SURVEY.md §4 item 2): q*q^-1 = 1, rotate-vs-matrix
agreement, composition, norm preservation, angular distance properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.geometry import (
    quaternion_angular_distance,
    quaternion_conjugate,
    quaternion_from_axis_angle,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_rotate,
    quaternion_to_matrix,
    random_quaternion,
)

KEY = jax.random.PRNGKey(42)


def test_multiply_conjugate_is_identity():
    q = random_quaternion(KEY, (16,))
    ident = quaternion_multiply(q, quaternion_conjugate(q))
    np.testing.assert_allclose(
        ident, jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (16, 1)), atol=1e-6
    )


def test_rotate_matches_matrix():
    q = random_quaternion(KEY, (8,))
    pts = jax.random.normal(jax.random.PRNGKey(1), (8, 50, 3))
    rot = quaternion_rotate(pts, q)
    mats = quaternion_to_matrix(q)
    expected = jnp.einsum(
        "bij,bnj->bni", mats, pts, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(rot, expected, atol=1e-5)


def test_rotation_preserves_norm():
    q = random_quaternion(KEY, (8,))
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 50, 3))
    rot = quaternion_rotate(pts, q)
    np.testing.assert_allclose(
        jnp.linalg.norm(rot, axis=-1), jnp.linalg.norm(pts, axis=-1),
        rtol=1e-5,
    )


def test_composition():
    k1, k2 = jax.random.split(KEY)
    q1, q2 = random_quaternion(k1, (8,)), random_quaternion(k2, (8,))
    pts = jax.random.normal(jax.random.PRNGKey(3), (8, 20, 3))
    seq = quaternion_rotate(quaternion_rotate(pts, q2), q1)
    comp = quaternion_rotate(pts, quaternion_multiply(q1, q2))
    np.testing.assert_allclose(seq, comp, atol=1e-5)


def test_axis_angle_known_rotation():
    # 90 deg about z: x-axis -> y-axis
    q = quaternion_from_axis_angle(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(jnp.pi / 2)
    )
    p = quaternion_rotate(jnp.asarray([[1.0, 0.0, 0.0]]), q)
    np.testing.assert_allclose(p, [[0.0, 1.0, 0.0]], atol=1e-6)


@pytest.mark.parametrize("angle", [0.1, 1.0, 3.0])
def test_angular_distance(angle):
    axis = jnp.asarray([0.0, 1.0, 0.0])
    q0 = quaternion_from_axis_angle(axis, jnp.asarray(0.0))
    q1 = quaternion_from_axis_angle(axis, jnp.asarray(angle))
    d = quaternion_angular_distance(q0, q1)
    np.testing.assert_allclose(d, angle, atol=1e-5)
    # sign invariance
    d_neg = quaternion_angular_distance(q0, -q1)
    np.testing.assert_allclose(d_neg, angle, atol=1e-5)


def test_normalize_gradient_safe():
    g = jax.grad(lambda q: quaternion_normalize(q).sum())(
        jnp.asarray([2.0, 0.0, 0.0, 0.0])
    )
    assert jnp.all(jnp.isfinite(g))
