"""Quaternion math, pure jax.numpy.

Reference parity: dpc/util/quaternion.py (quaternion_multiply,
quaternion_conjugate, quaternion_rotate, normalization, quat->matrix) in
eldar/differentiable-point-clouds; symbol-level citation per SURVEY.md §2.2 #8
(line numbers unavailable — reference mount empty, see SURVEY.md §0).

Conventions (tested in tests/test_quaternion.py):
- component order ``(w, x, y, z)``
- unit quaternions represent ACTIVE rotations: ``rotate(p, q) == R(q) @ p``
- ``quaternion_rotate`` goes through the 3x3 rotation matrix so batched point
  rotation is a single ``[..., N, 3] @ [..., 3, 3]`` matmul (MXU-friendly on
  TPU) rather than per-point Hamilton products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit quaternion along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quaternion_conjugate(q: jax.Array) -> jax.Array:
    """(w, x, y, z) -> (w, -x, -y, -z). Inverse for unit quaternions."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2; composes rotations: R(q1*q2) = R(q1)R(q2)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3] (active)."""
    q = quaternion_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_rotate(points: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate points [..., N, 3] by quaternions [..., 4].

    One batched matmul: ``p @ R(q)^T`` — equivalent to the reference's
    Hamilton-product formulation (dpc/util/quaternion.py::quaternion_rotate)
    but expressed as a dense contraction so XLA tiles it onto the MXU.
    """
    rot = quaternion_to_matrix(q)
    return jnp.einsum(
        "...ni,...ji->...nj", points, rot,
        precision=jax.lax.Precision.HIGHEST,
    )


def quaternion_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis [..., 3] + angle [...] (radians) -> quaternion [..., 4]."""
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12
    )
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quaternion_angular_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angular distance in radians between rotations, in [0, pi].

    Sign-invariant (q and -q are the same rotation). Used by the pose eval
    (acc@30deg / median error; ref: eval scripts in dpc/run/) and by the
    student-distillation loss.
    """
    q1 = quaternion_normalize(q1)
    q2 = quaternion_normalize(q2)
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0))


def random_quaternion(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random rotations (Shoemake): shape + (4,), unit norm."""
    u1, u2, u3 = jax.random.uniform(key, (3,) + shape)
    a, b = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    t2, t3 = 2.0 * jnp.pi * u2, 2.0 * jnp.pi * u3
    return jnp.stack(
        [b * jnp.cos(t3), a * jnp.sin(t2), a * jnp.cos(t2), b * jnp.sin(t3)],
        axis=-1,
    )
