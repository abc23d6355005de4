"""Stage 1: pose + perspective transform of the point cloud.

Reference parity: dpc/util/point_cloud.py::pc_perspective_transform
(SURVEY.md §2.2 #3): rotate points by the camera quaternion, translate to
camera distance, perspective-divide by focal length; optionally add a
predicted translation before the divide.

Output coordinates are NDC-like, chosen so the unit object box lands inside
[-0.5, 0.5]^3 of the projection frustum:
  x_ndc = x_cam * f / z_full      (z_full = z_cam + camera_distance)
  y_ndc = y_cam * f / z_full
  z_ndc = z_cam                   (centered depth, in ~[-0.5, 0.5])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpcx.geometry.quaternion import quaternion_rotate, quaternion_to_matrix


def pc_perspective_transform(
    points: jax.Array,
    quat: jax.Array,
    focal_length: float | jax.Array = 1.875,
    camera_distance: float | jax.Array = 2.0,
    translation: jax.Array | None = None,
) -> jax.Array:
    """Transform world points [..., N, 3] into NDC given camera quats [..., 4].

    ``translation`` [..., 3] is the optional predicted camera-frame offset
    (the reference's predicted-translation mode).
    """
    p = quaternion_rotate(points, quat)
    if translation is not None:
        p = p + translation[..., None, :]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_full = z + camera_distance
    # Guard the divide: geometry keeps z_full ~ camera_distance +/- 0.87, but
    # a wild predicted translation must not produce inf/nan gradients.
    z_safe = jnp.maximum(z_full, 1e-2)
    f = jnp.asarray(focal_length, dtype=points.dtype)
    return jnp.stack([x * f / z_safe, y * f / z_safe, z], axis=-1)


def pc_perspective_transform_t(
    points: jax.Array,
    quat: jax.Array,
    focal_length: float | jax.Array = 1.875,
    camera_distance: float | jax.Array = 2.0,
    translation: jax.Array | None = None,
) -> jax.Array:
    """Same math as :func:`pc_perspective_transform` but CHANNEL-MAJOR:
    points [..., N, 3] -> NDC [..., 3, N].

    On TPU the [..., N, 3] layout keeps a 3-wide trailing dim through the
    whole rotate/divide chain (lane-padded) and every downstream per-field
    slice is a stride-3 read; computing in [3, N] rows puts N on the lanes
    end-to-end — this is the fused-renderer's pre-pass form (measured ~5x
    cheaper at B=16, N=16k)."""
    rot = quaternion_to_matrix(quat)  # [..., 3, 3]
    # out[j, n] = sum_i R[j, i] * p[n, i]  == (p @ R^T)^T
    p = jnp.einsum(
        "...ji,...ni->...jn", rot, points,
        precision=jax.lax.Precision.HIGHEST,
    )
    if translation is not None:
        p = p + translation[..., :, None]
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    z_full = z + camera_distance
    z_safe = jnp.maximum(z_full, 1e-2)
    f = jnp.asarray(focal_length, dtype=points.dtype)
    return jnp.stack([x * f / z_safe, y * f / z_safe, z], axis=-2)
