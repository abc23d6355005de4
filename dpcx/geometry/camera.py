"""Camera model: view-angle -> quaternion, look-at frames, intrinsics.

Reference parity: dpc/util/camera.py (intrinsics/extrinsics helpers and
camera-position -> quaternion conversion) per SURVEY.md §2.2 #9.

Frame conventions (tested in tests/test_camera.py):
- World is y-up; objects live in the [-0.5, 0.5]^3 box around the origin.
- A camera is placed on a sphere of radius ``camera_distance`` at (azimuth,
  elevation); azimuth 0, elevation 0 puts it on the +z axis looking at the
  origin.
- The extrinsic quaternion q maps world -> camera: ``p_cam = R(q) p``; the
  camera looks along +z_cam, so depth is ``p_cam.z + camera_distance`` (the
  translation is applied by the renderer's perspective transform, ref:
  dpc/util/point_cloud.py::pc_perspective_transform).
- Camera frame is the right-handed CV convention: +x_cam right, +y_cam DOWN,
  +z_cam forward into the scene (so image row index grows along +y_cam).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpcx.geometry.quaternion import quaternion_normalize


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Branchless: computes all four candidate solutions (one per largest
    component) and selects by trace comparisons with ``jnp.where`` — no
    data-dependent Python control flow, safe under jit/vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _stack(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    tr = m00 + m11 + m22
    # Candidate w-largest
    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    qw = _stack(0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw,
                (m10 - m01) / sw)
    # Candidate x-largest
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = _stack((m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx,
                (m02 + m20) / sx)
    # Candidate y-largest
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = _stack((m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy,
                (m12 + m21) / sy)
    # Candidate z-largest
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = _stack((m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz,
                0.25 * sz)

    use_w = tr > 0.0
    use_x = (m00 >= m11) & (m00 >= m22)
    use_y = m11 >= m22
    q = jnp.where(
        use_w[..., None], qw,
        jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz)),
    )
    return quaternion_normalize(q)


def look_at_quaternion(
    camera_pos: jax.Array, up: jax.Array | None = None
) -> jax.Array:
    """World->camera quaternion for a camera at ``camera_pos`` [..., 3]
    looking at the origin.

    Right-handed CV basis: z_cam = -normalize(camera_pos) (forward, into the
    scene), x_cam = normalize(cross(z_cam, up_world)) (right), y_cam =
    cross(z_cam, x_cam) (down). x_cam x y_cam = z_cam, det = +1.
    """
    if up is None:
        up = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0], camera_pos.dtype), camera_pos.shape
        )
    fwd = -camera_pos / jnp.maximum(
        jnp.linalg.norm(camera_pos, axis=-1, keepdims=True), 1e-12
    )
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(
        jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-12
    )
    down = jnp.cross(fwd, right)
    # Rows of the world->camera matrix are the camera basis vectors in world.
    m = jnp.stack([right, down, fwd], axis=-2)
    return matrix_to_quaternion(m)


def camera_from_view_angles(
    azimuth: jax.Array, elevation: jax.Array, distance: float | jax.Array = 2.0
) -> tuple[jax.Array, jax.Array]:
    """(azimuth, elevation) [radians, broadcastable] -> (quaternion, position).

    Mirrors the reference dataset convention of sampling random
    azimuth/elevation views per model (SURVEY.md §3.5); the quaternion is the
    per-view extrinsic stored alongside each rendered mask.
    """
    azimuth = jnp.asarray(azimuth)
    elevation = jnp.asarray(elevation)
    ce = jnp.cos(elevation)
    pos = jnp.stack(
        [ce * jnp.sin(azimuth), jnp.sin(elevation), ce * jnp.cos(azimuth)],
        axis=-1,
    ) * jnp.asarray(distance)[..., None]
    return look_at_quaternion(pos), pos


def intrinsics_matrix(
    focal_length: float, image_size: int, dtype=jnp.float32
) -> jax.Array:
    """Pinhole intrinsics for a unit-sensor camera: NDC in [-0.5, 0.5] maps
    to pixel coordinates [0, image_size)."""
    f = focal_length * image_size
    c = (image_size - 1) / 2.0
    return jnp.asarray(
        [[f, 0.0, c], [0.0, f, c], [0.0, 0.0, 1.0]], dtype=dtype
    )
