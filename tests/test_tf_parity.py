"""Golden-parity harness (SURVEY.md §4 item 1, BASELINE.md silhouette parity).

Re-derives the reference renderer math independently in TF2 using the SAME op
family the TF1 reference used — tf.scatter_nd for the trilinear splat
(ref: dpc/util/point_cloud.py::pointcloud2voxels3d_fast), tf.nn.conv3d for
separable Gaussian smoothing (::smoothen_voxels3d), tf.math.cumprod for DRC
visibility (dpc/util/drc.py::drc_projection) — and asserts the JAX pipeline
matches within fp32 tolerance.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from dpcx.config import Config  # noqa: E402
from dpcx.render.project import pointcloud_project  # noqa: E402

D = 16
CFG = Config(vox_size=D, pc_relative_sigma=0.1, proj_depth=False)


def _quat_matrix_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def tf_reference_render(points, quat, sigma_rel, radius):
    """Independent TF2 re-derivation of the reference pipeline for one
    sample. points [N, 3] world, quat [4] (w,x,y,z)."""
    # stage 1: perspective transform (pc_perspective_transform semantics)
    R = _quat_matrix_np(quat)
    p = points @ R.T
    z_full = p[:, 2] + CFG.camera_distance
    x = p[:, 0] * CFG.focal_length / z_full
    y = p[:, 1] * CFG.focal_length / z_full
    ndc = np.stack([x, y, p[:, 2]], axis=-1)

    # stage 2: trilinear scatter_nd splat into [D, D, D] (z, y, x)
    g = (ndc + 0.5) * D - 0.5
    g = g[:, ::-1]  # (z, y, x)
    i0 = np.floor(g).astype(np.int64)
    frac = (g - i0).astype(np.float32)
    grid = tf.zeros([D, D, D], tf.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (frac[:, 0] if dz else 1 - frac[:, 0])
                    * (frac[:, 1] if dy else 1 - frac[:, 1])
                    * (frac[:, 2] if dx else 1 - frac[:, 2])
                )
                idx = i0 + np.array([dz, dy, dx])
                valid = np.all((idx >= 0) & (idx < D), axis=1)
                grid += tf.scatter_nd(
                    tf.constant(idx[valid]),
                    tf.constant(w[valid]),
                    [D, D, D],
                )

    # stage 3: separable 3x conv3d Gaussian smoothing
    sigma_vox = sigma_rel * D
    taps = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (taps / sigma_vox) ** 2)
    k /= k.sum()
    vol = tf.reshape(grid, [1, D, D, D, 1])
    kz = tf.constant(k.reshape(-1, 1, 1, 1, 1))
    ky = tf.constant(k.reshape(1, -1, 1, 1, 1))
    kx = tf.constant(k.reshape(1, 1, -1, 1, 1))
    for kern in (kx, ky, kz):
        vol = tf.nn.conv3d(vol, kern, strides=[1] * 5, padding="SAME")
    vol = tf.reshape(vol, [D, D, D])

    # stage 4: DRC expected-visibility over depth (axis 0 = z)
    o = tf.clip_by_value(vol, 0.0, 1.0 - 1e-5)
    total_trans = tf.reduce_prod(1.0 - o, axis=0)
    sil = 1.0 - total_trans
    return np.asarray(sil)


def test_silhouette_parity_vs_tf():
    rng = np.random.default_rng(0)
    points = rng.uniform(-0.35, 0.35, size=(200, 3)).astype(np.float32)
    quat = np.array([0.9, 0.1, 0.3, -0.2], dtype=np.float32)
    quat /= np.linalg.norm(quat)
    sigma_rel = 0.1
    from dpcx.render.gauss import kernel_radius

    radius = kernel_radius(CFG.pc_relative_sigma, D, CFG.gauss_kernel_truncate)

    want = tf_reference_render(points, quat, sigma_rel, radius)

    out = pointcloud_project(
        CFG,
        jnp.asarray(points)[None],
        jnp.asarray(quat)[None],
        jnp.asarray(sigma_rel),
    )
    got = np.asarray(out.silhouette[0])
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=2e-5)
