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

import jax  # noqa: E402
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


def _quat_multiply_np(a, b):
    """Hamilton product, (w, x, y, z) convention."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def tf_reference_render(
    points, quat, sigma_rel, radius, logsum=False, rgb=None
):
    """Independent TF2 re-derivation of the reference pipeline for one
    sample. points [N, 3] world, quat [4] (w,x,y,z). Returns a dict with
    silhouette, expected depth (ref: dpc/util/drc.py::drc_depth_projection)
    and, when ``rgb`` [N, 3] is given, the expected-color projection."""
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
    rgb_grid = tf.zeros([D, D, D, 3], tf.float32) if rgb is not None else None
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
                if rgb is not None:
                    rgb_grid += tf.scatter_nd(
                        tf.constant(idx[valid]),
                        tf.constant(w[valid, None] * rgb[valid]),
                        [D, D, D, 3],
                    )
    if rgb is not None:
        rgb_grid = rgb_grid / tf.maximum(grid[..., None], 1e-6)

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
    if logsum:
        # the reference's flag-gated log-space variant
        log_t = tf.math.log1p(-o)
        csum = tf.math.cumsum(log_t, axis=0, exclusive=True)
        trans = tf.exp(csum)
        total_trans = tf.exp(tf.reduce_sum(log_t, axis=0))
    else:
        trans = tf.math.cumprod(1.0 - o, axis=0, exclusive=True)
        total_trans = tf.reduce_prod(1.0 - o, axis=0)
    p_stop = o * trans
    sil = 1.0 - total_trans
    d_vals = ((np.arange(D, dtype=np.float32) + 0.5) / D - 0.5).reshape(
        D, 1, 1
    )
    depth = tf.reduce_sum(p_stop * d_vals, axis=0) + 1.0 * total_trans
    out = {"sil": np.asarray(sil), "depth": np.asarray(depth)}
    if rgb is not None:
        out["rgb"] = np.asarray(
            tf.reduce_sum(p_stop[..., None] * rgb_grid, axis=0)
        )
    return out


def _case(seed, sigma_rel):
    rng = np.random.default_rng(seed)
    points = rng.uniform(-0.35, 0.35, size=(200, 3)).astype(np.float32)
    quat = rng.normal(size=4).astype(np.float32)
    quat /= np.linalg.norm(quat)
    from dpcx.render.gauss import kernel_radius

    radius = kernel_radius(
        CFG.pc_relative_sigma, D, CFG.gauss_kernel_truncate
    )
    return points, quat, sigma_rel, radius


def test_silhouette_parity_vs_tf():
    points, quat, sigma_rel, radius = _case(0, 0.1)
    want = tf_reference_render(points, quat, sigma_rel, radius)["sil"]
    out = pointcloud_project(
        CFG,
        jnp.asarray(points)[None],
        jnp.asarray(quat)[None],
        jnp.asarray(sigma_rel),
    )
    got = np.asarray(out.silhouette[0])
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_depth_projection_parity_vs_tf():
    """drc_depth_projection semantics: expected stop depth + background
    depth for escaping rays (SURVEY.md §2.2 #6 [M] row, now golden)."""
    points, quat, sigma_rel, radius = _case(1, 0.08)
    want = tf_reference_render(points, quat, sigma_rel, radius)["depth"]
    out = pointcloud_project(
        CFG.replace(proj_depth=True),
        jnp.asarray(points)[None],
        jnp.asarray(quat)[None],
        jnp.asarray(sigma_rel),
    )
    np.testing.assert_allclose(np.asarray(out.depth[0]), want, atol=2e-5)


def test_logsum_drc_parity_vs_tf():
    """The reference's flag-gated log-space DRC variant."""
    points, quat, sigma_rel, radius = _case(2, 0.06)
    want = tf_reference_render(
        points, quat, sigma_rel, radius, logsum=True
    )["sil"]
    out = pointcloud_project(
        CFG.replace(drc_logsum=True),
        jnp.asarray(points)[None],
        jnp.asarray(quat)[None],
        jnp.asarray(sigma_rel),
    )
    np.testing.assert_allclose(
        np.asarray(out.silhouette[0]), want, atol=3e-5
    )


def test_rgb_projection_parity_vs_tf():
    """RGB path: weight-normalized color voxelization + expected color
    along the ray (ref: pointcloud2voxels3d_fast rgb channels)."""
    points, quat, sigma_rel, radius = _case(3, 0.1)
    rng = np.random.default_rng(30)
    rgb = rng.uniform(0, 1, size=(points.shape[0], 3)).astype(np.float32)
    want = tf_reference_render(points, quat, sigma_rel, radius, rgb=rgb)
    out = pointcloud_project(
        CFG,
        jnp.asarray(points)[None],
        jnp.asarray(quat)[None],
        jnp.asarray(sigma_rel),
        rgb=jnp.asarray(rgb)[None],
    )
    np.testing.assert_allclose(
        np.asarray(out.silhouette[0]), want["sil"], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb[0]), want["rgb"], atol=3e-5
    )


def test_candidate_hard_min_loss_parity_vs_tf():
    """K-candidate hard-min projection loss + student distillation vs an
    independent TF/NumPy derivation (ref: dpc/models/model_pc.py::
    proj_loss_pose_candidates + ::add_student_loss, SURVEY.md §3.4)."""
    from dpcx.config import Config
    from dpcx.models.losses import compute_loss

    K, V, N = 3, 2, 150
    rng = np.random.default_rng(4)
    cfg = Config(
        vox_size=D, pc_relative_sigma=0.1, pc_relative_sigma_end=0.1,
        proj_depth=False,
        predict_pose=True, pose_predict_num_candidates=K,
        pose_student=True, pose_student_weight=0.5,
        pc_point_dropout=1.0, translation_weight=0.0,
    )
    points = rng.uniform(-0.3, 0.3, size=(1, N, 3)).astype(np.float32)
    cand = rng.normal(size=(1, K, 4)).astype(np.float32)
    cand /= np.linalg.norm(cand, axis=-1, keepdims=True)
    student = rng.normal(size=(1, 4)).astype(np.float32)
    student /= np.linalg.norm(student)
    q_gt = rng.normal(size=(1, V, 4)).astype(np.float32)
    q_gt /= np.linalg.norm(q_gt, axis=-1, keepdims=True)
    q_in = np.array([[1.0, 0, 0, 0]], dtype=np.float32)  # identity input
    masks = rng.uniform(0, 1, size=(1, V, D, D)).astype(np.float32)
    sigma_rel = 0.1
    radius = __import__("dpcx.render.gauss", fromlist=["kernel_radius"]) \
        .kernel_radius(cfg.pc_relative_sigma, D, cfg.gauss_kernel_truncate)

    # --- TF/NumPy independent derivation ---
    l_k = np.zeros(K)
    for k in range(K):
        errs = []
        for v in range(V):
            # q_rel(v) = q_gt(v) * conj(q_in) = q_gt(v); full = q_rel * q_k
            q_full = _quat_multiply_np(q_gt[0, v], cand[0, k])
            sil = tf_reference_render(
                points[0], q_full, sigma_rel, radius
            )["sil"]
            errs.append(np.mean((sil - masks[0, v]) ** 2))
        l_k[k] = np.mean(errs)
    k_star = int(np.argmin(l_k))
    want_proj = l_k[k_star]
    dot = float(np.sum(student[0] * cand[0, k_star]))
    want_student = 1.0 - dot**2
    want_total = cfg.proj_weight * want_proj + 0.5 * want_student

    # --- dpcx loss ---
    preds = {
        "points": jnp.asarray(points),
        "quats": jnp.asarray(cand),
        "student_quat": jnp.asarray(student),
    }
    batch = {
        "masks": jnp.asarray(masks),
        "quats": jnp.asarray(q_gt),
        "quat_in": jnp.asarray(q_in),
    }
    total, metrics = compute_loss(
        cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(0),
        train=True,
    )
    np.testing.assert_allclose(
        float(metrics["loss_proj"]), want_proj, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["loss_student"]), want_student, rtol=1e-4
    )
    np.testing.assert_allclose(float(total), want_total, rtol=1e-4)
