"""Model + loss unit tests: shapes, hard-min gradient gating, student loss,
eval metrics (SURVEY.md §4 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.eval.chamfer import chamfer_distance, directed_distance
from dpcx.eval.pose_metrics import pose_error_metrics
from dpcx.models.losses import compute_loss
from dpcx.models.model_pc import ModelPointCloud

TINY = Config(
    vox_size=12,
    pc_num_points=64,
    image_size=32,
    encoder_filters=(8, 16),
    latent_dim=32,
    fc_hidden=32,
    pc_decoder_hidden=(32,),
    views_per_step=2,
    num_views=2,
    pc_point_dropout=1.0,
)


def _fake_batch(cfg, B=2):
    key = jax.random.PRNGKey(0)
    D, V = cfg.vox_size, cfg.views_per_step
    return {
        "image": jax.random.uniform(key, (B, cfg.image_size, cfg.image_size, 3)),
        "masks": (jax.random.uniform(key, (B, V, D, D)) > 0.7).astype(
            jnp.float32
        ),
        "depths": jnp.zeros((B, V, D, D)),
        "quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, V, 1)),
        "quat_in": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1)),
    }


def test_model_forward_shapes():
    model = ModelPointCloud(TINY)
    B = 2
    img = jnp.zeros((B, TINY.image_size, TINY.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    preds = model.apply(params, img)
    assert preds["points"].shape == (B, TINY.pc_num_points, 3)
    assert preds["scale"].shape == (B, 1)
    assert float(jnp.abs(preds["points"]).max()) <= 0.5


def test_model_pose_forward():
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=3)
    model = ModelPointCloud(cfg)
    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    preds = model.apply(params, img)
    assert preds["quats"].shape == (2, 3, 4)
    assert preds["student_quat"].shape == (2, 4)
    np.testing.assert_allclose(
        jnp.linalg.norm(preds["quats"], axis=-1), 1.0, rtol=1e-5
    )


def test_pose_candidate_offsets():
    """With offsets on, candidate k is (approximately, at init) the fixed
    azimuth rotation 2*pi*k/K about the vertical axis — the ensemble
    covers the flip modes by construction; with offsets off, all
    candidates start near identity."""
    from dpcx.geometry.quaternion import quaternion_rotate

    img = jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    p = jnp.asarray([[0.3, 0.0, 0.2]])  # a point off the rotation axis

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=4,
        pose_candidate_offsets=True,
    )
    model = ModelPointCloud(cfg)
    params = model.init(jax.random.PRNGKey(0), img)
    quats = model.apply(params, img)["quats"][0]  # [4, 4]
    np.testing.assert_allclose(
        jnp.linalg.norm(quats, axis=-1), 1.0, rtol=1e-5
    )
    # candidate 2 (theta=pi) maps the test point near its y-axis mirror
    rot2 = quaternion_rotate(p, quats[2])
    base = quaternion_rotate(p, quats[0])
    flipped = base * jnp.asarray([-1.0, 1.0, -1.0])
    np.testing.assert_allclose(rot2, flipped, atol=0.15)
    # candidates are genuinely spread: pairwise |<q_i, q_j>| well below 1
    dots = jnp.abs(jnp.einsum("kd,jd->kj", quats, quats))
    off_diag = dots - jnp.diag(jnp.diag(dots))
    assert float(off_diag.max()) < 0.9

    cfg_off = cfg.replace(pose_candidate_offsets=False)
    model_off = ModelPointCloud(cfg_off)
    params_off = model_off.init(jax.random.PRNGKey(0), img)
    q_off = model_off.apply(params_off, img)["quats"][0]
    dots_off = jnp.abs(jnp.einsum("kd,jd->kj", q_off, q_off))
    assert float(dots_off.min()) > 0.9  # all near the same rotation


def test_loss_gt_pose_runs_and_grads():
    model = ModelPointCloud(TINY)
    batch = _fake_batch(TINY)
    params = model.init(jax.random.PRNGKey(0), batch["image"])

    def loss_fn(p):
        preds = model.apply(p, batch["image"])
        loss, _ = compute_loss(
            TINY, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(loss)
    leaves = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_loss_resizes_foreign_mask_resolution():
    """External datasets (tfrecord converts) may store masks/depths at a
    resolution other than vox_size (ref keeps multiple mask sizes and picks
    one; we resize at loss time). Both loss branches must accept them."""
    for cfg in (
        TINY.replace(proj_depth=True, drc_weight=0.1),
        TINY.replace(predict_pose=True, pose_predict_num_candidates=2),
    ):
        model = ModelPointCloud(cfg)
        batch = _fake_batch(cfg, B=2)
        B, V = 2, cfg.views_per_step
        M = 2 * cfg.vox_size  # foreign resolution != D
        key = jax.random.PRNGKey(3)
        batch["masks"] = (
            jax.random.uniform(key, (B, V, M, M)) > 0.7
        ).astype(jnp.float32)
        batch["depths"] = jnp.ones((B, V, M, M))
        params = model.init(jax.random.PRNGKey(0), batch["image"])

        def loss_fn(p):
            preds = model.apply(p, batch["image"])
            loss, _ = compute_loss(
                cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(loss)
        assert all(
            jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        )


def test_hard_min_gates_gradients():
    """Only the winning pose candidate receives projection gradients."""
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                       pose_student=False)
    B, N, D, V = 1, 16, cfg.vox_size, cfg.views_per_step
    points = jax.random.uniform(
        jax.random.PRNGKey(0), (B, N, 3), minval=-0.3, maxval=0.3
    )
    batch = _fake_batch(cfg, B=B)
    # candidate 0 = identity (good), candidate 1 = far rotation (bad)
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])

    def loss_fn(q):
        preds = {"points": points, "quats": q}
        loss, m = compute_loss(
            cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        return loss, m

    # render with identity-candidate silhouette close to the mask by making
    # masks equal to the identity projection
    from dpcx.render.project import pointcloud_project, sigma_schedule

    sil = pointcloud_project(
        cfg, jnp.tile(points, (V, 1, 1)),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (V, 1)),
        sigma_schedule(cfg, jnp.asarray(0)),
    ).silhouette
    batch["masks"] = sil[None]

    (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(quats)
    # winner = candidate 0 -> zero grad on candidate 1's quaternion
    assert float(jnp.abs(g[0, 1]).max()) == 0.0
    assert float(jnp.abs(g[0, 0]).max()) >= 0.0


def test_student_loss_pulls_to_winner():
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                       pose_student=True, pose_student_weight=1.0)
    batch = _fake_batch(cfg, B=1)
    points = jnp.zeros((1, 16, 3))
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])
    student = jnp.asarray([[0.7, 0.7, 0.0, 0.0]])
    preds = {"points": points, "quats": quats,
             "student_quat": student / jnp.linalg.norm(student)}
    _, metrics = compute_loss(
        cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    assert "loss_student" in metrics
    assert float(metrics["loss_student"]) > 0.0


def test_student_warmup_schedule():
    """pose_student_warmup_steps ramps the student weight linearly: the
    student term contributes 0 at step 0, half weight mid-ramp, and the
    full weight at/after the end (gauge-lottery mechanism c)."""
    base = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                        pose_student=True, pose_student_weight=4.0)
    warm = base.replace(pose_student_warmup_steps=100)
    batch = _fake_batch(cfg=base, B=1)
    points = jnp.zeros((1, 16, 3))
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])
    student = jnp.asarray([[0.6, 0.8, 0.0, 0.0]])
    preds = {"points": points, "quats": quats, "student_quat": student}
    key = jax.random.PRNGKey(1)

    def total(cfg, step):
        t, m = compute_loss(cfg, preds, batch, jnp.asarray(step), key)
        return float(t), float(m["loss_student"])

    t_base, ls = total(base, 0)
    t0, ls0 = total(warm, 0)
    t50, _ = total(warm, 50)
    t100, _ = total(warm, 100)
    assert ls0 == ls  # the METRIC is the raw loss either way
    np.testing.assert_allclose(t0, t_base - 4.0 * ls, rtol=1e-5)
    np.testing.assert_allclose(t50, t_base - 2.0 * ls, rtol=1e-5)
    np.testing.assert_allclose(t100, t_base, rtol=1e-5)


def test_anchor_loss_pulls_corrections_to_identity():
    """pose_anchor_weight regularizes the pre-offset corrections toward
    identity (1 - w^2, sign-invariant), decaying to zero over
    pose_anchor_steps (gauge-lottery mechanism b)."""
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                       pose_student=False, pose_anchor_weight=2.0,
                       pose_anchor_steps=100)
    batch = _fake_batch(cfg, B=1)
    points = jnp.zeros((1, 16, 3))
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])
    s = 1.0 / np.sqrt(2.0)
    corr = jnp.asarray([[[1.0, 0, 0, 0], [s, 0, s, 0]]])  # id, 90deg
    preds = {"points": points, "quats": quats, "correction_quats": corr}
    key = jax.random.PRNGKey(1)

    t0, m0 = compute_loss(cfg, preds, batch, jnp.asarray(0), key)
    np.testing.assert_allclose(float(m0["loss_anchor"]), 0.25, rtol=1e-5)
    # -identity is also zero-penalty (sign invariance)
    preds_neg = dict(preds, correction_quats=-corr)
    _, mneg = compute_loss(cfg, preds_neg, batch, jnp.asarray(0), key)
    np.testing.assert_allclose(
        float(mneg["loss_anchor"]), float(m0["loss_anchor"]), rtol=1e-6
    )
    # identity corrections -> zero anchor loss
    preds_id = dict(
        preds, correction_quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]),
                                         (1, 2, 1))
    )
    _, mid = compute_loss(cfg, preds_id, batch, jnp.asarray(0), key)
    assert float(mid["loss_anchor"]) == 0.0
    # linear decay: contribution halves at step 50, gone by step 100
    t50, _ = compute_loss(cfg, preds, batch, jnp.asarray(50), key)
    t100, _ = compute_loss(cfg, preds, batch, jnp.asarray(100), key)
    anchor0 = float(t0) - float(t100)
    np.testing.assert_allclose(anchor0, 2.0 * 0.25, rtol=1e-4)
    np.testing.assert_allclose(
        float(t50) - float(t100), anchor0 / 2.0, rtol=1e-3
    )
    # the model's pose head actually emits corrections, and the anchor
    # gradient reaches its parameters
    model = ModelPointCloud(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out["correction_quats"].shape == (1, 2, 4)

    def loss_fn(p):
        pr = model.apply(p, batch["image"][:1])
        t, _ = compute_loss(cfg, pr, batch, jnp.asarray(0), key)
        return t

    g = jax.grad(loss_fn)(params)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


def test_rgb_loss_path():
    """pc_rgb: color head + rgb re-projection loss (BASELINE config 5)."""
    cfg = TINY.replace(pc_rgb=True, rgb_weight=1.0)
    model = ModelPointCloud(cfg)
    batch = _fake_batch(cfg)
    B, V, D = 2, cfg.views_per_step, cfg.vox_size
    batch["images_tgt"] = jax.random.uniform(
        jax.random.PRNGKey(9), (B, V, cfg.image_size, cfg.image_size, 3)
    )
    params = model.init(jax.random.PRNGKey(0), batch["image"])

    def loss_fn(p):
        preds = model.apply(p, batch["image"])
        assert "rgb" in preds
        loss, m = compute_loss(
            cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        return loss, m

    (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert "loss_rgb" in m
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


def test_chamfer_identity_zero():
    pts = jax.random.uniform(jax.random.PRNGKey(0), (2, 100, 3))
    cd = chamfer_distance(pts, pts)
    np.testing.assert_allclose(cd["chamfer"], 0.0, atol=1e-5)


def test_chamfer_known_offset():
    a = jnp.zeros((1, 10, 3))
    b = jnp.full((1, 10, 3), 0.1)  # dist^2 = 3 * 0.01 = 0.03
    d = directed_distance(a, b)
    np.testing.assert_allclose(d, 0.03, rtol=1e-4)


def test_chamfer_chunking_consistent():
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 100, 3))
    d1 = directed_distance(a, b, chunk=16)
    d2 = directed_distance(a, b, chunk=100)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_pose_metrics():
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (10, 1))
    m = pose_error_metrics(q, q)
    np.testing.assert_allclose(m["acc_30deg"], 1.0)
    np.testing.assert_allclose(m["median_err_deg"], 0.0, atol=1e-3)


def test_canonical_alignment_refinement_recovers_offset():
    """Coarse grid + local refinement must recover a known canonical
    offset to well under 2 deg (the 2048-point grid alone has a
    10-15 deg quantization floor) — VERDICT round-1 weak item 1."""
    from dpcx.eval.pose_metrics import align_canonical_frame
    from dpcx.geometry.quaternion import (
        quaternion_angular_distance,
        quaternion_conjugate,
        quaternion_multiply,
        quaternion_normalize,
    )

    rng = np.random.default_rng(0)
    gt = quaternion_normalize(
        jnp.asarray(rng.normal(size=(48, 4)), jnp.float32)
    )
    off = quaternion_normalize(jnp.asarray([0.7, 0.5, -0.3, 0.4]))
    pred = quaternion_multiply(gt, quaternion_conjugate(off)[None])
    q_align, aligned = align_canonical_frame(pred, gt)
    res_deg = float(
        quaternion_angular_distance(q_align[None], off[None])[0]
    ) * 180.0 / np.pi
    assert res_deg < 2.0, res_deg
    med = float(pose_error_metrics(aligned, gt)["median_err_deg"])
    assert med < 2.0, med


def test_pose_metrics_up_to_flip():
    """The mirror-gauge diagnostic: with 30% of samples carrying the
    vertical-axis 180-deg flip (the dominant error mode on
    near-symmetric categories), plain acc@30 sees only the majority
    gauge while the flip-aware metric scores ~1.0 and reports the flip
    fraction."""
    from dpcx.eval.pose_metrics import (
        FLIP_QUAT,
        align_canonical_frame,
        pose_error_metrics_up_to_flip,
    )
    from dpcx.geometry.quaternion import (
        quaternion_conjugate,
        quaternion_multiply,
        quaternion_normalize,
    )

    rng = np.random.default_rng(3)
    gt = quaternion_normalize(
        jnp.asarray(rng.normal(size=(40, 4)), jnp.float32)
    )
    c = quaternion_normalize(jnp.asarray([0.8, 0.1, 0.5, -0.2]))
    flip_mask = jnp.asarray(
        (np.arange(40) % 10 < 3)[:, None]
    )  # 30% flipped
    gauged = jnp.where(
        flip_mask, quaternion_multiply(gt, FLIP_QUAT[None]), gt
    )
    pred = quaternion_multiply(gauged, quaternion_conjugate(c)[None])
    _, aligned = align_canonical_frame(pred, gt)
    pm = pose_error_metrics(aligned, gt)
    fm = pose_error_metrics_up_to_flip(aligned, gt)
    assert float(pm["acc_30deg"]) <= 0.75  # plain metric sees the flips
    assert float(fm["acc_30deg_up_to_flip"]) > 0.95
    np.testing.assert_allclose(float(fm["flip_rate"]), 0.3, atol=0.05)
    assert float(fm["median_err_deg_up_to_flip"]) < 3.0


def test_gauge_spread_detects_incoherent_gauge():
    """gauge_spread_deg ~ 0 when every view of a model shares one
    object-side gauge (pred = cam ∘ g_m), regardless of per-model gauges
    or a further global canonical offset; large for per-view gauges."""
    from dpcx.eval.pose_metrics import gauge_spread_deg
    from dpcx.geometry.quaternion import (
        quaternion_multiply,
        quaternion_normalize,
    )

    rng = np.random.default_rng(0)
    V, M = 4, 3
    cam = quaternion_normalize(
        jnp.asarray(rng.normal(size=(V, M, 4)), jnp.float32)
    )
    g = quaternion_normalize(
        jnp.asarray(rng.normal(size=(M, 4)), jnp.float32)
    )
    coherent = quaternion_multiply(cam, g[None])
    s = gauge_spread_deg(coherent, cam)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=0.1)
    # global canonical offset composes on the right too -> invariant
    q_off = quaternion_normalize(jnp.asarray([0.6, 0.3, -0.2, 0.7]))
    s_off = gauge_spread_deg(
        quaternion_multiply(coherent, q_off[None, None]), cam
    )
    np.testing.assert_allclose(np.asarray(s_off), 0.0, atol=0.1)
    # per-(view, model) random gauges -> large dispersion
    incoherent = quaternion_multiply(
        cam,
        quaternion_normalize(
            jnp.asarray(rng.normal(size=(V, M, 4)), jnp.float32)
        ),
    )
    assert float(gauge_spread_deg(incoherent, cam).min()) > 20.0


def test_voxel_iou():
    """3D IoU identities: same cloud -> 1; disjoint octants -> 0;
    half-overlapping -> strictly between."""
    from dpcx.eval.iou import voxel_iou

    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.uniform(-0.45, -0.05, size=(2, 600, 3)), jnp.float32
    )
    b = jnp.asarray(rng.uniform(0.05, 0.45, size=(2, 600, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(voxel_iou(a, a, 16)), 1.0)
    np.testing.assert_allclose(np.asarray(voxel_iou(a, b, 16)), 0.0)
    mix = jnp.concatenate([a[:, :300], b[:, :300]], axis=1)
    v = np.asarray(voxel_iou(a, mix, 16))
    assert np.all(v > 0.2) and np.all(v < 0.9), v


def test_evaluate_category_slices():
    """Per-category table for a jointly-trained 'multi' model: one row
    per category present plus a mean row, same metric keys as
    evaluate()."""
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.predict import evaluate_category_slices
    from dpcx.train import create_state

    cfg = Config(
        vox_size=12, mask_size=12, pc_num_points=64, image_size=32,
        encoder_filters=(8,), latent_dim=32, fc_hidden=32,
        pc_decoder_hidden=(32,), num_views=2, category="multi",
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=128), cfg)
    st = create_state(cfg, jax.random.PRNGKey(0))
    table = evaluate_category_slices(cfg, st.params, ds, batch_size=2)
    assert set(table) == {"chair", "car", "airplane", "mean"}
    for row in table.values():
        assert np.isfinite(row["chamfer"]) and "iou_3d_16" in row


def test_evaluate_reports_flip_metrics():
    """evaluate() on a predicted-pose config must report the mirror-gauge
    diagnostics alongside the plain pose metrics, and the flip-aware
    accuracy can only improve on the plain one."""
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.predict import evaluate
    from dpcx.train import create_state

    cfg = Config(
        vox_size=12, mask_size=12, pc_num_points=64, image_size=32,
        encoder_filters=(8,), latent_dim=32, fc_hidden=32,
        pc_decoder_hidden=(32,), num_views=2,
        predict_pose=True, pose_predict_num_candidates=2,
    )
    ds = Dataset(make_dataset(cfg, 2, seed=0, gt_points=128), cfg)
    st = create_state(cfg, jax.random.PRNGKey(0))
    m = evaluate(cfg, st.params, ds, batch_size=2)
    for k in (
        "pose_acc_30deg",
        "pose_acc_30deg_up_to_flip",
        "pose_median_err_deg_up_to_flip",
        "pose_flip_rate",
        "iou_3d_16",
    ):
        assert k in m and np.isfinite(m[k]), k
    assert m["pose_acc_30deg_up_to_flip"] >= m["pose_acc_30deg"] - 1e-6
    # single-view eval has no cross-view residuals to compare
    assert "pose_gauge_spread_deg" not in m


def test_evaluate_per_sample_forensics():
    """evaluate(per_sample=True) attaches per-sample errors, residual
    axis/angle, chamfer, and view indices, all length-consistent with
    the pooled all-view eval, and the residual angle equals the
    angular error (r = conj(aligned)*gt by construction)."""
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.predict import evaluate
    from dpcx.train import create_state

    cfg = Config(
        vox_size=12, mask_size=12, pc_num_points=64, image_size=32,
        encoder_filters=(8,), latent_dim=32, fc_hidden=32,
        pc_decoder_hidden=(32,), num_views=2,
        predict_pose=True, pose_predict_num_candidates=2,
    )
    ds = Dataset(make_dataset(cfg, 2, seed=0, gt_points=128), cfg)
    st = create_state(cfg, jax.random.PRNGKey(0))
    m = evaluate(cfg, st.params, ds, view_idx=None, batch_size=2,
                 per_sample=True)
    ps = m["per_sample"]
    n = 2 * 2  # models x views, pooled view-major
    assert len(ps["err_deg"]) == n and len(ps["chamfer"]) == n
    # GT-free gauge-coherence detector: pooled eval carries the scalar
    # and the per-MODEL spread list (finding 21)
    assert np.isfinite(m["pose_gauge_spread_deg"])
    assert len(ps["gauge_spread_deg"]) == 2
    assert len(ps["res_axis"]) == n and len(ps["res_axis"][0]) == 3
    assert ps["view"] == [0, 0, 1, 1]
    np.testing.assert_allclose(
        ps["res_angle_deg"], ps["err_deg"], atol=0.05
    )
    axes = np.asarray(ps["res_axis"])
    np.testing.assert_allclose(
        np.linalg.norm(axes, axis=-1), 1.0, atol=1e-3
    )
    # plain eval (per_sample omitted) must not carry the block
    assert "per_sample" not in evaluate(
        cfg, st.params, ds, batch_size=2
    )


def test_pose_rgb_loss_runs_and_grads():
    """predicted-pose + pc_rgb: color is rendered for EVERY candidate,
    enters the hard-min selection, and contributes a finite loss and
    gradients to the rgb head."""
    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=2,
        pc_rgb=True,
        rgb_weight=1.0,
    )
    model = ModelPointCloud(cfg)
    batch = _fake_batch(cfg)
    B, V = batch["masks"].shape[:2]
    batch["images_tgt"] = jnp.broadcast_to(
        jax.random.uniform(
            jax.random.PRNGKey(7),
            (B, V, cfg.image_size, cfg.image_size, 3),
        ),
        (B, V, cfg.image_size, cfg.image_size, 3),
    )
    params = model.init(jax.random.PRNGKey(0), batch["image"])

    def loss_fn(p):
        preds = model.apply(p, batch["image"])
        loss, m = compute_loss(
            cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        return loss, m

    (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert jnp.isfinite(loss) and "loss_rgb" in m
    leaves = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)


def test_candidate_scores_normalization():
    """rgb_sel_normalize: the SELECTION weighs sil and rgb errors O(1)
    each regardless of raw scales; the raw-sum mode keeps old behavior."""
    from dpcx.models.losses import candidate_scores

    cfg = TINY.replace(predict_pose=True, pc_rgb=True)
    # sil errors are 100x larger than rgb errors; candidate 0 wins on sil
    # (barely), candidate 1 wins on rgb (decisively, in relative terms)
    l_k = jnp.asarray([[1.00, 1.05]])
    rgb_l_k = jnp.asarray([[0.02, 0.001]])
    raw = candidate_scores(
        cfg.replace(rgb_sel_normalize=False), l_k, rgb_l_k
    )
    norm = candidate_scores(
        cfg.replace(rgb_sel_normalize=True), l_k, rgb_l_k
    )
    assert int(jnp.argmin(raw, axis=1)[0]) == 0  # sil magnitude dominates
    assert int(jnp.argmin(norm, axis=1)[0]) == 1  # rgb signal counts
    # without rgb the score is just the weighted sil error
    np.testing.assert_allclose(
        candidate_scores(cfg, l_k, None), cfg.proj_weight * l_k
    )


def test_rgb_warmup_ramps_selection_and_loss():
    """cfg.rgb_warmup_steps linearly ramps the color term's loss weight
    and selection influence: at step 0 the argmin is silhouette-only; at
    step >= warmup it matches the unwarmed score."""
    import jax.numpy as jnp

    from dpcx.config import Config
    from dpcx.models.losses import candidate_scores, rgb_ramp

    cfg = Config(rgb_warmup_steps=100, rgb_sel_normalize=True)
    l_k = jnp.asarray([[0.2, 0.1]])
    rgb_k = jnp.asarray([[0.0, 1.0]])  # rgb prefers candidate 0
    r0 = rgb_ramp(cfg, jnp.asarray(0))
    r1 = rgb_ramp(cfg, jnp.asarray(100))
    assert float(r0) == 0.0 and float(r1) == 1.0
    s0 = candidate_scores(cfg, l_k, rgb_k, r0)
    s1 = candidate_scores(cfg, l_k, rgb_k, r1)
    # at ramp 0 selection follows silhouette (cand 1 wins); at full ramp
    # the rgb term flips it
    assert int(jnp.argmin(s0, axis=1)[0]) == 1
    assert int(jnp.argmin(s1, axis=1)[0]) == 0
    # default (no warmup) == ramp 1
    cfg0 = Config(rgb_sel_normalize=True)
    assert float(rgb_ramp(cfg0, jnp.asarray(0))) == 1.0


def test_anchor_azimuth_mode_frees_elevation():
    """pose_anchor_mode='azimuth' penalizes only the vertical-axis
    component of the correction: a pure elevation correction (x-axis
    rotation) is free, a pure azimuth correction (y-axis) is penalized."""
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=1,
                       pose_student=False, pose_anchor_weight=1.0,
                       pose_anchor_mode="azimuth")
    batch = _fake_batch(cfg, B=1)
    points = jnp.zeros((1, 16, 3))
    quats = jnp.asarray([[[1.0, 0, 0, 0]]])
    key = jax.random.PRNGKey(1)
    s = 1.0 / np.sqrt(2.0)
    elev = jnp.asarray([[[s, s, 0.0, 0.0]]])   # 90 deg about x
    azim = jnp.asarray([[[s, 0.0, s, 0.0]]])   # 90 deg about y

    def anchor(corr):
        _, m = compute_loss(
            cfg, {"points": points, "quats": quats,
                  "correction_quats": corr},
            batch, jnp.asarray(0), key,
        )
        return float(m["loss_anchor"])

    assert anchor(elev) == 0.0
    np.testing.assert_allclose(anchor(azim), 0.5, rtol=1e-5)
    np.testing.assert_allclose(anchor(-azim), 0.5, rtol=1e-5)


def test_softmin_annealing_warms_losers_and_converges_to_hardmin():
    """pose_softmin_temp > 0 (gauge-lottery mechanism d): while the
    temperature is warm every candidate receives projection gradient
    (losing candidates included); once the temperature has decayed
    (step >= pose_softmin_steps) the loss value equals the hard-min
    loss and the loser's gradient is gated to zero again."""
    base = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                        pose_student=False)
    soft = base.replace(pose_softmin_temp=1.0, pose_softmin_steps=100)
    B, N = 1, 16
    points = jax.random.uniform(
        jax.random.PRNGKey(0), (B, N, 3), minval=-0.3, maxval=0.3
    )
    batch = _fake_batch(base, B=B)
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])

    def loss_fn(cfg, step):
        def f(q):
            loss, m = compute_loss(
                cfg, {"points": points, "quats": q}, batch,
                jnp.asarray(step), jax.random.PRNGKey(1),
            )
            return loss, m
        return f

    # warm phase: both candidates get gradient, entropy is reported
    (l_soft, m), g = jax.value_and_grad(
        loss_fn(soft, 0), has_aux=True
    )(quats)
    assert float(jnp.abs(g[0, 0]).max()) > 0.0
    assert float(jnp.abs(g[0, 1]).max()) > 0.0
    assert 0.0 < float(m["sel_entropy"]) <= np.log(2.0) + 1e-6

    # decayed phase: loss matches the hard-min loss, loser grad gated off
    (_, m_cold), g_cold = jax.value_and_grad(
        loss_fn(soft, 100), has_aux=True
    )(quats)
    (_, m_hard), g_hard = jax.value_and_grad(
        loss_fn(base, 100), has_aux=True
    )(quats)
    np.testing.assert_allclose(
        float(m_cold["loss_proj"]), float(m_hard["loss_proj"]), rtol=1e-6
    )
    winner = 0 if float(jnp.abs(g_hard[0, 0]).max()) > 0 else 1
    loser = 1 - winner
    assert float(jnp.abs(g_hard[0, loser]).max()) == 0.0
    assert float(jnp.abs(g_cold[0, loser]).max()) < 1e-12
    assert float(jnp.abs(g_cold[0, winner]).max()) > 0.0


def test_resolve_pose_flips_detects_mirror_gauge():
    """Test-time mirror disambiguation (round 4): given an ASYMMETRIC
    cloud, per-sample mirror-flipped pose predictions are detected and
    corrected against each sample's own input-view mask — no GT poses
    consumed. Unflipped samples are left alone."""
    from dpcx.eval.pose_metrics import FLIP_QUAT
    from dpcx.geometry.quaternion import (
        quaternion_angular_distance,
        quaternion_multiply,
        quaternion_normalize,
    )
    from dpcx.predict import resolve_pose_flips
    from dpcx.render.project import pointcloud_project_fn, sigma_schedule

    cfg = TINY
    M, N = 6, 64
    key = jax.random.PRNGKey(3)
    base = jax.random.uniform(key, (N, 3), minval=-0.3, maxval=0.3)
    # one-sided feature so the mirror hypothesis renders differently
    feat = jnp.asarray([0.35, 0.0, 0.0]) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), (N // 4, 3)
    )
    pts = jnp.concatenate([base[: N - N // 4], feat])[None]
    pts = jnp.tile(pts, (M, 1, 1))
    quats = quaternion_normalize(
        jax.random.normal(jax.random.PRNGKey(5), (M, 4))
    )
    sig = sigma_schedule(cfg, jnp.asarray(10**9))
    masks = pointcloud_project_fn(cfg, pts, quats, sig).silhouette

    flip_mask = np.array([True, False, True, False, True, False])
    flipped = quaternion_multiply(quats, FLIP_QUAT[None])
    pred_q = jnp.where(flip_mask[:, None], flipped, quats)

    resolved, changed = resolve_pose_flips(
        cfg, np.asarray(pts), np.asarray(pred_q), np.asarray(masks),
        batch_size=4,
    )
    err = quaternion_angular_distance(
        jnp.asarray(resolved), quats
    ) * 180 / np.pi
    assert float(err.max()) < 1.0, np.asarray(err)
    np.testing.assert_allclose(changed, flip_mask.mean())


def test_cross_view_consistency_penalizes_mirrored_decodes():
    """Mechanism (e): identical canonical clouds from two views cost ~0;
    a mirrored second decode is penalized."""
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                       pose_student=False, pose_consistency_weight=1.0)
    batch = _fake_batch(cfg, B=1)
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (1, 32, 3), minval=-0.3, maxval=0.3
    )
    quats = jnp.asarray([[[1.0, 0, 0, 0], [0.0, 1.0, 0, 0]]])

    def metrics_for(p2):
        _, m = compute_loss(
            cfg,
            {"points": pts, "quats": quats, "points_view2": p2},
            batch, jnp.asarray(0), jax.random.PRNGKey(1),
        )
        return m

    m_same = metrics_for(pts)
    m_mirror = metrics_for(pts * jnp.asarray([-1.0, 1.0, 1.0]))
    assert float(m_same["loss_consistency"]) < 1e-9
    assert float(m_mirror["loss_consistency"]) > 1e-3
    # without the second decode the term is absent
    _, m_off = compute_loss(
        cfg, {"points": pts, "quats": quats}, batch,
        jnp.asarray(0), jax.random.PRNGKey(1),
    )
    assert "loss_consistency" not in m_off


def test_pose_only_matches_full_forward():
    """model_pc.pose_only (mechanism f) shares the encoder + pose head
    with the full forward: identical images give identical candidate /
    student quaternions, without decoding a shape."""
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=3)
    model = ModelPointCloud(cfg)
    img = jax.random.uniform(
        jax.random.PRNGKey(2), (2, cfg.image_size, cfg.image_size, 3)
    )
    params = model.init(jax.random.PRNGKey(0), img)
    full = model.apply(params, img)
    pose = model.apply(params, img, method="pose_only")
    np.testing.assert_allclose(
        np.asarray(pose["quats"]), np.asarray(full["quats"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pose["student_quat"]),
        np.asarray(full["student_quat"]),
        rtol=1e-6,
    )
    assert "points" not in pose


def test_pose_from_views_per_view_selection():
    """Mechanism (f): with pose_from_views, candidate quats come per
    TARGET view ([B, V, K, 4] in preds["quats_views"]), q_k(v) is used
    directly as object->camera_v (no GT rig composition), the hard-min
    winner is selected per (sample, view), and only each view's winner
    receives projection gradient. The per-view student distills each
    view's winner."""
    from dpcx.render.project import pointcloud_project_fn, sigma_schedule

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=2,
        pose_student=True,
        pose_from_views=True,
    )
    B, N = 1, 48
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (B, N, 3), minval=-0.3, maxval=0.3
    )
    q_a = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q_b = jnp.asarray([0.70710678, 0.0, 0.70710678, 0.0])  # 90deg azim
    q_junk = jnp.asarray([0.0, 1.0, 0.0, 0.0])  # upside-down
    sig = sigma_schedule(cfg, jnp.asarray(10**9))
    masks = pointcloud_project_fn(
        cfg, jnp.tile(pts, (2, 1, 1)), jnp.stack([q_a, q_b]), sig
    ).silhouette[None]  # [1, 2, D, D]: view0 <- q_a, view1 <- q_b
    batch = dict(_fake_batch(cfg, B=B))
    batch["masks"] = masks
    # view 0: candidate 0 correct; view 1: candidate 1 correct
    quats_views = jnp.asarray(
        [[[q_a, q_junk], [q_junk, q_b]]]
    )  # [1, V=2, K=2, 4]
    student_right = jnp.asarray([[q_a, q_b]])  # [1, V, 4]

    def loss_fn(qv, sv):
        loss, m = compute_loss(
            cfg,
            {
                "points": pts,
                "quats_views": qv,
                "student_quat_views": sv,
            },
            batch,
            jnp.asarray(10**9),  # sigma matches the rendered masks
            jax.random.PRNGKey(1),
        )
        return loss, m

    (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
        quats_views, student_right
    )
    # winners reproject their own view exactly -> tiny proj loss
    assert float(m["loss_proj"]) < 1e-6
    # per-view gradient gating: winner (v, k) pairs get gradient,
    # losers none
    g = np.asarray(g)
    assert np.abs(g[0, 0, 0]).max() > 0.0  # view 0 winner k=0
    assert np.abs(g[0, 1, 1]).max() > 0.0  # view 1 winner k=1
    assert np.abs(g[0, 0, 1]).max() == 0.0  # view 0 loser
    assert np.abs(g[0, 1, 0]).max() == 0.0  # view 1 loser
    # per-view student: matching each view's winner -> ~0 loss; swapping
    # the student views -> large loss (q_a vs q_b are 90 deg apart)
    np.testing.assert_allclose(float(m["loss_student"]), 0.0, atol=1e-6)
    _, m_sw = loss_fn(quats_views, jnp.asarray([[q_b, q_a]]))
    assert float(m_sw["loss_student"]) > 0.4
    # live gauge telemetry (finding 21): winners equal to the rig ->
    # coherent (spread ~0); a rig disagreeing with one view by 90 deg
    # -> residuals {identity, 90 deg} -> ~45 deg mean dispersion
    batch["quats"] = jnp.asarray([[q_a, q_b]])
    _, m_coh = loss_fn(quats_views, student_right)
    assert float(m_coh["gauge_spread_deg"]) < 0.1
    batch["quats"] = jnp.asarray([[q_a, q_a]])
    _, m_inc = loss_fn(quats_views, student_right)
    assert 30.0 < float(m_inc["gauge_spread_deg"]) < 60.0


def test_pose_from_views_with_translation():
    """pose_from_views x predict_translation (round 5, VERDICT r4
    missing 4): each target view's camera-frame offset comes from that
    view's own pose head. Per-(view, candidate) translations are
    consumed (different offsets change per-candidate losses), gradients
    flow to them, and the legacy input-view 'translation' alone (no
    per-view field) raises instead of being silently broadcast."""
    import pytest

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=2,
        pose_student=False,
        pose_from_views=True,
        predict_translation=True,
        translation_weight=0.01,
    )
    batch = _fake_batch(cfg, B=1)
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (1, 8, 3), minval=-0.3, maxval=0.3
    )
    quats_views = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, 2, 2, 1))

    def loss_of(tv):
        preds = {
            "points": pts,
            "quats_views": quats_views,
            "translation": jnp.zeros((1, 2, 3)),
            "translations_views": tv,
        }
        total, m = compute_loss(
            cfg, preds, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        return total, m

    tv0 = jnp.zeros((1, 2, 2, 3))
    tv1 = tv0.at[:, :, 1, 0].set(0.3)  # candidate 1 shifted in x
    t0, m0 = loss_of(tv0)
    t1, m1 = loss_of(tv1)
    # the shifted candidate renders a different silhouette somewhere
    assert not np.allclose(
        np.asarray(m0["loss_proj"]), np.asarray(m1["loss_proj"])
    ) or float(t0) != float(t1)
    # gradients flow into the per-view translations
    g = jax.grad(lambda tv: loss_of(tv)[0])(tv1)
    assert np.abs(np.asarray(g)).max() > 0.0
    # missing per-view field -> explicit error, not a silent broadcast
    preds_bad = {
        "points": pts,
        "quats_views": quats_views,
        "translation": jnp.zeros((1, 2, 3)),
    }
    with pytest.raises(ValueError, match="translations_views"):
        compute_loss(
            cfg, preds_bad, batch, jnp.asarray(0), jax.random.PRNGKey(1)
        )


def test_pose_from_views_translation_e2e():
    """apply_model wires pose_only's per-view translations through, and
    a short train run with pfv x predict_translation stays finite."""
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.train import train

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=2,
        pose_from_views=True,
        predict_translation=True,
        translation_weight=0.01,
        batch_size=4,
        device_data=True,
        log_every=2,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=64), cfg)
    _, hist = train(cfg, dataset=ds, max_steps=4, use_checkpoints=False)
    assert hist and np.isfinite(hist[-1]["loss_total"])
