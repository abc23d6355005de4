"""Prediction + evaluation entries.

Reference parity: dpc/run/predict_eval.py (SURVEY.md §2.2 #17, §3.2):
restore the latest checkpoint, run the encoder/decoder forward per test
image, dump clouds + predicted poses to disk (npz here, .mat in the
reference), then compute Chamfer / pose metrics against densified GT clouds.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.eval.chamfer import chamfer_distance
from dpcx.eval.pose_metrics import align_canonical_frame, pose_error_metrics
from dpcx.models.model_pc import ModelPointCloud


@partial(jax.jit, static_argnames=("cfg",))
def predict_batch(
    cfg: Config, params, images: jax.Array
) -> dict[str, jax.Array]:
    """images [B, H, W, 3] -> predictions (points, scale, pose)."""
    model = ModelPointCloud(cfg)
    preds = model.apply(params, images)
    if cfg.predict_pose and "student_quat" in preds:
        preds["pose"] = preds["student_quat"]
    return preds


def predict_dataset(
    cfg: Config,
    params,
    dataset: Dataset,
    view_idx: int = 0,
    batch_size: int = 16,
    out_path: str | Path | None = None,
) -> dict[str, np.ndarray]:
    """Forward the whole test set; optionally dump predictions to npz."""
    M = dataset.num_models
    all_points, all_poses, all_scales, all_rgb = [], [], [], []
    for start in range(0, M, batch_size):
        idx = np.arange(start, min(start + batch_size, M))
        # pad the tail so jit sees a fixed batch shape
        pad = batch_size - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        eb = dataset.eval_batch(idx_p, view_idx)
        preds = predict_batch(
            cfg, params, jnp.asarray(eb["image"], jnp.float32)
        )
        all_points.append(np.asarray(preds["points"])[: len(idx)])
        if "pose" in preds:
            all_poses.append(np.asarray(preds["pose"])[: len(idx)])
        if "scale" in preds:
            all_scales.append(np.asarray(preds["scale"])[: len(idx)])
        if "rgb" in preds:
            all_rgb.append(np.asarray(preds["rgb"])[: len(idx)])
    out = {"points": np.concatenate(all_points)}
    if all_poses:
        out["pose"] = np.concatenate(all_poses)
    if all_scales:
        out["scale"] = np.concatenate(all_scales)
    if all_rgb:
        out["rgb"] = np.concatenate(all_rgb)
    if out_path is not None:
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        if out_path.suffix == ".mat":
            # the reference's predict_eval dumps .mat per model
            # (dpc/run/predict_eval.py); one bundled .mat here so
            # downstream MATLAB/scipy eval scripts keep working
            from scipy.io import savemat

            savemat(str(out_path), out)
        elif out_path.suffix == ".ply":
            # one ASCII PLY per model (out_0000.ply, ...) for standard
            # point-cloud viewers (MeshLab/CloudCompare interop)
            rgbs = out.get("rgb")
            for i, pts in enumerate(out["points"]):
                save_ply(
                    out_path.with_name(
                        f"{out_path.stem}_{i:04d}.ply"
                    ),
                    pts,
                    None if rgbs is None else rgbs[i],
                )
        else:
            np.savez_compressed(out_path, **out)
    return out


def save_ply(
    path: str | Path, points: np.ndarray, rgb: np.ndarray | None = None
) -> None:
    """Write one cloud as ASCII PLY ([N, 3] points, optional [N, 3]
    colors in [0, 1])."""
    pts = np.asarray(points, np.float32)
    lines = [
        "ply", "format ascii 1.0", f"element vertex {len(pts)}",
        "property float x", "property float y", "property float z",
    ]
    if rgb is not None:
        lines += [
            "property uchar red", "property uchar green",
            "property uchar blue",
        ]
        cols = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
        body = [
            f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}"
            for p, c in zip(pts, cols)
        ]
    else:
        body = [f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}" for p in pts]
    Path(path).write_text("\n".join(lines + ["end_header"] + body) + "\n")


def evaluate_categories(
    cfg: Config,
    params_by_category: dict[str, object],
    datasets: dict[str, Dataset],
    batch_size: int = 16,
) -> dict[str, dict[str, float]]:
    """Per-category eval table + mean row (ref: the reference aggregates
    Chamfer per ShapeNet category and reports per-category means,
    SURVEY.md §2.2 #18)."""
    table: dict[str, dict[str, float]] = {}
    for cat, ds in datasets.items():
        params = params_by_category[cat]
        table[cat] = evaluate(cfg, params, ds, batch_size=batch_size)
    keys = next(iter(table.values())).keys()
    table["mean"] = {
        k: float(np.mean([v[k] for v in table.values() if k in v]))
        for k in keys
    }
    return table


def evaluate_category_slices(
    cfg: Config,
    params,
    dataset: Dataset,
    batch_size: int = 16,
    view_idx: int | None = 0,
    flip_resolve: bool = False,
) -> dict[str, dict[str, float]]:
    """Per-category breakdown of ONE jointly-trained model on a "multi"
    dataset (BASELINE config 4): slice the records by ``category_idx``,
    evaluate each slice with the same params, and append a mean row —
    the reference's per-ShapeNet-category table for the joint model
    (SURVEY.md §2.2 #18)."""
    from dpcx.data.synthetic import CATEGORIES

    if "category_idx" not in dataset.records:
        raise ValueError(
            "per-category eval needs a dataset with category_idx "
            "(synthetic category='multi'); converted/external datasets "
            "don't carry category labels — evaluate them whole"
        )
    idx = np.asarray(dataset.records["category_idx"])
    if int(idx.max(initial=0)) >= len(CATEGORIES):
        raise ValueError(
            f"category_idx values exceed the known categories "
            f"{CATEGORIES}; cannot label the table rows"
        )
    table: dict[str, dict[str, float]] = {}
    for ci in sorted(set(idx.tolist())):
        sel = np.nonzero(idx == ci)[0]
        sub = Dataset(
            jax.tree.map(lambda x: x[sel], dataset.records), cfg
        )
        table[CATEGORIES[ci]] = evaluate(
            cfg, params, sub,
            batch_size=min(batch_size, len(sel)), view_idx=view_idx,
            flip_resolve=flip_resolve,
        )
    keys = next(iter(table.values())).keys()
    table["mean"] = {
        k: float(np.mean([v[k] for v in table.values() if k in v]))
        for k in keys
    }
    return table


def resolve_pose_flips(
    cfg: Config,
    points: np.ndarray,
    quats: np.ndarray,
    masks: np.ndarray,
    batch_size: int = 16,
) -> tuple[np.ndarray, float]:
    """Unsupervised test-time mirror disambiguation (round 4).

    For each sample, render the PREDICTED cloud under the predicted pose
    q and under q∘FLIP (the 180° vertical-axis object flip — the mirror
    gauge that dominates unsupervised-pose errors, POSE_RESULTS findings
    9/12), compare both silhouettes to the sample's OWN input-view mask,
    and keep the lower-error hypothesis. Uses only input-modality data
    (the mask the training loss also consumes), never GT poses.

    This can only separate the hypotheses when the decoder's canonical
    frame generalizes consistently on held-out inputs while the pose
    head's per-input mirror gauge does not: during training the decoder
    co-flips the shape with the pose (finding 2's memorization), making
    the pair degenerate ON TRAINING DATA — on held-out data the two
    heads' generalizations can decouple, which is what this probe
    measures. Returns (resolved quats [M, 4], changed fraction).
    """
    from dpcx.eval.pose_metrics import FLIP_QUAT
    from dpcx.geometry.quaternion import quaternion_multiply
    from dpcx.render.project import pointcloud_project_fn, sigma_schedule

    M = quats.shape[0]
    D = cfg.vox_size
    sig = sigma_schedule(cfg, jnp.asarray(10**9))
    # the hypothesis renders are tiny (2 sils per sample, once) — the XLA
    # path avoids compiling a fresh pallas shape just for the resolver
    rcfg = cfg.replace(renderer="xla")
    splat = "matmul" if jax.default_backend() == "tpu" else "scatter"

    @jax.jit
    def errs(pts, q, m):
        qf = quaternion_multiply(q, FLIP_QUAT[None].astype(q.dtype))
        out = pointcloud_project_fn(
            rcfg,
            jnp.concatenate([pts, pts], axis=0),
            jnp.concatenate([q, qf], axis=0),
            sig,
            splat=splat,
        )
        md = jax.image.resize(m, (m.shape[0], D, D), method="bilinear")
        md = jnp.concatenate([md, md], axis=0)
        e = jnp.mean((out.silhouette - md) ** 2, axis=(1, 2))
        b = q.shape[0]
        return e[:b], e[b:]

    flip = np.zeros(M, bool)
    for start in range(0, M, batch_size):
        idx = np.arange(start, min(start + batch_size, M))
        pad = batch_size - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        e0, e1 = errs(
            jnp.asarray(points[idx_p], jnp.float32),
            jnp.asarray(quats[idx_p], jnp.float32),
            jnp.asarray(masks[idx_p], jnp.float32),
        )
        flip[idx] = np.asarray(e1 < e0)[: len(idx)]
    resolved = np.where(
        flip[:, None],
        np.asarray(
            quaternion_multiply(jnp.asarray(quats), FLIP_QUAT[None])
        ),
        quats,
    )
    return resolved, float(flip.mean())


def evaluate(
    cfg: Config,
    params,
    dataset: Dataset,
    view_idx: int | None = 0,
    batch_size: int = 16,
    flip_resolve: bool = False,
    per_sample: bool = False,
) -> dict[str, float]:
    """Chamfer (+ pose) eval over a dataset (ref: predict_eval protocol).

    ``view_idx=None`` sweeps EVERY view per model and pools the
    predictions before computing metrics — the reference's
    predict_eval.py evaluates each test view, not just the first
    (SURVEY.md §3.2); a single-view eval is a weaker statistic.

    ``per_sample=True`` attaches a ``"per_sample"`` dict of plain lists
    (failure-mode forensics, POSE_RESULTS finding 20): post-alignment
    angular error per sample, the object-side residual rotation
    axis/angle (r = conj(aligned) * gt, the r with aligned∘r = gt under
    the same right-composition convention as the flip diagnostics — a
    mirror-gauge sample shows r ≈ 180° about the vertical axis, an
    azimuth-sector lock shows a vertical axis at other angles, an
    elevation/tumble lock a non-vertical axis), per-sample Chamfer, and
    the source view index. Sample i of view v sits at index v*M + i
    when ``view_idx is None``. Pooled multi-view evals also report
    ``pose_gauge_spread_deg`` (and a per-MODEL ``gauge_spread_deg``
    list of length M, unlike the per-sample lists) — the GT-free
    gauge-coherence detector of POSE_RESULTS finding 21; see
    ``dpcx.eval.pose_metrics.gauge_spread_deg``.
    """
    if view_idx is None:
        all_pred, all_gtq, all_gt = [], [], []
        for v in range(dataset.num_views):
            p = predict_dataset(cfg, params, dataset, v, batch_size)
            all_pred.append(p)
            all_gtq.append(dataset.records["quats"][:, v])
            all_gt.append(dataset.records["gt_points"])
        preds = {
            k: np.concatenate([p[k] for p in all_pred])
            for k in all_pred[0]
        }
        gt = jnp.asarray(np.concatenate(all_gt), jnp.float32)
        gt_quats_all = jnp.asarray(np.concatenate(all_gtq), jnp.float32)
    else:
        preds = predict_dataset(cfg, params, dataset, view_idx, batch_size)
        gt = jnp.asarray(dataset.records["gt_points"], jnp.float32)
        gt_quats_all = jnp.asarray(
            dataset.records["quats"][:, view_idx], jnp.float32
        )
    pred_pts = jnp.asarray(preds["points"], jnp.float32)
    metrics: dict[str, float] = {}
    ps: dict[str, list] = {}
    if "pose" in preds:
        gt_quats = gt_quats_all
        pred_quats = jnp.asarray(preds["pose"], jnp.float32)
        # Unsupervised pose is defined up to a global canonical rotation
        # (SURVEY.md §3.2): estimate it from the pose pairs, then rotate
        # the predicted clouds (canonical frame) into the world frame
        # before Chamfer — p_world = R(conj(q_align)) p_canonical.
        q_align, aligned = align_canonical_frame(pred_quats, gt_quats)
        pm = pose_error_metrics(aligned, gt_quats)
        metrics["pose_acc_30deg"] = float(pm["acc_30deg"])
        metrics["pose_median_err_deg"] = float(pm["median_err_deg"])
        # mirror-gauge diagnostic (POSE_RESULTS findings 8-9): score each
        # sample up to the vertical-axis flip. One re-alignment round with
        # flip-corrected quats, since half-flipped samples bias the
        # global alignment itself.
        from dpcx.eval.pose_metrics import (
            FLIP_QUAT,
            pose_error_metrics_up_to_flip,
        )
        from dpcx.geometry.quaternion import quaternion_multiply

        e0 = pose_error_metrics(aligned, gt_quats)["angular_err_deg"]
        flipped = quaternion_multiply(aligned, FLIP_QUAT[None])
        e1 = pose_error_metrics(flipped, gt_quats)["angular_err_deg"]
        corrected = jnp.where((e1 < e0)[:, None], flipped, aligned)
        _, re_aligned = align_canonical_frame(corrected, gt_quats)
        fm = pose_error_metrics_up_to_flip(re_aligned, gt_quats)
        metrics["pose_acc_30deg_up_to_flip"] = float(
            fm["acc_30deg_up_to_flip"]
        )
        metrics["pose_median_err_deg_up_to_flip"] = float(
            fm["median_err_deg_up_to_flip"]
        )
        # flip_rate must be the PRE-correction fraction (how many samples
        # sit in the mirror gauge); fm["flip_rate"] is computed on the
        # already-corrected set and is ~0 by construction.
        metrics["pose_flip_rate"] = float(
            jnp.mean((e1 < e0).astype(jnp.float32))
        )
        if view_idx is None and dataset.num_views > 1:
            # GT-free gauge-coherence detector (POSE_RESULTS finding 21;
            # see gauge_spread_deg): per-model cross-view dispersion of
            # conj(q_cam) ∘ q̂ — constant iff one canonical frame is
            # held. Uses only the camera rig the training loss already
            # consumes. Healthy runs <~15 deg; the chair-s3 gauge
            # failure reads ~58 deg (finding 21's 1.01 rad).
            from dpcx.eval.pose_metrics import gauge_spread_deg

            V, M = dataset.num_views, dataset.num_models
            spread = gauge_spread_deg(
                pred_quats.reshape(V, M, 4), gt_quats.reshape(V, M, 4)
            )
            metrics["pose_gauge_spread_deg"] = float(jnp.mean(spread))
            if per_sample:
                ps["gauge_spread_deg"] = (
                    np.asarray(spread).round(2).tolist()
                )
        if per_sample:
            # object-side residual: the r with aligned ∘ r = gt (flips
            # compose on the right, so this is the frame the FLIP_QUAT
            # diagnostics live in). Axis from the vector part; angle
            # equals the angular error by construction.
            from dpcx.geometry.quaternion import quaternion_conjugate

            q_res = quaternion_multiply(
                quaternion_conjugate(aligned), gt_quats
            )
            # hemisphere-fix so axes are comparable across samples
            q_res = jnp.where(q_res[:, :1] < 0, -q_res, q_res)
            vec = q_res[:, 1:]
            norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
            axis = vec / jnp.maximum(norm, 1e-12)
            ps["err_deg"] = np.asarray(e0).round(2).tolist()
            ps["err_deg_flip"] = (
                np.minimum(np.asarray(e0), np.asarray(e1))
                .round(2)
                .tolist()
            )
            ps["res_axis"] = np.asarray(axis).round(4).tolist()
            ps["res_angle_deg"] = (
                np.degrees(
                    2.0
                    * np.arctan2(
                        np.asarray(norm[:, 0]),
                        np.asarray(q_res[:, 0]),
                    )
                )
                .round(2)
                .tolist()
            )
        if flip_resolve:
            # unsupervised test-time mirror disambiguation against each
            # sample's OWN input-view mask (see resolve_pose_flips)
            if view_idx is None:
                masks_in = np.concatenate(
                    [
                        np.asarray(dataset.records["masks"][:, v])
                        for v in range(dataset.num_views)
                    ]
                )
            else:
                masks_in = np.asarray(
                    dataset.records["masks"][:, view_idx]
                )
            rq, changed = resolve_pose_flips(
                cfg,
                np.asarray(preds["points"]),
                np.asarray(preds["pose"]),
                masks_in,
                batch_size,
            )
            _, aligned_r = align_canonical_frame(
                jnp.asarray(rq, jnp.float32), gt_quats
            )
            pr = pose_error_metrics(aligned_r, gt_quats)
            metrics["pose_acc_30deg_flip_resolved"] = float(
                pr["acc_30deg"]
            )
            metrics["pose_median_err_deg_flip_resolved"] = float(
                pr["median_err_deg"]
            )
            metrics["flip_resolve_changed"] = changed
        from dpcx.geometry.quaternion import (
            quaternion_conjugate,
            quaternion_rotate,
        )

        pred_pts = quaternion_rotate(
            pred_pts, quaternion_conjugate(q_align)[None]
        )
    cd = chamfer_distance(pred_pts, gt)
    metrics.update(
        {
            "chamfer": float(jnp.mean(cd["chamfer"])),
            "chamfer_pred_to_gt": float(jnp.mean(cd["pred_to_gt"])),
            "chamfer_gt_to_pred": float(jnp.mean(cd["gt_to_pred"])),
        }
    )
    # volumetric overlap (DRC-family voxel metric) at D=16 — the highest
    # resolution the production point budgets keep sampling-floor-free
    # (see dpcx/eval/iou.py docstring for the calibration)
    from dpcx.eval.iou import voxel_iou

    metrics["iou_3d_16"] = float(jnp.mean(voxel_iou(pred_pts, gt, 16)))
    if per_sample:
        ps["chamfer"] = (
            np.asarray(cd["chamfer"]).astype(float).round(6).tolist()
        )
        if "view" not in ps:
            ps["view"] = (
                [
                    v
                    for v in range(dataset.num_views)
                    for _ in range(dataset.num_models)
                ]
                if view_idx is None
                else [view_idx] * int(pred_pts.shape[0])
            )
        metrics["per_sample"] = ps  # type: ignore[assignment]
    return metrics
