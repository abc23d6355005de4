"""Loss assembly: re-projection consistency + pose-ensemble machinery.

Reference parity (SURVEY.md §2.2 #14, §3.4):
- GT-pose configs: render the predicted cloud into every target view with the
  known camera, squared-L2 silhouette loss vs the GT mask
  (dpc/models/model_pc.py::get_loss / ::compute_projection).
- Predicted-pose configs: tile K candidate quaternions, render K projections
  per view, per-sample hard min over K (::proj_loss_pose_candidates) — only
  the winning candidate receives projection gradients — plus the student
  distillation loss toward the stop-gradient winner (::add_student_loss).
- Optional depth-projection term and scale regularizer.

Pose composition note: in predicted-pose mode the object-frame pose of the
INPUT view is unknown but the relative transforms between views are known
(camera rig), so the target-view camera is q_rel(v) * q_k with
q_rel(v) = q_gt(v) * conj(q_gt(input)) — this mirrors the reference's use of
GT relative view transforms with a predicted base pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.geometry.quaternion import (
    quaternion_conjugate,
    quaternion_multiply,
)
from dpcx.render.project import (
    keep_prob_schedule,
    pointcloud_project_fn,
    sigma_schedule,
)
from dpcx.render.voxelize import pc_point_dropout_weights


def _resolve_splat(cfg: Config) -> str:
    """cfg.xla_splat == 'auto' -> the MXU matmul form on TPU, the scatter
    oracle elsewhere (single source of the policy for every loss path)."""
    if cfg.xla_splat != "auto":
        return cfg.xla_splat
    return "matmul" if jax.default_backend() == "tpu" else "scatter"


def _render_silhouettes(
    cfg: Config,
    points: jax.Array,
    quats: jax.Array,
    sigma_rel: jax.Array,
    point_weights: jax.Array | None,
    translation: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array | None]:
    """points [M, N, 3], quats [M, 4] -> sil [M, D, D], depth or None."""
    splat = _resolve_splat(cfg)
    out = pointcloud_project_fn(
        cfg,
        points,
        quats,
        sigma_rel,
        point_weights=point_weights,
        translation=translation,
        splat=splat,
    )
    return out.silhouette, out.depth


def rgb_ramp(cfg: Config, step: jax.Array) -> jax.Array:
    """Linear warmup factor for the color loss (cfg.rgb_warmup_steps):
    lets geometry/silhouette lock in before the rgb term carries weight —
    collapse mitigation for small-batch K-candidate rgb runs."""
    if cfg.rgb_warmup_steps <= 0:
        return jnp.asarray(1.0)
    return jnp.clip(
        step.astype(jnp.float32) / cfg.rgb_warmup_steps, 0.0, 1.0
    )


def candidate_scores(
    cfg: Config,
    l_k: jax.Array,
    rgb_l_k: jax.Array | None,
    ramp: jax.Array | float = 1.0,
) -> jax.Array:
    """Per-candidate SELECTION score [B, K] for the hard-min argmin.

    With rgb and cfg.rgb_sel_normalize, each error is normalized by its
    stop-gradient batch mean so the argmin weighs silhouette and color
    O(1) each, independent of raw scales — the raw weighted sum let the
    larger term dominate and the winner flipped late in training
    (round-2 car rgb runs). Loss VALUES are unaffected; only the argmin
    input changes. ``ramp`` scales the rgb term's selection influence in
    step with the warmed-up loss weight.
    """
    if rgb_l_k is None:
        return cfg.proj_weight * l_k
    if cfg.rgb_sel_normalize:
        sg = jax.lax.stop_gradient
        return l_k / (sg(jnp.mean(l_k)) + 1e-8) + ramp * rgb_l_k / (
            sg(jnp.mean(rgb_l_k)) + 1e-8
        )
    return cfg.proj_weight * l_k + cfg.rgb_weight * ramp * rgb_l_k


def _masked_depth_loss(
    depth: jax.Array, gt_depth: jax.Array, gt_mask: jax.Array
) -> jax.Array:
    """L2 on depth inside the GT silhouette (per-sample mean)."""
    w = gt_mask
    se = w * (depth - gt_depth) ** 2
    return se.sum(axis=(-2, -1)) / jnp.maximum(w.sum(axis=(-2, -1)), 1.0)


def compute_loss(
    cfg: Config,
    preds: dict[str, jax.Array],
    batch: dict[str, jax.Array],
    step: jax.Array,
    key: jax.Array,
    train: bool = True,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Total training loss + metrics dict.

    batch: image [B,H,W,3], masks [B,V,D,D], depths [B,V,D,D],
    quats [B,V,4], quat_in [B,4] (input-view camera, predicted-pose mode).
    """
    points = preds["points"]  # [B, N, 3]
    B, N, _ = points.shape
    masks = batch["masks"]
    V = masks.shape[1]
    D = cfg.vox_size
    # External datasets (tfrecord converts) may store masks/depths at a
    # different resolution than the projection grid (ref stores multiple
    # mask sizes; dpc/run/train_eval.py picks the one matching vox_size).
    # We resize at loss time instead so any mask size trains at any D.
    if masks.shape[-1] != D:
        masks = jax.image.resize(masks, (B, V, D, D), method="bilinear")
    batch = dict(batch)
    batch["masks"] = masks
    if cfg.proj_depth and "depths" in batch and batch["depths"].shape[-1] != D:
        # nearest: bilinear would blend background depth into silhouette
        # boundary pixels and corrupt the masked depth loss
        batch["depths"] = jax.image.resize(
            batch["depths"], (B, V, D, D), method="nearest"
        )

    sigma_rel = sigma_schedule(cfg, step)
    point_weights = None
    if train and cfg.pc_point_dropout < 1.0:
        keep = keep_prob_schedule(cfg, step)
        point_weights = pc_point_dropout_weights(key, B, N, keep)

    metrics: dict[str, jax.Array] = {"sigma_rel": sigma_rel}
    total = jnp.asarray(0.0)

    if not cfg.predict_pose:
        # --- GT pose: render B*V views in one batched call ---
        pts = jnp.repeat(points, V, axis=0)  # [B*V, N, 3]
        pw = (
            None
            if point_weights is None
            else jnp.repeat(point_weights, V, axis=0)
        )
        quats = batch["quats"].reshape(B * V, 4)
        rgb = None
        if cfg.pc_rgb and "rgb" in preds:
            rgb = jnp.repeat(preds["rgb"], V, axis=0)
        if cfg.pc_gauss and "gauss_scales" in preds:
            # BASELINE config 5: anisotropic alpha-composited splats
            from dpcx.render.gsplat import gsplat_project

            opacity = jnp.repeat(preds["gauss_opacity"], V, axis=0)
            if pw is not None:
                opacity = opacity * pw  # point dropout folds into opacity
            out = gsplat_project(
                cfg,
                pts,
                quats,
                jnp.repeat(preds["gauss_scales"], V, axis=0),
                jnp.repeat(preds["gauss_rot"], V, axis=0),
                opacity=opacity,
                rgb=rgb,
            )
            sil, depth, rgb_proj = out.silhouette, out.depth, out.rgb
        elif cfg.shard_points and len(jax.devices()) > 1:
            # point-sharded render (SURVEY §2.3 scale lever): each device
            # splats its point shard, one psum over ICI merges the grids —
            # for clouds too large to splat on one device. Batch stays
            # replicated (train() keeps the outer mesh trivial).
            from dpcx.parallel.mesh import make_mesh
            from dpcx.render.sharded import (
                pointcloud_project_point_sharded,
            )

            devs = jax.devices()
            nd = len(devs)
            while N % nd:
                nd -= 1
            out = pointcloud_project_point_sharded(
                cfg,
                make_mesh(cfg, devices=devs[:nd]),
                pts,
                quats,
                sigma_rel,
                point_weights=pw,
                rgb=rgb,
            )
            sil, depth, rgb_proj = out.silhouette, out.depth, out.rgb
        elif rgb is None:
            sil, depth = _render_silhouettes(
                cfg, pts, quats, sigma_rel, pw
            )
            rgb_proj = None
        else:
            out = pointcloud_project_fn(
                cfg, pts, quats, sigma_rel, point_weights=pw, rgb=rgb
            )
            sil, depth, rgb_proj = out.silhouette, out.depth, out.rgb
        sil = sil.reshape(B, V, D, D)
        proj_loss = jnp.mean((sil - masks) ** 2)
        total = total + cfg.proj_weight * proj_loss
        metrics["loss_proj"] = proj_loss
        if rgb_proj is not None and "images_tgt" in batch:
            # color re-projection: compare inside the GT silhouette against
            # the target-view render, downsampled to the mask resolution.
            # Composite the background into the prediction first — target
            # images are bg-composited renders (datagen: rgb + (1-sil)*bg),
            # so raw expected color under-shoots wherever sil < 1 (edges,
            # thin parts) and the mismatch drags the shape
            tgt = jax.image.resize(
                batch["images_tgt"], (B, V, D, D, 3), method="bilinear"
            )
            rgb_proj = rgb_proj.reshape(B, V, D, D, 3)
            rgb_proj = rgb_proj + (
                1.0 - sil.reshape(B, V, D, D)[..., None]
            ) * cfg.rgb_background
            w = masks[..., None]
            rgb_loss = jnp.sum(w * (rgb_proj - tgt) ** 2) / jnp.maximum(
                jnp.sum(w) * 3.0, 1.0
            )
            total = total + cfg.rgb_weight * rgb_loss
            metrics["loss_rgb"] = rgb_loss
        if cfg.proj_depth and cfg.drc_weight > 0:
            depth = depth.reshape(B, V, D, D)
            d_loss = jnp.mean(
                _masked_depth_loss(depth, batch["depths"], masks)
            )
            total = total + cfg.drc_weight * d_loss
            metrics["loss_depth"] = d_loss
        # IoU diagnostic on the first target view
        pred_m = sil[:, 0] > 0.4
        gt_m = masks[:, 0] > 0.5
        inter = jnp.sum(pred_m & gt_m, axis=(-2, -1))
        union = jnp.maximum(jnp.sum(pred_m | gt_m, axis=(-2, -1)), 1)
        metrics["iou"] = jnp.mean(inter / union)
    else:
        # --- predicted pose: K candidates, hard-min selection ---
        K = cfg.pose_predict_num_candidates
        per_view_pose = cfg.pose_from_views and "quats_views" in preds
        if per_view_pose:
            # mechanism (f), the reference's unknown-pose protocol (dpc
            # paper: shape and pose predicted from DIFFERENT views): each
            # target view's candidates were predicted from that view's own
            # image (model_pc.pose_only), so q_k(v) IS object->camera_v —
            # no GT relative rig transform enters the loss. The shape's
            # mirror bit (input-view features) and each pose's mirror bit
            # (target-view features) now come from different images, so a
            # per-IMAGE gauge coin flip raises the loss on random view
            # pairings; only a per-OBJECT canonical frame survives.
            cand_v = preds["quats_views"]  # [B, V, K, 4]
            q_full = jnp.swapaxes(cand_v, 1, 2)  # [B, K, V, 4]
        else:
            cand = preds["quats"]  # [B, K, 4]
            q_in = batch["quat_in"]  # [B, 4]
            q_rel = quaternion_multiply(
                batch["quats"], quaternion_conjugate(q_in)[:, None, :]
            )  # [B, V, 4]
            # q_obj->cam_v for each (candidate, view): q_rel(v) * q_k
            q_full = quaternion_multiply(
                q_rel[:, None, :, :], cand[:, :, None, :]
            )  # [B, K, V, 4]
        pts = jnp.broadcast_to(
            points[:, None, None], (B, K, V, N, 3)
        ).reshape(B * K * V, N, 3)
        pw = (
            None
            if point_weights is None
            else jnp.broadcast_to(
                point_weights[:, None, None], (B, K, V, N)
            ).reshape(B * K * V, N)
        )
        trans = None
        if per_view_pose and "translation" in preds:
            # mechanism (f) with predict_translation (round 5, closing
            # VERDICT r4 missing 4): each target view's camera-frame
            # offset comes from that view's OWN pose head (pose_only
            # returns it alongside the quats), exactly like the
            # candidate quats — the input-view head's translation is
            # meaningless for a pose predicted from a different image.
            if "translations_views" not in preds:
                raise ValueError(
                    "pose_from_views with predict_translation needs "
                    "per-view translations (preds['translations_views'] "
                    "— apply_model builds them from pose_only)"
                )
            trans = jnp.swapaxes(
                preds["translations_views"], 1, 2  # [B,V,K,3]->[B,K,V,3]
            ).reshape(B * K * V, 3)
        elif "translation" in preds:
            # predicted camera-frame offset per candidate, shared across
            # target views (ref: predicted-translation mode of
            # pc_perspective_transform)
            trans = jnp.broadcast_to(
                preds["translation"][:, :, None, :], (B, K, V, 3)
            ).reshape(B * K * V, 3)
        use_rgb = (
            cfg.pc_rgb
            and "rgb" in preds
            and "images_tgt" in batch
            and cfg.rgb_weight > 0
        )
        use_gauss = cfg.pc_gauss and "gauss_scales" in preds

        def bc(x: jax.Array) -> jax.Array:
            """[B, ...] -> [B*K*V, ...] candidate/view broadcast."""
            return jnp.broadcast_to(
                x[:, None, None], (B, K, V) + x.shape[1:]
            ).reshape((B * K * V,) + x.shape[1:])

        if use_gauss:
            # BASELINE config 5 under predicted pose: every candidate view
            # is rendered with the anisotropic alpha-composited splats, so
            # the covariance/opacity heads shape the hard-min selection
            # (and the rgb-in-selection signal) exactly as the isotropic
            # path does (VERDICT r2 missing 1a)
            from dpcx.render.gsplat import gsplat_project

            opacity = bc(preds["gauss_opacity"])
            if pw is not None:
                opacity = opacity * pw  # point dropout folds into opacity
            out = gsplat_project(
                cfg,
                pts,
                q_full.reshape(B * K * V, 4),
                bc(preds["gauss_scales"]),
                bc(preds["gauss_rot"]),
                opacity=opacity,
                rgb=bc(preds["rgb"]) if use_rgb else None,
                translation=trans,
            )
            sil, depth = out.silhouette, out.depth
            rgb_proj = (
                out.rgb.reshape(B, K, V, D, D, 3) if use_rgb else None
            )
        elif use_rgb:
            # Color re-projection for EVERY candidate, in the same render
            # call as the silhouettes, and the rgb error participates in
            # the hard-min SELECTION. This is what resolves near-mirror-
            # symmetric categories (cars/airplanes): their silhouettes
            # admit flipped pose gauges, so a silhouette-only argmin is a
            # coin flip between modes and rgb-through-the-winner merely
            # adds noise; textures are not mirror-symmetric, so the
            # combined argmin consistently picks the right mode.
            rgb_k = jnp.broadcast_to(
                preds["rgb"][:, None, None], (B, K, V, N, 3)
            ).reshape(B * K * V, N, 3)
            out = pointcloud_project_fn(
                cfg,
                pts,
                q_full.reshape(B * K * V, 4),
                sigma_rel,
                point_weights=pw,
                rgb=rgb_k,
                translation=trans,
                splat=_resolve_splat(cfg),
            )
            sil, depth = out.silhouette, out.depth
            rgb_proj = out.rgb.reshape(B, K, V, D, D, 3)
        else:
            sil, depth = _render_silhouettes(
                cfg, pts, q_full.reshape(B * K * V, 4), sigma_rel, pw,
                translation=trans,
            )
            rgb_proj = None
        sil = sil.reshape(B, K, V, D, D)
        # per-sample per-candidate loss, averaged over pixels (+views in
        # input-view-pose mode; per-view selection keeps the view axis:
        # each view's pose ensemble picks its own winner)
        l_kv = jnp.mean((sil - masks[:, None]) ** 2, axis=(3, 4))  # [B,K,V]
        l_k = l_kv if per_view_pose else jnp.mean(l_kv, axis=2)
        rgb_l_k = None
        if use_rgb:
            tgt = jax.image.resize(
                batch["images_tgt"], (B, V, D, D, 3), method="bilinear"
            )
            # background-composite to match the targets (see GT branch)
            rgb_cmp = rgb_proj + (
                1.0 - sil[..., None]
            ) * cfg.rgb_background
            w = masks[:, None, :, :, :, None]  # [B, 1, V, D, D, 1]
            if per_view_pose:
                denom = jnp.maximum(
                    jnp.sum(w, axis=(3, 4, 5)) * 3.0, 1.0
                )  # [B, 1, V]
                rgb_l_k = (
                    jnp.sum(
                        w * (rgb_cmp - tgt[:, None]) ** 2, axis=(3, 4, 5)
                    )
                    / denom
                )  # [B, K, V]
            else:
                denom = jnp.maximum(
                    jnp.sum(w, axis=(2, 3, 4, 5)) * 3.0, 1.0
                )  # [B, 1]
                rgb_l_k = (
                    jnp.sum(
                        w * (rgb_cmp - tgt[:, None]) ** 2,
                        axis=(2, 3, 4, 5),
                    )
                    / denom
                )  # [B, K]
        ramp = rgb_ramp(cfg, step)
        comb_k = candidate_scores(cfg, l_k, rgb_l_k, ramp)
        k_star = jnp.argmin(comb_k, axis=1)  # [B]
        if cfg.pose_softmin_temp > 0 and cfg.pose_softmin_steps > 0:
            # mechanism (d): soft-min -> hard-min annealing (see
            # config.pose_softmin_temp). Weights are a softmax over the
            # (stop-gradient) selection scores at a relative temperature
            # decaying to ~0, where they become numerically one-hot ==
            # the hard-min; losing candidates keep receiving projection
            # gradient while the temperature is warm, so early gauge
            # coin flips stay reversible.
            frac = jnp.clip(
                1.0
                - step.astype(jnp.float32) / cfg.pose_softmin_steps,
                0.0,
                1.0,
            )
            scores = jax.lax.stop_gradient(comb_k)
            t_eff = (
                cfg.pose_softmin_temp * frac * jnp.mean(scores) + 1e-8
            )
            sel_w = jax.nn.softmax(-scores / t_eff, axis=1)  # [B, K]
            proj_loss = jnp.mean(jnp.sum(sel_w * l_k, axis=1))
            metrics["sel_entropy"] = jnp.mean(
                -jnp.sum(sel_w * jnp.log(sel_w + 1e-12), axis=1)
            )
        else:
            sel_w = None
            proj_loss = jnp.mean(
                jnp.take_along_axis(l_k, k_star[:, None], axis=1)
            )
        total = total + cfg.proj_weight * proj_loss
        metrics["loss_proj"] = proj_loss
        metrics["cand_spread"] = jnp.mean(
            comb_k.max(axis=1) - comb_k.min(axis=1)
        )
        if per_view_pose:
            # Live gauge-coherence telemetry (POSE_RESULTS finding 21;
            # metric only — never enters the loss or gradients). In pfv
            # mode each target view's WINNER quat is object->cam_v from
            # that view's own image, so the cross-view dispersion of
            # conj(q_cam) o q_winner per sample is the same GT-free
            # frame-lock detector evaluate() reports; watching it during
            # training catches a gauge failure (chair s3: ~58 deg vs
            # healthy <~15) tens of thousands of steps before eval. In
            # input-view-pose mode it is 0 by construction (all views
            # share the input view's frame), hence pfv-only.
            from dpcx.eval.pose_metrics import gauge_spread_deg

            q_sel = jnp.squeeze(
                jnp.take_along_axis(
                    q_full, k_star[:, None, :, None], axis=1
                ),
                1,
            )  # [B, V, 4]
            metrics["gauge_spread_deg"] = jnp.mean(
                gauge_spread_deg(
                    jnp.swapaxes(jax.lax.stop_gradient(q_sel), 0, 1),
                    jnp.swapaxes(batch["quats"], 0, 1),
                )
            )
        if use_rgb:
            if sel_w is not None:
                rgb_loss = jnp.mean(jnp.sum(sel_w * rgb_l_k, axis=1))
            else:
                rgb_loss = jnp.mean(
                    jnp.take_along_axis(rgb_l_k, k_star[:, None], axis=1)
                )
            total = total + cfg.rgb_weight * ramp * rgb_loss
            metrics["loss_rgb"] = rgb_loss
        if cfg.pose_student and (
            "student_quat_views" in preds
            if per_view_pose
            else "student_quat" in preds
        ):
            if per_view_pose:
                # per-view teacher/student: each view's winning candidate
                # distills into the student prediction from that view's
                # own image — the student head learns image -> camera pose
                # exactly as it is used at predict time
                q_teacher = jax.lax.stop_gradient(
                    jnp.take_along_axis(
                        cand_v, k_star[:, :, None, None], axis=2
                    ).squeeze(2)
                )  # [B, V, 4]
                s_quat = preds["student_quat_views"]  # [B, V, 4]
            else:
                q_teacher = jax.lax.stop_gradient(
                    jnp.take_along_axis(
                        cand, k_star[:, None, None], axis=1
                    ).squeeze(1)
                )  # [B, 4]
                s_quat = preds["student_quat"]
            dot = jnp.sum(s_quat * q_teacher, axis=-1)
            student_loss = jnp.mean(1.0 - dot**2)  # sign-invariant
            sw = jnp.asarray(cfg.pose_student_weight, jnp.float32)
            if cfg.pose_student_warmup_steps > 0:
                # mechanism (c): the argmin teacher is noise early, and its
                # distillation gradient reaches the SHARED trunk (fc0 +
                # encoder) — ramp the weight in so gauge locking happens
                # before the student term carries weight
                sw = sw * jnp.clip(
                    step.astype(jnp.float32)
                    / cfg.pose_student_warmup_steps,
                    0.0,
                    1.0,
                )
            total = total + sw * student_loss
            metrics["loss_student"] = student_loss
        if cfg.pose_anchor_weight > 0 and "correction_quats" in preds:
            # mechanism (b), candidate re-anchoring: pull every candidate's
            # pre-offset correction toward identity (sign-invariant angular
            # distance 1 - w^2) so the fixed azimuth offsets keep owning
            # their sectors during gauge locking; optionally decay to zero
            # (cfg.pose_anchor_steps) so late training fine-tunes freely
            aw = jnp.asarray(cfg.pose_anchor_weight, jnp.float32)
            if cfg.pose_anchor_steps > 0:
                aw = aw * jnp.clip(
                    1.0
                    - step.astype(jnp.float32) / cfg.pose_anchor_steps,
                    0.0,
                    1.0,
                )
            corr = (
                preds["correction_quats_views"]
                if per_view_pose and "correction_quats_views" in preds
                else preds["correction_quats"]
            )
            if cfg.pose_anchor_mode == "azimuth":
                # penalize only the vertical-axis (azimuth) component of
                # the correction: q = (w, x, y, z), rotation about the
                # world-vertical y-axis has q_y = sin(theta/2) — elevation
                # and roll corrections stay free to track the view
                anchor_loss = jnp.mean(corr[..., 2] ** 2)
            else:
                anchor_loss = jnp.mean(1.0 - corr[..., 0] ** 2)
            total = total + aw * anchor_loss
            metrics["loss_anchor"] = anchor_loss
        if (
            cfg.pose_consistency_weight > 0
            and "points_view2" in preds
        ):
            # mechanism (e), cross-view shape consistency: two input
            # views of the same model must decode to the same canonical
            # cloud. A per-input mirror gauge decodes mirrored canonical
            # shapes for different views of one model — the symmetric
            # Chamfer between them punishes exactly that, with no pose
            # supervision (the flip-resolver negative showed the gauge
            # is a consistent function of the input on BOTH heads, so it
            # must be broken at training time).
            from dpcx.eval.chamfer import chamfer_distance

            cons = jnp.mean(
                chamfer_distance(points, preds["points_view2"])["chamfer"]
            )
            total = total + cfg.pose_consistency_weight * cons
            metrics["loss_consistency"] = cons
        win_idx = (
            k_star[:, None, :, None, None]
            if per_view_pose
            else k_star[:, None, None, None, None]
        )  # broadcast index into the K axis of [B, K, V, D, D]
        if cfg.proj_depth and cfg.drc_weight > 0:
            depth = depth.reshape(B, K, V, D, D)
            d_win = jnp.take_along_axis(depth, win_idx, axis=1).squeeze(1)
            d_loss = jnp.mean(
                _masked_depth_loss(d_win, batch["depths"], masks)
            )
            total = total + cfg.drc_weight * d_loss
            metrics["loss_depth"] = d_loss
        sil_win = jnp.take_along_axis(sil, win_idx, axis=1).squeeze(1)
        pred_m = sil_win[:, 0] > 0.4
        gt_m = masks[:, 0] > 0.5
        inter = jnp.sum(pred_m & gt_m, axis=(-2, -1))
        union = jnp.maximum(jnp.sum(pred_m | gt_m, axis=(-2, -1)), 1)
        metrics["iou"] = jnp.mean(inter / union)

    if cfg.predict_scale and cfg.scale_weight > 0 and "scale" in preds:
        s_loss = jnp.mean((preds["scale"] - 0.7) ** 2)
        total = total + cfg.scale_weight * s_loss
        metrics["loss_scale"] = s_loss

    if cfg.translation_weight > 0 and (
        "translation" in preds or "translations_views" in preds
    ):
        t_loss = jnp.mean(
            preds.get("translations_views", preds.get("translation"))
            ** 2
        )
        total = total + cfg.translation_weight * t_loss
        metrics["loss_translation"] = t_loss

    metrics["loss_total"] = total
    return total, metrics
