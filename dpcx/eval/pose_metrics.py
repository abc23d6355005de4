"""Pose accuracy metrics + canonical-frame alignment.

Reference parity: pose eval in dpc/run/ (SURVEY.md §2.2 #18): angular error
between predicted and GT camera rotations -> accuracy@30deg and median error;
for unsupervised-pose runs the predicted object frame is only defined up to a
global rotation, so a canonical alignment is estimated first (SURVEY.md §3.2
[M]) — here by searching a Fibonacci grid of rotations (plus refinement) for
the one minimizing mean angular error on a held-out subset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpcx.geometry.quaternion import (
    quaternion_angular_distance,
    quaternion_conjugate,
    quaternion_multiply,
    quaternion_normalize,
)


def gauge_spread_deg(
    pred_quats: jax.Array, cam_quats: jax.Array
) -> jax.Array:
    """Per-model cross-view gauge-coherence dispersion, in degrees.

    ``pred_quats``/``cam_quats`` are ``[V, M, 4]``: the predicted
    object→camera quaternion and the KNOWN camera-rig quaternion for
    view v of model m. A gauge-coherent predictor satisfies
    ``pred[v, m] = cam[v, m] ∘ g[m]`` for some per-model object-side
    gauge g (the unsupervised canonical-frame freedom), so the residual
    ``r[v, m] = conj(cam[v, m]) ∘ pred[v, m]`` is constant over v; any
    fixed g — and any global canonical alignment, which also composes on
    the right (see ``align_canonical_frame``) — drops out of the
    cross-view dispersion. The statistic therefore needs NO object-pose
    annotation, only the camera rig the training loss already consumes,
    and deploys as a frame-lock / gauge-failure detector (POSE_RESULTS
    finding 21: healthy runs <~15 deg, the chair-s3 gauge failure ~58).

    Returns the ``[M]`` mean angular distance of each model's residuals
    to their chordal-mean quaternion.
    """
    r = quaternion_multiply(quaternion_conjugate(cam_quats), pred_quats)
    # sign-coherence per model: q and -q are one rotation
    sign = jnp.where(
        jnp.sum(r * r[:1], axis=-1, keepdims=True) < 0, -1.0, 1.0
    )
    r = r * sign
    m = quaternion_normalize(jnp.mean(r, axis=0))
    return jnp.degrees(
        quaternion_angular_distance(r, m[None]).mean(axis=0)
    )


def pose_error_metrics(
    pred_quats: jax.Array, gt_quats: jax.Array
) -> dict[str, jax.Array]:
    """pred/gt [M, 4] -> angular errors (deg), accuracy@30deg, median."""
    err = quaternion_angular_distance(pred_quats, gt_quats)
    deg = err * 180.0 / jnp.pi
    return {
        "angular_err_deg": deg,
        "acc_30deg": jnp.mean((deg <= 30.0).astype(jnp.float32)),
        "median_err_deg": jnp.median(deg),
    }


# pi about the object's vertical (y) axis, (w, x, y, z) — the azimuth
# mirror mode that dominates unsupervised-pose errors on near-symmetric
# categories (artifacts/POSE_RESULTS.md findings 8-9)
FLIP_QUAT = jnp.asarray([0.0, 0.0, 1.0, 0.0])


def pose_error_metrics_up_to_flip(
    aligned_pred: jax.Array, gt_quats: jax.Array
) -> dict[str, jax.Array]:
    """Diagnostic variant of :func:`pose_error_metrics`: each sample may
    additionally compose the 180-degree vertical-axis flip on the object
    side (``aligned_pred`` must already be in the GT canonical frame, i.e.
    the output of :func:`align_canonical_frame`). Quantifies how much of
    the pose error is the discrete azimuth mirror gauge: a category whose
    plain acc@30 is ~0.5 but flip-aware acc is ~1.0 is mirror-limited,
    not noisy. ``flip_rate`` is the fraction of samples the flip helps."""
    e0 = quaternion_angular_distance(aligned_pred, gt_quats)
    flipped = quaternion_multiply(aligned_pred, FLIP_QUAT[None])
    e1 = quaternion_angular_distance(flipped, gt_quats)
    deg = jnp.minimum(e0, e1) * 180.0 / jnp.pi
    return {
        "acc_30deg_up_to_flip": jnp.mean((deg <= 30.0).astype(jnp.float32)),
        "median_err_deg_up_to_flip": jnp.median(deg),
        "flip_rate": jnp.mean((e1 < e0).astype(jnp.float32)),
    }


def _rotation_grid(n: int = 512) -> jax.Array:
    """Quasi-uniform grid of unit quaternions (super-Fibonacci-ish spiral)."""
    i = jnp.arange(n, dtype=jnp.float32) + 0.5
    s = i / n
    t = i / 1.61803398875  # golden ratio spiral
    u = i / 2.41421356237
    a, b = jnp.sqrt(1.0 - s), jnp.sqrt(s)
    return quaternion_normalize(
        jnp.stack(
            [
                a * jnp.sin(2 * jnp.pi * t),
                a * jnp.cos(2 * jnp.pi * t),
                b * jnp.sin(2 * jnp.pi * u),
                b * jnp.cos(2 * jnp.pi * u),
            ],
            axis=-1,
        )
    )


def _axis_sphere(n: int) -> jax.Array:
    """n quasi-uniform unit axes (Fibonacci sphere)."""
    i = jnp.arange(n, dtype=jnp.float32) + 0.5
    phi = 2.0 * jnp.pi * i / 1.61803398875
    cos_t = 1.0 - 2.0 * i / n
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t**2))
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )


def align_canonical_frame(
    pred_quats: jax.Array,
    gt_quats: jax.Array,
    grid_size: int = 2048,
    refine_iters: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Find global q_align minimizing mean angular error of
    pred * q_align vs gt. Returns (q_align, aligned_pred_quats).

    The predicted pose maps object->camera; the unknown canonical offset
    composes on the object side (right-multiplication).

    Two stages: a coarse quasi-uniform SO(3) grid (whose ~10-15 deg
    covering radius would otherwise floor the reported pose metrics),
    then ``refine_iters`` rounds of local re-search — 48 Fibonacci axes x
    2 magnitudes around the incumbent, shrinking the angular scale 0.35x
    per round — leaving a <0.5 deg alignment residual.
    """
    grid = _rotation_grid(grid_size)  # [G, 4]

    def mean_err(q_align):
        aligned = quaternion_multiply(pred_quats, q_align[None])
        return jnp.mean(quaternion_angular_distance(aligned, gt_quats))

    errs = jax.lax.map(mean_err, grid)
    best = grid[jnp.argmin(errs)]

    axes = _axis_sphere(48)  # [A, 3]
    scale = 0.25  # rad, ~ the 2048-grid covering radius

    for _ in range(refine_iters):
        half = jnp.asarray([scale, 0.5 * scale])[:, None, None] / 2.0
        delta = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.cos(half), (2, axes.shape[0], 1)
                ),
                jnp.sin(half) * axes[None],
            ],
            axis=-1,
        ).reshape(-1, 4)  # [2A, 4] small rotations
        cands = jnp.concatenate(
            [best[None], quaternion_multiply(best[None], delta)], axis=0
        )
        errs = jax.lax.map(mean_err, cands)
        best = cands[jnp.argmin(errs)]
        scale *= 0.35

    return best, quaternion_multiply(pred_quats, best[None])
