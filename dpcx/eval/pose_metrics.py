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
    quaternion_multiply,
    quaternion_normalize,
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


def align_canonical_frame(
    pred_quats: jax.Array, gt_quats: jax.Array, grid_size: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """Find global q_align minimizing mean angular error of
    pred * q_align vs gt. Returns (q_align, aligned_pred_quats).

    The predicted pose maps object->camera; the unknown canonical offset
    composes on the object side (right-multiplication).
    """
    grid = _rotation_grid(grid_size)  # [G, 4]

    def mean_err(q_align):
        aligned = quaternion_multiply(pred_quats, q_align[None])
        return jnp.mean(quaternion_angular_distance(aligned, gt_quats))

    errs = jax.lax.map(mean_err, grid)
    best = grid[jnp.argmin(errs)]
    return best, quaternion_multiply(pred_quats, best[None])
