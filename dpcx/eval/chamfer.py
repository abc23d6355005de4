"""Chamfer distance between predicted and densified-GT point clouds.

Reference parity: dpc/util/point_cloud_distance.py (SURVEY.md §2.2 #18):
directed nearest-neighbor distances both ways, summed; aggregated per
category. TPU-native: the pairwise-distance matrix is computed in CHUNKS of
the GT axis as one batched matmul per chunk (||a-b||^2 = |a|^2 + |b|^2 -
2 a.b — the 2ab term is an MXU matmul), with a running min carried through a
lax.scan so the full [N, M] matrix never materializes for large M.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk",))
def directed_distance(
    a: jax.Array, b: jax.Array, chunk: int = 2048
) -> jax.Array:
    """Mean over points of a of the squared distance to nearest point in b.

    a [..., N, 3], b [..., M, 3] -> [...]. M must be divisible by chunk or
    smaller than it (padded internally).
    """
    M = b.shape[-2]
    chunk = min(chunk, M)
    pad = (-M) % chunk
    if pad:
        # pad with +inf-distance sentinels (far away)
        far = jnp.full(b.shape[:-2] + (pad, 3), 1e6, b.dtype)
        b = jnp.concatenate([b, far], axis=-2)
    n_chunks = b.shape[-2] // chunk
    bc = jnp.moveaxis(
        b.reshape(b.shape[:-2] + (n_chunks, chunk, 3)), -3, 0
    )  # [C, ..., chunk, 3]
    a_sq = jnp.sum(a * a, axis=-1)  # [..., N]

    def body(carry, b_chunk):
        b_sq = jnp.sum(b_chunk * b_chunk, axis=-1)  # [..., chunk]
        cross = jnp.einsum(
            "...nd,...md->...nm", a, b_chunk,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = a_sq[..., None] + b_sq[..., None, :] - 2.0 * cross
        return jnp.minimum(carry, d.min(axis=-1)), None

    init = jnp.full(a.shape[:-1], jnp.inf, a.dtype)
    min_d, _ = jax.lax.scan(body, init, bc)
    return jnp.mean(jnp.maximum(min_d, 0.0), axis=-1)


def chamfer_distance(
    pred: jax.Array, gt: jax.Array, chunk: int = 2048
) -> dict[str, jax.Array]:
    """Symmetric Chamfer: pred->gt ("accuracy") + gt->pred ("coverage").

    Matches the reference eval protocol (SURVEY.md §3.2): directed NN
    distances both ways; reported individually and summed.
    """
    acc = directed_distance(pred, gt, chunk)
    cov = directed_distance(gt, pred, chunk)
    return {"pred_to_gt": acc, "gt_to_pred": cov, "chamfer": acc + cov}
