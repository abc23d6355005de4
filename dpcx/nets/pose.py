"""Pose heads: K-candidate quaternion ensemble + student quaternion.

Reference parity: dpc/models/model_pc.py::predict_pose (SURVEY.md §2.2 #12,
§3.4): FC -> K x 4 candidate quaternions (K = pose_predict_num_candidates)
plus one student quaternion trained by distillation from the min-loss
("teacher") candidate. Quaternions are normalized here; candidate selection
and the stop-gradient student loss live in dpcx.models.losses.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpcx.geometry.quaternion import (
    quaternion_multiply,
    quaternion_normalize,
)


class PoseHead(nn.Module):
    num_candidates: int = 4
    with_student: bool = True
    hidden: int = 256
    predict_translation: bool = False
    candidate_offsets: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pose_inp: jax.Array) -> dict[str, jax.Array]:
        """pose_inp [B, F] -> {"quats": [B, K, 4], "student_quat": [B, 4],
        "translation"?: [B, K, 3]}."""
        x = nn.leaky_relu(
            nn.Dense(self.hidden, dtype=self.compute_dtype, name="fc0")(
                pose_inp.astype(self.compute_dtype)
            ),
            0.2,
        )
        B = x.shape[0]
        raw = nn.Dense(
            self.num_candidates * 4, dtype=self.compute_dtype, name="fc_quats"
        )(x)
        # bias init keeps candidates near identity-but-distinct at start
        quats = raw.astype(jnp.float32).reshape(B, self.num_candidates, 4)
        quats = quats + jnp.asarray([1.0, 0.0, 0.0, 0.0])
        quats = quaternion_normalize(quats)
        # the pre-offset corrections, exposed for the re-anchoring
        # regularizer (cfg.pose_anchor_weight): anchoring THESE to identity
        # keeps each fixed offset owning its azimuth sector
        corrections = quats
        if self.candidate_offsets and self.num_candidates > 1:
            # Mode coverage by construction (paper §3.2 pose ensemble): each
            # candidate is a FIXED rotation about the vertical (world y-up)
            # axis, uniformly spaced over azimuth, composed with the
            # predicted correction. The hard-min loss then lets the
            # correctly-oriented candidate win per sample instead of every
            # head having to discover the 180-deg flip mode from identity.
            theta = (
                2.0
                * jnp.pi
                * jnp.arange(self.num_candidates, dtype=jnp.float32)
                / self.num_candidates
            )
            zeros = jnp.zeros_like(theta)
            off = jnp.stack(
                [jnp.cos(theta / 2), zeros, jnp.sin(theta / 2), zeros],
                axis=-1,
            )  # [K, 4]: azimuth offset applied to object coords first
            quats = quaternion_multiply(quats, off)
        out = {"quats": quats, "correction_quats": corrections}
        if self.with_student:
            sraw = nn.Dense(4, dtype=self.compute_dtype, name="fc_student")(x)
            out["student_quat"] = quaternion_normalize(
                sraw.astype(jnp.float32) + jnp.asarray([1.0, 0.0, 0.0, 0.0])
            )
        if self.predict_translation:
            t = nn.Dense(
                self.num_candidates * 3,
                dtype=self.compute_dtype,
                name="fc_trans",
            )(x)
            out["translation"] = 0.2 * jnp.tanh(
                t.astype(jnp.float32)
            ).reshape(B, self.num_candidates, 3)
        return out
