"""Model assembly: encoder -> (points, rgb, scale) + pose heads.

Reference parity: dpc/models/model_pc.py::ModelPointCloud.model_predict and
dpc/models/model_base.py (SURVEY.md §2.2 #14, §3.1): one forward produces the
shape prediction and, in predicted-pose configs, K candidate quaternions plus
the student quaternion. Loss assembly lives in dpcx.models.losses.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.nets.net_factory import get_network


class ModelPointCloud(nn.Module):
    cfg: Config

    def setup(self) -> None:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = get_network("img_encoder")(
            filters=c.encoder_filters,
            latent_dim=c.latent_dim,
            fc_hidden=c.fc_hidden,
            compute_dtype=dtype,
        )
        self.decoder = get_network("pc_decoder")(
            num_points=c.pc_num_points,
            hidden=c.pc_decoder_hidden,
            predict_rgb=c.pc_rgb,
            predict_scale=c.predict_scale,
            predict_gauss=c.pc_gauss,
            gauss_scale_min=c.gauss_scale_min,
            gauss_scale_max=c.gauss_scale_max,
            compute_dtype=dtype,
        )
        if c.predict_pose:
            self.pose_head = get_network("pose_head")(
                num_candidates=c.pose_predict_num_candidates,
                with_student=c.pose_student,
                predict_translation=c.predict_translation,
                candidate_offsets=c.pose_candidate_offsets,
                compute_dtype=dtype,
            )

    def __call__(self, images: jax.Array) -> dict[str, jax.Array]:
        """images [B, H, W, 3] -> predictions.

        Returns points [B, N, 3] (already scaled if predict_scale), plus
        optional rgb [B, N, 3], scale [B, 1], quats [B, K, 4],
        student_quat [B, 4].
        """
        enc = self.encoder(images)
        dec = self.decoder(enc["latent"])
        points = dec["points"]
        out: dict[str, jax.Array] = {}
        if "scale" in dec:
            # global scale in (0, 1], biased toward 1 at init
            scale = 0.4 + 0.6 * dec["scale"]
            points = points * scale[..., None]
            out["scale"] = scale
        out["points"] = points
        if "rgb" in dec:
            out["rgb"] = dec["rgb"]
        for k in ("gauss_scales", "gauss_rot", "gauss_opacity"):
            if k in dec:
                out[k] = dec[k]
        if self.cfg.predict_pose:
            pose = self.pose_head(enc["pose_inp"])
            out.update(pose)
        return out

    def pose_only(self, images: jax.Array) -> dict[str, jax.Array]:
        """Pose heads only: images [M, H, W, 3] -> {"quats": [M, K, 4],
        "correction_quats": [M, K, 4], "student_quat"?: [M, 4]}.

        Used by cfg.pose_from_views (the reference's unknown-pose
        protocol, dpc paper: shape and pose predicted from DIFFERENT
        views) to predict each target view's pose from its own image
        without decoding a shape — the decoder (the bulk of the model's
        parameters) runs once, on the input view only.
        """
        enc = self.encoder(images)
        return self.pose_head(enc["pose_inp"])
