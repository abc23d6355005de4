"""Image encoder: strided convnet -> latent.

Reference parity: dpc/nets/img_encoder.py (SURVEY.md §2.2 #10): ~5 strided
conv layers -> FC latent; outputs a dict with the shape latent and a separate
pose branch input (the reference feeds pose prediction from encoder features
so pose gradients don't flow through the shape latent path and vice versa).

TPU notes: convs run in cfg.compute_dtype (bfloat16 by default) — all conv
FLOPs land on the MXU; params stay fp32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ImageEncoder(nn.Module):
    filters: tuple[int, ...] = (32, 64, 96, 128, 192)
    latent_dim: int = 1024
    fc_hidden: int = 1024
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> dict[str, jax.Array]:
        """images [B, H, W, 3] -> {"latent": [B, latent], "pose_inp": ...}."""
        x = images.astype(self.compute_dtype)
        for i, f in enumerate(self.filters):
            x = nn.Conv(
                f, (3, 3), strides=(2, 2), dtype=self.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        feat = nn.leaky_relu(
            nn.Dense(self.fc_hidden, dtype=self.compute_dtype, name="fc1")(x),
            0.2,
        )
        latent = nn.Dense(
            self.latent_dim, dtype=self.compute_dtype, name="fc_latent"
        )(feat)
        # pose branch input: detached-width FC off the shared features
        pose_inp = nn.leaky_relu(
            nn.Dense(
                self.fc_hidden, dtype=self.compute_dtype, name="fc_pose"
            )(feat),
            0.2,
        )
        return {
            "latent": latent.astype(jnp.float32),
            "pose_inp": pose_inp.astype(jnp.float32),
        }
