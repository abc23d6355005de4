"""Point-cloud decoder: FC stack -> N x 3 points (+ RGB, + global scale).

Reference parity: dpc/nets/pc_decoder.py (SURVEY.md §2.2 #11): fully
connected stack from the latent; points through tanh * 0.5 (the unit box),
optional per-point RGB (sigmoid), optional scalar scale (sigmoid).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointCloudDecoder(nn.Module):
    num_points: int = 8000
    hidden: tuple[int, ...] = (1024, 1024, 1024)
    predict_rgb: bool = False
    predict_scale: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, latent: jax.Array) -> dict[str, jax.Array]:
        """latent [B, L] -> {"points": [B, N, 3], "rgb"?, "scale"?}."""
        x = latent.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.leaky_relu(
                nn.Dense(h, dtype=self.compute_dtype, name=f"fc{i}")(x), 0.2
            )
        B = x.shape[0]
        raw = nn.Dense(
            self.num_points * 3, dtype=self.compute_dtype, name="fc_points"
        )(x)
        out = {
            "points": 0.5
            * jnp.tanh(raw.astype(jnp.float32)).reshape(B, self.num_points, 3)
        }
        if self.predict_rgb:
            rgb = nn.Dense(
                self.num_points * 3, dtype=self.compute_dtype, name="fc_rgb"
            )(x)
            out["rgb"] = jax.nn.sigmoid(
                rgb.astype(jnp.float32)
            ).reshape(B, self.num_points, 3)
        if self.predict_scale:
            s = nn.Dense(1, dtype=self.compute_dtype, name="fc_scale")(x)
            # sigmoid scale in (0, 1]; reference uses a sigmoid'd global
            # scale applied multiplicatively to the cloud
            out["scale"] = jax.nn.sigmoid(s.astype(jnp.float32))
        return out
