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
    # anisotropic Gaussian splat heads (BASELINE config 5, dpcx-only):
    # per-point stddevs (sigmoid-bounded, NDC units), local orientation
    # quaternion (identity-biased) and opacity
    predict_gauss: bool = False
    gauss_scale_min: float = 0.005
    gauss_scale_max: float = 0.06
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, latent: jax.Array) -> dict[str, jax.Array]:
        """latent [B, L] -> {"points": [B, N, 3], "rgb"?, "scale"?,
        "gauss_scales"?, "gauss_rot"?, "gauss_opacity"?}."""
        x = latent.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.leaky_relu(
                nn.Dense(h, dtype=self.compute_dtype, name=f"fc{i}")(x), 0.2
            )
        B = x.shape[0]
        N = self.num_points
        raw = nn.Dense(
            N * 3, dtype=self.compute_dtype, name="fc_points"
        )(x)
        out = {
            "points": 0.5
            * jnp.tanh(raw.astype(jnp.float32)).reshape(B, N, 3)
        }
        if self.predict_rgb:
            rgb = nn.Dense(
                N * 3, dtype=self.compute_dtype, name="fc_rgb"
            )(x)
            out["rgb"] = jax.nn.sigmoid(
                rgb.astype(jnp.float32)
            ).reshape(B, N, 3)
        if self.predict_gauss:
            g = nn.Dense(
                N * 8, dtype=self.compute_dtype, name="fc_gauss"
            )(x).astype(jnp.float32).reshape(B, N, 8)
            lo, hi = self.gauss_scale_min, self.gauss_scale_max
            out["gauss_scales"] = lo + (hi - lo) * jax.nn.sigmoid(
                g[..., 0:3]
            )
            rot = g[..., 3:7] * 0.1 + jnp.asarray([1.0, 0, 0, 0])
            out["gauss_rot"] = rot / jnp.linalg.norm(
                rot, axis=-1, keepdims=True
            )
            out["gauss_opacity"] = jax.nn.sigmoid(g[..., 7])
        if self.predict_scale:
            s = nn.Dense(1, dtype=self.compute_dtype, name="fc_scale")(x)
            # sigmoid scale in (0, 1]; reference uses a sigmoid'd global
            # scale applied multiplicatively to the cloud
            out["scale"] = jax.nn.sigmoid(s.astype(jnp.float32))
        return out
