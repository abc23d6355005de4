"""Device-side serving throughput/latency for the flagship predictor.

Measures the compiled serving step (encoder + decoder + pose heads,
dpcx/serve.py::_serve_step shapes) with the canonical bench_scan harness
at several batch sizes, fp32 vs bf16 weights. Output: one JSON line per
config with images/s and us/image. PARITY.md "serving" row source.
"""
import json

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.models.model_pc import ModelPointCloud
from dpcx.utils.timing import bench_scan

cfg = Config(
    vox_size=64,
    pc_num_points=8000,
    image_size=128,
    predict_pose=True,
    pose_predict_num_candidates=4,
)
model = ModelPointCloud(cfg)
key = jax.random.PRNGKey(0)

for B in (1, 16, 64):
    imgs = jax.random.uniform(key, (B, cfg.image_size, cfg.image_size, 3))
    params32 = model.init(jax.random.PRNGKey(1), imgs)
    for tag, params in (
        ("fp32", params32),
        (
            "bf16",
            jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                params32,
            ),
        ),
    ):

        def body(carry, ims, ps):
            # params ride as a jit ARG (timing rule 1: closure constants
            # force the synchronous dispatch path)
            preds = model.apply(ps, ims + carry * 1e-17)
            return carry + 1e-17, preds["points"].sum()

        sec = bench_scan(
            body,
            jnp.zeros(()),
            (imgs, params),
            iters=100,
        )
        print(
            json.dumps(
                {
                    "what": f"serve_B{B}_{tag}",
                    "img_per_s": round(B / sec, 1),
                    "us_per_img": round(sec / B * 1e6, 1),
                }
            ),
            flush=True,
        )
