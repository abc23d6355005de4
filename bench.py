#!/usr/bin/env python
"""Benchmark: points splatted+projected per second per chip at 64^3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): >= 100 Mpoints/s/chip at 64^3 on TPU v5e.

Measures the full renderer forward — perspective transform -> z-sort ->
fused Pallas splat -> Gaussian blur -> DRC silhouette — on the flagship
config shapes (N=16384 points, D=64 grid). Timing runs the render ITERS
times inside one jitted lax.scan with a data dependency between
iterations, ends with a VALUE FETCH (block_until_ready is not a true
barrier through the async tunnel), and varies the arguments per timed
call (identical calls are served from a result cache). See NOTES.md.

Extra keys (VERDICT round-1 item 4):
- value/vs_baseline: bf16 perf mode (the headline number)
- fp32_value: fp32 parity mode (HIGHEST matmul precision, ~3x slower)
- d128_value: depth-blocked kernel at 128^3, bf16, fwd
- parity: COMPILED-kernel parity gate on this chip — fused fwd + custom
  VJP at the flagship shapes vs the XLA scatter oracle, both acc dtypes;
  ok=false (and exit code 1) if the Mosaic lowering ever diverges.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render.project import pointcloud_project_fn

# tolerances for the compiled-kernel parity gate (max abs error on the
# [0,1] silhouette; relative L2 on input gradients)
SIL_TOL = {"float32": 2e-3, "bfloat16": 5e-2}
GRAD_TOL = {"float32": 2e-2, "bfloat16": 2e-1}


def _inputs(B, N, key=0):
    pts = jax.random.uniform(
        jax.random.PRNGKey(key), (B, N, 3), minval=-0.4, maxval=0.4
    )
    quat = jax.random.normal(jax.random.PRNGKey(key + 1), (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return pts, quat


def measure(cfg, pts, quat, sigma, iters):
    # Timing rules learned the hard way on this runtime (NOTES.md):
    # - quat/sigma MUST be jit arguments — operands reaching the Pallas
    #   kernel from closure CONSTANTS force a synchronous ~0.9 ms/step
    #   dispatch path;
    # - block_until_ready() can return before execution completes
    #   (async tunnel futures) — only a VALUE FETCH is a true barrier;
    # - every timed call must use DISTINCT argument values or the tunnel
    #   serves a cached result.
    @jax.jit
    def run(p, quat, sigma):
        def body(carry, _):
            sil = pointcloud_project_fn(cfg, carry, quat, sigma).silhouette
            carry = carry + sil.sum() * 1e-17  # serialize iterations
            return carry, sil.sum()

        _, s = jax.lax.scan(body, p, None, length=iters)
        return s.sum()

    float(run(pts, quat, sigma))  # compile + warm
    best = float("inf")
    for i in range(3):  # best-of-3 damps tunnel/queue variance
        sg = sigma * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(run(pts, quat, sg))  # value fetch = true completion
        best = min(best, (time.perf_counter() - t0) / iters)
    B, N = pts.shape[:2]
    return B * N / best / 1e6


def parity(cfg_pallas, pts, quat, sigma):
    """Compiled fused kernel (fwd + custom VJP) vs the XLA scatter oracle
    at the same shapes, on this device."""
    cfg_xla = cfg_pallas.replace(renderer="xla")
    tgt = jax.random.uniform(
        jax.random.PRNGKey(9), (pts.shape[0],) + (cfg_pallas.vox_size,) * 2
    )

    def sil_fn(cfg):
        return jax.jit(
            lambda p, q, sg: pointcloud_project_fn(
                cfg, p, q, sg
            ).silhouette
        )

    def grad_fn(cfg):
        def loss(p, q, sg, t):
            s = pointcloud_project_fn(cfg, p, q, sg).silhouette
            return jnp.mean((s - t) ** 2)

        return jax.jit(jax.grad(loss))

    s_p = sil_fn(cfg_pallas)(pts, quat, sigma)
    s_x = sil_fn(cfg_xla)(pts, quat, sigma)
    g_p = grad_fn(cfg_pallas)(pts, quat, sigma, tgt)
    g_x = grad_fn(cfg_xla)(pts, quat, sigma, tgt)
    sil_err = float(jnp.max(jnp.abs(s_p - s_x)))
    grad_rel = float(
        jnp.linalg.norm(g_p - g_x) / (jnp.linalg.norm(g_x) + 1e-12)
    )
    mode = cfg_pallas.pallas_acc_dtype
    return {
        "sil_max_err": round(sil_err, 6),
        "grad_rel_err": round(grad_rel, 6),
        "ok": sil_err < SIL_TOL[mode] and grad_rel < GRAD_TOL[mode],
    }


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    D = 64
    # iters large enough to amortize the fixed ~25-30 ms per-dispatch
    # round trip of the tunnel (measured; NOTES.md). B=48 is the flagship
    # training step's ACTUAL render batch (batch_size 16 x views_per_step
    # 3, losses.py batches all views into one fused call); the scan
    # harness itself costs ~99 us/iteration (measured,
    # scripts/time_overheads.py), so small-B numbers under-report the
    # kernel. b16_value is kept for round-over-round comparability.
    B, N, iters = (48, 16384, 100) if on_tpu else (2, 256, 3)
    pts, quat = _inputs(B, N)
    sigma = jnp.asarray(0.02)

    def cfg(acc, vox=D, n=N):
        return Config(
            vox_size=vox,
            pc_num_points=n,
            renderer="pallas" if on_tpu else "xla",
            pallas_acc_dtype=acc,
            proj_depth=False,
        )

    mpts = measure(cfg("bfloat16"), pts, quat, sigma, iters)
    rec = {
        "metric": "points_splatted_projected_per_sec_per_chip_64cubed",
        "value": round(mpts, 2),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / 100.0, 3),
    }
    if on_tpu:
        rec["fp32_value"] = round(
            measure(cfg("float32"), pts, quat, sigma, iters), 2
        )
        pts16, quat16 = _inputs(16, N, key=7)
        rec["b16_value"] = round(
            measure(cfg("bfloat16"), pts16, quat16, sigma, 150), 2
        )
        pts128, quat128 = _inputs(4, 16000, key=4)
        rec["d128_value"] = round(
            measure(
                cfg("bfloat16", vox=128, n=16000), pts128, quat128,
                sigma, max(iters // 3, 5),
            ),
            2,
        )
        rec["parity"] = {
            mode: parity(cfg(mode), pts, quat, sigma)
            for mode in ("float32", "bfloat16")
        }
        rec["parity_ok"] = all(
            v["ok"] for v in rec["parity"].values()
        )
    print(json.dumps(rec))
    if on_tpu and not rec["parity_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
