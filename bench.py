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

Extra keys (VERDICT round-1 item 4, round-2 missing 3+4):
- value/vs_baseline: bf16 perf mode (the headline number)
- fp32_value: fp32 parity mode (HIGHEST matmul precision, ~3x slower)
- b16_value: B=16 key=0 inputs, round-over-round comparable
- fwdbwd_value / d128_fwdbwd_value: fwd + handwritten backward (the
  training path's render cost) at 64^3 / 128^3
- d128_value: depth-blocked kernel at 128^3, bf16, fwd, B=16
- gsplat_fwdbwd_value / gsplat_pallas_fwdbwd_value: BASELINE config 5
  renderer (anisotropic RGB alpha-splats) fwd+bwd, windowed XLA path vs
  the native pallas kernel
- health_mpts / degraded: fixed-shape probe vs bench_health.json — a
  crashed-and-restarted worker leaves the process ~40% slow; degraded
  benches are flagged instead of silently recorded
- parity: COMPILED-kernel parity gate on this chip — fused fwd + custom
  VJP at the flagship shapes vs the XLA scatter oracle, both acc dtypes;
  ok=false (and exit code 1) if the Mosaic lowering ever diverges.
"""

import json
import os
import sys

import jax

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# honor an explicit cpu request (tests, driverless smoke) the only way
# that works on this runtime (NOTES.md).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

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


# measurement harness: dpcx/utils/timing.py enforces the dispatch rules
# (operands as jit args, serialized scan, value-fetch barrier, perturbed
# repeats) that NOTES.md documents for this runtime
from dpcx.utils.timing import render_throughput_mpts


def measure(cfg, pts, quat, sigma, iters):
    return render_throughput_mpts(cfg, pts, quat, sigma, iters)


def measure_bwd(cfg, pts, quat, sigma, iters):
    """fwd + handwritten-backward throughput: grad of the silhouette sum
    wrt the points (the training path's render cost)."""
    return render_throughput_mpts(
        cfg, pts, quat, sigma, iters, backward=True
    )


def measure_gsplat(iters=60, impl="windowed", vox=32, acc="float32"):
    """BASELINE config 5 renderer: anisotropic RGB alpha-splats at the
    rgb_splats.yaml shapes (B=8 render batch, N=4096, D=32), fwd+bwd
    through points/scales/opacity (the training cost). Mpts/s.

    impl="windowed" is the round-3a number kept for comparability;
    impl="pallas" is the native kernel (dpcx/render/pallas_gsplat.py);
    acc="float32" keeps the established keys round-over-round
    comparable. vox=64/acc="bfloat16" covers the round-5 extension
    (SMEM-scalar x-loop bound — previously the D=64 bf16 backward
    failed to compile; artifacts/gsplat_d64_r5.json)."""
    from dpcx.render.gsplat import gsplat_project
    from dpcx.utils.timing import bench_scan

    cfg = Config(
        vox_size=vox, pc_num_points=4096, pc_rgb=True, pc_gauss=True,
        gauss_scale_min=0.005, gauss_scale_max=0.06,
        gsplat_impl=impl, pallas_acc_dtype=acc,
    )
    B, N = 8, 4096
    key = jax.random.PRNGKey(5)
    pts, quat = _inputs(B, N, key=5)
    scales = jax.random.uniform(key, (B, N, 3), minval=0.01, maxval=0.05)
    rot = jax.random.normal(jax.random.PRNGKey(6), (B, N, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    opac = jax.random.uniform(jax.random.PRNGKey(7), (B, N))
    rgb = jax.random.uniform(jax.random.PRNGKey(8), (B, N, 3))

    # quat/rot/rgb ride the operand tuple so they reach any pallas call
    # as jit arguments, not closure constants (dispatch cliff, NOTES.md)
    def body(carry, p, s, o, q, r, cg):
        def loss(p_, s_, o_):
            out = gsplat_project(cfg, p_, q, s_, r, o_, cg)
            return out.silhouette.sum() + out.rgb.sum()

        gp, gs, go = jax.grad(loss, argnums=(0, 1, 2))(
            p + carry * 1e-17, s, o
        )
        return carry + 1e-17, gp.sum() + gs.sum() + go.sum()

    sec = bench_scan(
        body, jnp.zeros(()), (pts, scales, opac, quat, rot, rgb),
        iters=iters,
    )
    return B * N / sec / 1e6


# TPU v5e public per-chip peaks (jax-ml.github.io/scaling-book): 197
# bf16 TFLOP/s on the MXU, 819 GB/s HBM bandwidth.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBPS = 819.0
# measured kernel share of the full headline call at B=48/N=16384/D=64
# bf16 (scripts/time_shell_b48.py, NOTES.md round-4 session B: kernel
# 1492.7 us of 2326.9 us total; the rest is the scan floor + XLA
# transform/sort/metadata pre-pass)
KERNEL_SHARE_B48 = 0.641


def roofline(cfg, pts, quat, mpts):
    """Absolute-yardstick statement for the headline number (VERDICT r4
    item 6): how close is the fused kernel to v5e peak?

    MXU flops are counted from the kernel's actual matmul shapes
    (pallas_kernel.py): splat = one [G*D, C] x [C, D] contraction per
    window trip with the trip counts taken from _window_metadata on the
    REAL bench inputs (trips are data-dependent: sorted chunks only
    cover their z-span); blur = per Gb-slab group, kron(I,K^T) @ X @ K
    (y+x) and kron(K^T,I) @ X (z). The DRC stage is VPU work (~6 D^3
    flops) and is excluded from MXU utilization. HBM bytes are the
    pallas call's operands + outputs — the D^3 grid lives in VMEM and
    never round-trips HBM, which is the kernel's entire design point,
    so the kernel is far on the compute side of the roofline.
    """
    from dpcx.render.pallas_kernel import _pack_params, _window_metadata
    from dpcx.render.transform import pc_perspective_transform

    B, N, _ = pts.shape
    D = cfg.vox_size
    G, C, S, Gb = _pack_params(B, N, D)
    ndc = pc_perspective_transform(
        pts, quat,
        focal_length=cfg.focal_length,
        camera_distance=cfg.camera_distance,
    )
    gz = jnp.sort((ndc[..., 2] + 0.5) * D - 0.5, axis=-1)
    _, nt = _window_metadata(gz, D, G, C)
    trips = float(nt.sum())
    splat_flops = trips * 2.0 * (G * D) * D * C
    blur_flops = (
        B
        * (D // Gb)
        * (
            2 * (Gb * D) ** 2 * D  # kron(I, K^T) @ X   (blur y)
            + 2 * (Gb * D) * D * D  # t @ K             (blur x)
            + 2 * (Gb * D) ** 2 * D  # kron(K^T, I) @ X (blur z)
        )
    )
    mxu_flops = splat_flops + blur_flops
    hbm_bytes = (
        B * (N * 4 * 4 + 2 * D * D * 4)  # [B,4,N] f32 in, 2x[B,D,D] out
        + 2 * (Gb * D) ** 2 * 4 + D * D * 4  # kron pair + kmat
    )
    t_call = B * N / (mpts * 1e6)  # seconds, from the headline Mpts/s
    achieved_tflops = mxu_flops / t_call / 1e12
    t_compute = mxu_flops / (V5E_PEAK_BF16_TFLOPS * 1e12)
    t_memory = hbm_bytes / (V5E_PEAK_HBM_GBPS * 1e9)
    return {
        "mxu_gflops_per_call": round(mxu_flops / 1e9, 2),
        "splat_trips": int(trips),
        "hbm_mb_per_call": round(hbm_bytes / 1e6, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        # whole-call MXU utilization (includes the measured 36% shell)
        "mfu_call_pct": round(100 * achieved_tflops
                              / V5E_PEAK_BF16_TFLOPS, 2),
        # kernel-only utilization via the measured shell decomposition
        "mfu_kernel_pct": round(
            100 * achieved_tflops / V5E_PEAK_BF16_TFLOPS
            / KERNEL_SHARE_B48, 2,
        ),
        # which side of the roofline the kernel sits on
        "bound": "compute" if t_compute > t_memory else "memory",
        "roofline_pct": round(100 * max(t_compute, t_memory) / t_call, 2),
    }


HEALTH_FILE = "bench_health.json"


def health_probe():
    """Worker-health check (VERDICT r2 weak 6 / NOTES r3 candidate 1): a
    crashed-and-restarted TPU worker leaves the SAME process ~40% slow.
    Times a fixed small render and compares against the expectation
    stored in bench_health.json (written on the first/calibration run);
    >1.35x slower flags the whole bench record as degraded."""
    import os

    cfg = Config(
        vox_size=32, pc_num_points=4096, renderer="pallas",
        pallas_acc_dtype="bfloat16", proj_depth=False,
    )
    pts, quat = _inputs(4, 4096, key=1234)
    mpts = measure(cfg, pts, quat, jnp.asarray(0.03), 60)
    out = {"health_mpts": round(mpts, 2)}
    if os.path.exists(HEALTH_FILE):
        with open(HEALTH_FILE) as f:
            expected = json.load(f)["expected_mpts"]
        out["health_expected_mpts"] = expected
        out["degraded"] = mpts < expected / 1.35
        # ratchet (VERDICT r3 weak 1): the stored expectation tracks the
        # FASTEST healthy measurement ever seen, so a calibration run that
        # happened on a slow-ish worker can't permanently lower the bar —
        # a worker 40% below healthy must flag as degraded
        if mpts > expected:
            with open(HEALTH_FILE, "w") as f:
                json.dump({"expected_mpts": round(mpts, 2)}, f)
    else:
        with open(HEALTH_FILE, "w") as f:
            json.dump({"expected_mpts": round(mpts, 2)}, f)
        out["degraded"] = False
    return out


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

    def extra(key, fn):
        # a broken extra (new-kernel Mosaic failure, OOM) must not take
        # down the headline record — record the error string instead
        try:
            rec[key] = round(fn(), 2)
        except Exception as e:  # noqa: BLE001
            rec[key] = None
            rec[key + "_error"] = str(e)[:200]

    if on_tpu:
        try:
            rec["roofline"] = roofline(cfg("bfloat16"), pts, quat, mpts)
        except Exception as e:  # noqa: BLE001
            rec["roofline_error"] = str(e)[:200]
        rec.update(health_probe())
        extra(
            "fp32_value",
            lambda: measure(cfg("float32"), pts, quat, sigma, iters),
        )
        # same key=0 inputs round 1 used, for apples-to-apples
        # round-over-round comparison (ADVICE r2)
        pts16, quat16 = _inputs(16, N)
        extra(
            "b16_value",
            lambda: measure(cfg("bfloat16"), pts16, quat16, sigma, 150),
        )
        # training-path render cost: fwd + handwritten backward
        extra(
            "fwdbwd_value",
            lambda: measure_bwd(
                cfg("bfloat16"), pts16, quat16, sigma, 100
            ),
        )
        # 128^3 depth-blocked kernel at B=16 (B=4/33-iter numbers were
        # tunnel-variance noisy — VERDICT r2 missing 4) + fwd+bwd
        pts128, quat128 = _inputs(16, 16000, key=4)
        c128 = cfg("bfloat16", vox=128, n=16000)
        extra(
            "d128_value",
            lambda: measure(c128, pts128, quat128, sigma, 100),
        )
        extra(
            "d128_fwdbwd_value",
            lambda: measure_bwd(c128, pts128, quat128, sigma, 60),
        )
        # BASELINE config 5 renderer (fwd+bwd): windowed XLA path (kept
        # for round-over-round comparability), the dense XLA oracle (what
        # a non-pallas yaml actually runs — VERDICT r3 weak 2), and the
        # native pallas kernel
        extra("gsplat_fwdbwd_value", measure_gsplat)
        extra(
            "gsplat_dense_fwdbwd_value",
            lambda: measure_gsplat(impl="dense"),
        )
        extra(
            "gsplat_pallas_fwdbwd_value",
            lambda: measure_gsplat(impl="pallas"),
        )
        # round-5 D=64 extension of the gsplat kernel (bf16 backward
        # compiles since the SMEM-scalar x-loop bound; dense fwd+bwd at
        # D=64 extrapolates to ~0.065 from its 16x D=32 fwd->fb ratio)
        extra(
            "gsplat_pallas_d64_fwdbwd_value",
            lambda: measure_gsplat(
                iters=12, impl="pallas", vox=64, acc="bfloat16"
            ),
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
