"""Decompose the windowed-gsplat cost on TPU (bench shapes: B=8, N=4096,
D=32, rgb+opacity, fwd and fwd+bwd) across formulation knobs:

- chunk size (scan trip count vs per-trip working set)
- placement-matmul precision (HIGHEST = 6-pass fp32 emulation on the MXU
  vs DEFAULT = bf16 passes)
- remat on/off (bwd recompute vs saved activations)
- dense oracle for reference

Device-side bench_scan timing. Findings feed NOTES.md and the gsplat
fast-path work.
"""
import json
import sys

import jax
import jax.numpy as jnp

import dpcx.render.gsplat as gs
from dpcx.utils.timing import bench_scan

PART2 = "--part2" in sys.argv
DENSE64 = "--dense64" in sys.argv  # WARNING: this graph crashed the TPU
# worker once (NOTES.md round-3 worker note) — only run it when nothing
# else is queued behind it.

B, N, D = 8, 4096, 32
key = jax.random.PRNGKey(5)
pts = jax.random.uniform(key, (B, N, 3), minval=-0.4, maxval=0.4)
scales = jax.random.uniform(
    jax.random.PRNGKey(6), (B, N, 3), minval=0.01, maxval=0.05
)
rot = jax.random.normal(jax.random.PRNGKey(7), (B, N, 4))
rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
opac = jax.random.uniform(jax.random.PRNGKey(8), (B, N))
rgb = jax.random.uniform(jax.random.PRNGKey(9), (B, N, 3))


def run(tag, fn, ops, iters=30):
    try:
        sec = bench_scan(fn, jnp.zeros(()), ops, iters=iters)
        print(
            json.dumps(
                {"what": tag, "ms": round(sec * 1e3, 2),
                 "mpts": round(B * N / sec / 1e6, 2)}
            ),
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"what": tag, "fail": str(e)[:120]}), flush=True)


def windowed_fwd(chunk, remat):
    def body(carry, p, s, o):
        dens, col = gs.anisotropic_density_grid_windowed(
            p + carry * 1e-17, s, rot, D, point_weights=o, rgb=rgb,
            chunk=chunk, remat=remat,
        )
        return carry + 1e-17, dens.sum() + col.sum()

    return body


def windowed_fb(chunk, remat):
    def body(carry, p, s, o):
        def loss(p_, s_, o_):
            dens, col = gs.anisotropic_density_grid_windowed(
                p_, s_, rot, D, point_weights=o_, rgb=rgb,
                chunk=chunk, remat=remat,
            )
            return dens.sum() + col.sum()

        gp, gs_, go = jax.grad(loss, argnums=(0, 1, 2))(
            p + carry * 1e-17, s, o
        )
        return carry + 1e-17, gp.sum() + gs_.sum() + go.sum()

    return body


def dense_fwd(d=D):
    def body(carry, p, s, o):
        dens, col = gs.anisotropic_density_grid(
            p + carry * 1e-17, s, rot, d, point_weights=o, rgb=rgb
        )
        return carry + 1e-17, dens.sum() + col.sum()

    return body


if not PART2:
    for prec_name, prec in (
        ("hi", jax.lax.Precision.HIGHEST),
        ("def", jax.lax.Precision.DEFAULT),
    ):
        gs.PLACEMENT_PRECISION = prec
        for chunk in (128, 512):
            run(f"win_fwd_c{chunk}_{prec_name}",
                windowed_fwd(chunk, True), (pts, scales, opac))
            run(f"win_fb_c{chunk}_{prec_name}_remat",
                windowed_fb(chunk, True), (pts, scales, opac), iters=20)
        run(f"win_fb_c128_{prec_name}_norematt",
            windowed_fb(128, False), (pts, scales, opac), iters=20)
    gs.PLACEMENT_PRECISION = jax.lax.Precision.HIGHEST
    run("dense_fwd", dense_fwd(), (pts, scales, opac), iters=10)


# --- round-3b (--part2): pallas aniso kernel vs dense, fwd and fwd+bwd ---
def dense_fb(d):
    def body(carry, p, s, o):
        def loss(p_, s_, o_):
            dens, col = gs.anisotropic_density_grid(
                p_, s_, rot, d, point_weights=o_, rgb=rgb
            )
            return dens.sum() + col.sum()

        gp, gs_, go = jax.grad(loss, argnums=(0, 1, 2))(
            p + carry * 1e-17, s, o
        )
        return carry + 1e-17, gp.sum() + gs_.sum() + go.sum()

    return body


# rot/rgb must reach the pallas call as JIT ARGUMENTS, not closure
# constants (constant-operand dispatch cliff, NOTES.md) — thread them
# through the operand tuple.
def pallas_fwd(d, acc="float32"):
    def body(carry, p, s, o, r, cg):
        dens, col = gs.anisotropic_density_grid_pallas(
            p + carry * 1e-17, s, r, d, point_weights=o, rgb=cg,
            acc_dtype=acc,
        )
        return carry + 1e-17, dens.sum() + col.sum()

    return body


def pallas_fb(d, acc="float32"):
    def body(carry, p, s, o, r, cg):
        def loss(p_, s_, o_):
            dens, col = gs.anisotropic_density_grid_pallas(
                p_, s_, r, d, point_weights=o_, rgb=cg, acc_dtype=acc
            )
            return dens.sum() + col.sum()

        gp, gs_, go = jax.grad(loss, argnums=(0, 1, 2))(
            p + carry * 1e-17, s, o
        )
        return carry + 1e-17, gp.sum() + gs_.sum() + go.sum()

    return body


if PART2:
    # --d64: only the D=64 shapes (post-fix re-measurement of the
    # round-3c compile cliff without re-paying the D=32 compiles)
    for d in ((64,) if "--d64" in sys.argv else (32, 64)):
        for acc in ("float32", "bfloat16"):
            run(f"pallas_fwd_d{d}_{acc}", pallas_fwd(d, acc),
                (pts, scales, opac, rot, rgb), iters=60)
            run(f"pallas_fb_d{d}_{acc}", pallas_fb(d, acc),
                (pts, scales, opac, rot, rgb), iters=30)
    run("dense_fb_d32", dense_fb(32), (pts, scales, opac), iters=10)
    # dense fwd at D=64 is safe (fwd-only); the fwd+bwd graph at D=64 is
    # the one that crashed the worker — gated behind --dense64.
    run("dense_fwd_d64", dense_fwd(64), (pts, scales, opac), iters=5)
    if DENSE64:
        run("dense_fb_d64_DANGER", dense_fb(64), (pts, scales, opac),
            iters=5)
