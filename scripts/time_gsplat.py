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

import jax
import jax.numpy as jnp

import dpcx.render.gsplat as gs
from dpcx.utils.timing import bench_scan

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
            pts + carry * 1e-17, s, o
        )
        return carry + 1e-17, gp.sum() + gs_.sum() + go.sum()

    return body


def dense_fwd():
    def body(carry, p, s, o):
        dens, col = gs.anisotropic_density_grid(
            p + carry * 1e-17, s, rot, D, point_weights=o, rgb=rgb
        )
        return carry + 1e-17, dens.sum() + col.sum()

    return body


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
