"""Pallas anisotropic-splat kernel vs the dense XLA oracle
(dpcx/render/gsplat.py::anisotropic_density_grid) — values and gradients
in interpret mode (conftest pins CPU). With a window radius covering the
whole grid the kernel's in-grid mass is EXACT (the z-window is the only
truncation), so the large-truncate tests compare at fp32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.render.gsplat import (
    anisotropic_density_grid,
    anisotropic_density_grid_pallas,
)

D = 16
B, N = 2, 256


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    pts = jax.random.uniform(ks[0], (B, N, 3), minval=-0.4, maxval=0.4)
    scales = jax.random.uniform(
        ks[1], (B, N, 3), minval=0.02, maxval=0.08
    )
    rot = jax.random.normal(ks[2], (B, N, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (B, N))
    rgb = jax.random.uniform(ks[4], (B, N, 3))
    return pts, scales, rot, opac, rgb


def test_forward_matches_dense_full_window():
    pts, scales, rot, opac, rgb = _inputs()
    d_ref, c_ref = anisotropic_density_grid(
        pts, scales, rot, D, point_weights=opac, rgb=rgb
    )
    d_p, c_p = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac, rgb=rgb,
        truncate=100.0, interpret=True,
    )
    np.testing.assert_allclose(d_p, d_ref, rtol=2e-5, atol=2e-5)
    # color grids compare where density is non-negligible (both sides
    # divide by a clamped density)
    mask = np.asarray(d_ref) > 1e-3
    np.testing.assert_allclose(
        np.asarray(c_p)[mask], np.asarray(c_ref)[mask],
        rtol=1e-4, atol=1e-4,
    )


def test_forward_truncate3_close():
    """3-sigma_z truncation drops <~1% of any point's mass."""
    pts, scales, rot, opac, rgb = _inputs(1)
    d_ref = anisotropic_density_grid(
        pts, scales, rot, D, point_weights=opac
    )
    d_p = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac, truncate=3.0,
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(d_p - d_ref))) < 0.02 * float(
        jnp.max(d_ref)
    )


def test_gradients_match_dense():
    pts, scales, rot, opac, rgb = _inputs(2)
    tgt_d = jax.random.uniform(jax.random.PRNGKey(9), (B, D, D, D))
    tgt_c = jax.random.uniform(
        jax.random.PRNGKey(10), (B, D, D, D, 3)
    )

    def loss(fn, p, s, o, r):
        dens, cols = fn(p, s, rot, D, point_weights=o, rgb=r)
        return jnp.mean((dens - tgt_d) ** 2) + jnp.mean(
            (cols - tgt_c) ** 2
        )

    def loss_p(p, s, o, r):
        return loss(
            lambda *a, **k: anisotropic_density_grid_pallas(
                *a, truncate=100.0, interpret=True, **k
            ),
            p, s, o, r,
        )

    def loss_ref(p, s, o, r):
        return loss(anisotropic_density_grid, p, s, o, r)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(pts, scales, opac, rgb)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pts, scales, opac, rgb)
    for a, b, name in zip(
        g_p, g_r, ("points", "scales", "opacity", "rgb")
    ):
        ref_n = float(jnp.linalg.norm(b)) + 1e-12
        rel = float(jnp.linalg.norm(a - b)) / ref_n
        assert rel < 2e-4, f"{name}: rel grad err {rel}"


def test_density_only_variant_matches_rgb_density():
    """rgb=None selects the 1-channel kernel (no color slabs / color
    cotangents): its density and gradients must equal the 4-channel
    variant's density exactly (same windows, same trips) and the dense
    oracle's at fp32 tolerance."""
    pts, scales, rot, opac, rgb = _inputs(4)
    d_only = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac,
        truncate=100.0, interpret=True,
    )
    d_rgb, _ = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac, rgb=rgb,
        truncate=100.0, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(d_only), np.asarray(d_rgb)
    )

    tgt_d = jax.random.uniform(jax.random.PRNGKey(11), (B, D, D, D))

    def loss_p(p, s, o):
        dens = anisotropic_density_grid_pallas(
            p, s, rot, D, point_weights=o,
            truncate=100.0, interpret=True,
        )
        return jnp.mean((dens - tgt_d) ** 2)

    def loss_ref(p, s, o):
        dens = anisotropic_density_grid(p, s, rot, D, point_weights=o)
        return jnp.mean((dens - tgt_d) ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(pts, scales, opac)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(pts, scales, opac)
    for a, b, name in zip(g_p, g_r, ("points", "scales", "opacity")):
        rel = float(jnp.linalg.norm(a - b)) / (
            float(jnp.linalg.norm(b)) + 1e-12
        )
        # 5e-4: fp32 raw-moment assembly noise at this seed (the seed-2
        # rgb-variant test sits at ~2e-4; same math, different draws)
        assert rel < 5e-4, f"{name}: rel grad err {rel}"


def test_nonmultiple_chunk_padding():
    """N not a multiple of the 128-lane chunk unit pads cleanly."""
    pts, scales, rot, opac, rgb = _inputs(3)
    n = 200
    d_ref = anisotropic_density_grid(
        pts[:, :n], scales[:, :n], rot[:, :n], D,
        point_weights=opac[:, :n],
    )
    d_p = anisotropic_density_grid_pallas(
        pts[:, :n], scales[:, :n], rot[:, :n], D,
        point_weights=opac[:, :n], truncate=100.0, interpret=True,
    )
    np.testing.assert_allclose(d_p, d_ref, rtol=2e-5, atol=2e-5)


def test_project_dispatch_pallas_gsplat():
    """cfg.gsplat_impl='pallas' renders through gsplat_project end to
    end (sil/rgb finite, grads flow to every input)."""
    from dpcx.config import Config
    from dpcx.render.gsplat import gsplat_project

    cfg = Config(
        vox_size=D, pc_num_points=N, pc_rgb=True, pc_gauss=True,
        gsplat_impl="pallas",
    )
    pts, scales, rot, opac, rgb = _inputs(4)
    quat = jax.random.normal(jax.random.PRNGKey(11), (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    scales_ndc = scales / D

    import dpcx.render.pallas_gsplat as pg
    import dpcx.render.gsplat as gs

    # interpret mode on CPU: patch the call the dispatch makes
    orig = gs.anisotropic_density_grid_pallas
    gs.anisotropic_density_grid_pallas = lambda *a, **k: orig(
        *a, **{**k, "interpret": True}
    )
    try:
        def loss(p, s, o, r):
            out = gsplat_project(cfg, p, quat, s, rot, o, r)
            return out.silhouette.sum() + out.rgb.sum()

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            pts, scales_ndc, opac, rgb
        )
        assert jnp.isfinite(val)
        for g in grads:
            assert jnp.all(jnp.isfinite(g))
            assert float(jnp.abs(g).max()) > 0
    finally:
        gs.anisotropic_density_grid_pallas = orig


def test_dp_scan_with_pallas_gsplat():
    """DP device-resident scan with pc_gauss + gsplat_impl='pallas' on
    the virtual CPU mesh — the multi-chip config-5 production path
    compiles and matches single-device (same first-compile-blocker class
    as DP x pallas, VERDICT r2 missing 5)."""
    from dpcx.config import Config
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.parallel.mesh import make_mesh
    from dpcx.train import (
        _device_records,
        create_state,
        train_steps_scan,
        train_steps_scan_dp,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    cfg = Config(
        vox_size=8, mask_size=8, pc_num_points=64, image_size=16,
        encoder_filters=(4,), latent_dim=16, fc_hidden=16,
        pc_decoder_hidden=(16,), num_views=2, views_per_step=2,
        batch_size=8, pc_point_dropout=1.0,
        pc_rgb=True, pc_gauss=True, gsplat_impl="pallas",
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=64), cfg)
    recs = _device_records(ds)
    key = jax.random.PRNGKey(3)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = train_steps_scan(cfg, s1, recs, key, 2)

    mesh = make_mesh(cfg)
    s2 = create_state(cfg, jax.random.PRNGKey(0))
    s2, m2 = train_steps_scan_dp(cfg, s2, recs, key, 2, mesh)

    assert np.isfinite(float(m2["loss_total"]))
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m2["loss_total"]), rtol=2e-3
    )


def test_bf16_acc_mode_close_to_f32():
    """bfloat16 perf mode (bf16 MXU operands, f32 accumulate) tracks the
    f32 parity mode within bf16 tolerance — the acc_dtype the production
    rgb_splats config trains with."""
    pts, scales, rot, opac, rgb = _inputs(5)
    d32, c32 = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac, rgb=rgb,
        truncate=100.0, acc_dtype="float32", interpret=True,
    )
    d16, c16 = anisotropic_density_grid_pallas(
        pts, scales, rot, D, point_weights=opac, rgb=rgb,
        truncate=100.0, acc_dtype="bfloat16", interpret=True,
    )
    ref = float(jnp.max(jnp.abs(d32))) + 1e-12
    assert float(jnp.max(jnp.abs(d16 - d32))) / ref < 2e-2


def test_d_above_32_dynamic_x_bound_matches_dense():
    """D > 32 routes the per-cell x loop through the SMEM-scalar bound
    (pallas_gsplat._x_hi) so Mosaic cannot unroll it — the compile fix
    for the round-3c 'D=64 bf16 fwd+bwd FAILS remote compile' cliff.
    Interpret-mode parity (values + grads) at D=40 pins that the dynamic
    bound computes exactly what the static bound does."""
    Dbig, n = 40, 128
    pts, scales, rot, opac, rgb = _inputs(6)
    pts, scales = pts[:1, :n], scales[:1, :n]
    rot, opac, rgb = rot[:1, :n], opac[:1, :n], rgb[:1, :n]

    d_ref, c_ref = anisotropic_density_grid(
        pts, scales, rot, Dbig, point_weights=opac, rgb=rgb
    )
    d_p, c_p = anisotropic_density_grid_pallas(
        pts, scales, rot, Dbig, point_weights=opac, rgb=rgb,
        truncate=100.0, interpret=True,
    )
    np.testing.assert_allclose(d_p, d_ref, rtol=2e-5, atol=2e-5)

    tgt_d = jax.random.uniform(
        jax.random.PRNGKey(12), (1, Dbig, Dbig, Dbig)
    )

    def loss(fn, p, s, o, r):
        dens, cols = fn(p, s, rot, Dbig, point_weights=o, rgb=r)
        return jnp.mean((dens - tgt_d) ** 2) + jnp.mean(cols**2)

    g_p = jax.grad(
        lambda *a: loss(
            lambda *b, **k: anisotropic_density_grid_pallas(
                *b, truncate=100.0, interpret=True, **k
            ),
            *a,
        ),
        argnums=(0, 1, 2, 3),
    )(pts, scales, opac, rgb)
    g_r = jax.grad(
        lambda *a: loss(anisotropic_density_grid, *a),
        argnums=(0, 1, 2, 3),
    )(pts, scales, opac, rgb)
    for a, b, name in zip(g_p, g_r, ("points", "scales", "opac", "rgb")):
        rel = float(jnp.linalg.norm(a - b)) / (
            float(jnp.linalg.norm(b)) + 1e-12
        )
        assert rel < 5e-4, f"{name}: rel grad err {rel}"
