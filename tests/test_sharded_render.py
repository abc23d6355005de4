"""Point-sharded renderer == unsharded renderer on the 8-device CPU mesh
(SURVEY.md §4 item 5, §2.3 point/grid sharding lever): values, depth,
rgb, GRADIENTS through the psum, and the large-cloud loss path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.config import Config
from dpcx.parallel.mesh import make_mesh
from dpcx.render.project import pointcloud_project
from dpcx.render.sharded import (
    gt_pose_projection_loss_sharded,
    pointcloud_project_point_sharded,
)

CFG = Config(vox_size=12, pc_relative_sigma=0.1)


def _inputs(n_dev, B=2, per_dev=16, key=0):
    N = per_dev * n_dev
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    pts = jax.random.uniform(k1, (B, N, 3), minval=-0.4, maxval=0.4)
    rgb = jax.random.uniform(k2, (B, N, 3))
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
    return pts, rgb, quat


def test_point_sharded_matches_unsharded():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    mesh = make_mesh(CFG)
    pts, _, quat = _inputs(mesh.devices.size)
    sigma = jnp.asarray(0.1)
    sharded = pointcloud_project_point_sharded(CFG, mesh, pts, quat, sigma)
    ref = pointcloud_project(CFG, pts, quat, sigma).silhouette
    np.testing.assert_allclose(sharded.silhouette, ref, atol=1e-5)


def test_point_sharded_depth_rgb_and_weights_match():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    cfg = CFG.replace(proj_depth=True, pc_rgb=True)
    mesh = make_mesh(cfg)
    pts, rgb, quat = _inputs(mesh.devices.size)
    pw = jnp.linspace(0.2, 1.0, pts.shape[1])[None, :].repeat(2, axis=0)
    sigma = jnp.asarray(0.1)
    out = pointcloud_project_point_sharded(
        cfg, mesh, pts, quat, sigma, point_weights=pw, rgb=rgb
    )
    ref = pointcloud_project(
        cfg, pts, quat, sigma, point_weights=pw, rgb=rgb, splat="matmul"
    )
    np.testing.assert_allclose(out.silhouette, ref.silhouette, atol=1e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4)
    np.testing.assert_allclose(out.rgb, ref.rgb, atol=1e-4)


def test_point_sharded_grads_match_unsharded():
    """jax.grad differentiates THROUGH the psum: sharded gradient wrt
    points and rgb equals the unsharded gradient (VERDICT r2 weak 3 —
    previously forward-only)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    cfg = CFG.replace(pc_rgb=True)
    mesh = make_mesh(cfg)
    pts, rgb, quat = _inputs(mesh.devices.size)
    sigma = jnp.asarray(0.1)
    tgt = jax.random.uniform(jax.random.PRNGKey(5), (2, 12, 12))

    def loss_sharded(p, r):
        out = pointcloud_project_point_sharded(
            cfg, mesh, p, quat, sigma, rgb=r
        )
        return (
            jnp.mean((out.silhouette - tgt) ** 2) + jnp.mean(out.rgb**2)
        )

    def loss_ref(p, r):
        out = pointcloud_project(
            cfg, p, quat, sigma, rgb=r, splat="matmul"
        )
        return (
            jnp.mean((out.silhouette - tgt) ** 2) + jnp.mean(out.rgb**2)
        )

    gs = jax.grad(loss_sharded, argnums=(0, 1))(pts, rgb)
    gr = jax.grad(loss_ref, argnums=(0, 1))(pts, rgb)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_large_cloud_loss_path_optimizes():
    """The loss path this renderer exists for: directly optimize a cloud
    too large to want on one device (N = 131072 across the mesh) against
    target masks; the loss must decrease through sharded render + psum."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    cfg = Config(vox_size=16, pc_relative_sigma=0.08)
    mesh = make_mesh(cfg)
    n_dev = mesh.devices.size
    N = (131072 // n_dev) * n_dev
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (1, N, 3), minval=-0.45, maxval=0.45
    )
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    sigma = jnp.asarray(0.08)
    # target: everything inside a centered disk
    yy, xx = jnp.meshgrid(jnp.arange(16), jnp.arange(16), indexing="ij")
    masks = (
        ((yy - 7.5) ** 2 + (xx - 7.5) ** 2) < 36.0
    ).astype(jnp.float32)[None]

    # density normalization: 131k points saturate a 16^3 grid's DRC
    # occupancy (~32 mass/cell -> silhouette == 1, zero gradient); weight
    # so the mean cell mass is O(1)
    pw = jnp.full((1, N), 16.0**3 / N * 2.0)

    loss_fn = jax.jit(
        jax.value_and_grad(
            lambda p: gt_pose_projection_loss_sharded(
                cfg, mesh, p, quat, masks, sigma, point_weights=pw
            )
        )
    )
    losses = []
    for _ in range(8):
        val, g = loss_fn(pts)
        losses.append(float(val))
        pts = pts - 0.2 * g * N  # mean-loss grad is O(1/N) per point
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_sharded_sum_projection_modes():
    """proj_type='sum' parity for BOTH sharded renderers — including the
    sum+proj_depth=True combination that used to crash the point-sharded
    path (the None-depth guard tested cfg.proj_depth instead of the
    returned depth)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.render.sharded import pointcloud_project_grid_sharded

    cfg = CFG.replace(proj_type="sum", proj_depth=True)
    mesh = make_mesh(cfg)
    pts, _, quat = _inputs(mesh.devices.size)
    sigma = jnp.asarray(0.1)
    out = pointcloud_project_point_sharded(cfg, mesh, pts, quat, sigma)
    ref = pointcloud_project(cfg, pts, quat, sigma, splat="matmul")
    np.testing.assert_allclose(out.silhouette, ref.silhouette, atol=1e-5)

    cfg_g = Config(
        vox_size=24, proj_type="sum",
        pc_relative_sigma=0.05, pc_relative_sigma_end=0.05,
    )
    pts24, _, quat24 = _inputs(mesh.devices.size, B=2, per_dev=24, key=3)
    sig = jnp.asarray(0.05)
    out_g = pointcloud_project_grid_sharded(
        cfg_g, mesh, pts24, quat24, sig
    )
    ref_g = pointcloud_project(cfg_g, pts24, quat24, sig, splat="matmul")
    np.testing.assert_allclose(
        out_g.silhouette, ref_g.silhouette, atol=1e-5
    )


def test_grid_sharded_matches_unsharded():
    """GRID sharding (z-block per device + halo blur + blockwise DRC over
    all_gather'd transmittances): silhouette, depth, and gradients match
    the single-device renderer; no device ever holds a D^3 grid."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.render.sharded import pointcloud_project_grid_sharded

    cfg = Config(
        vox_size=24, proj_depth=True,
        pc_relative_sigma=0.05, pc_relative_sigma_end=0.05,
    )
    mesh = make_mesh(cfg)
    pts, _, quat = _inputs(mesh.devices.size, B=2, per_dev=24, key=3)
    sigma = jnp.asarray(0.05)
    pw = jnp.linspace(0.3, 1.0, pts.shape[1])[None].repeat(2, axis=0)

    out = pointcloud_project_grid_sharded(
        cfg, mesh, pts, quat, sigma, point_weights=pw
    )
    ref = pointcloud_project(
        cfg, pts, quat, sigma, point_weights=pw, splat="matmul"
    )
    np.testing.assert_allclose(out.silhouette, ref.silhouette, atol=1e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4)

    tgt = jax.random.uniform(jax.random.PRNGKey(6), (2, 24, 24))

    def loss_g(p):
        o = pointcloud_project_grid_sharded(cfg, mesh, p, quat, sigma)
        return jnp.mean((o.silhouette - tgt) ** 2)

    def loss_r(p):
        o = pointcloud_project(cfg, p, quat, sigma, splat="matmul")
        return jnp.mean((o.silhouette - tgt) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_g)(pts)),
        np.asarray(jax.grad(loss_r)(pts)),
        atol=2e-5,
    )


def test_grid_sharded_rgb_and_logsum_match_unsharded():
    """Grid-sharded rgb path + drc_logsum mode (VERDICT r3 weak 6): the
    blockwise transmittance composition is exact in BOTH drc modes, and
    the raw-normalized blockwise color equals the unsharded rgb
    projection."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.render.sharded import pointcloud_project_grid_sharded

    mesh = make_mesh(CFG)
    pts, rgb, quat = _inputs(mesh.devices.size, B=2, per_dev=24, key=3)
    sigma = jnp.asarray(0.05)
    pw = jnp.linspace(0.3, 1.0, pts.shape[1])[None].repeat(2, axis=0)
    for logsum in (False, True):
        cfg = Config(
            vox_size=24, proj_depth=True, drc_logsum=logsum,
            pc_relative_sigma=0.05, pc_relative_sigma_end=0.05,
        )
        out = pointcloud_project_grid_sharded(
            cfg, mesh, pts, quat, sigma, point_weights=pw, rgb=rgb
        )
        ref = pointcloud_project(
            cfg, pts, quat, sigma, point_weights=pw, rgb=rgb,
            splat="matmul",
        )
        np.testing.assert_allclose(
            out.silhouette, ref.silhouette, atol=1e-5, err_msg=f"{logsum}"
        )
        np.testing.assert_allclose(
            out.depth, ref.depth, atol=1e-4, err_msg=f"{logsum}"
        )
        np.testing.assert_allclose(
            out.rgb, ref.rgb, atol=1e-4, err_msg=f"{logsum}"
        )
    # grads through the rgb path (logsum mode)
    cfg = Config(
        vox_size=24, drc_logsum=True,
        pc_relative_sigma=0.05, pc_relative_sigma_end=0.05,
    )

    def loss_g(p, r):
        o = pointcloud_project_grid_sharded(
            cfg, mesh, p, quat, sigma, rgb=r
        )
        return jnp.mean(o.silhouette**2) + jnp.mean(o.rgb**2)

    def loss_r(p, r):
        o = pointcloud_project(cfg, p, quat, sigma, rgb=r, splat="matmul")
        return jnp.mean(o.silhouette**2) + jnp.mean(o.rgb**2)

    gs = jax.grad(loss_g, argnums=(0, 1))(pts, rgb)
    gr = jax.grad(loss_r, argnums=(0, 1))(pts, rgb)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_shard_points_training_surface():
    """cfg.shard_points routes the GT-pose loss through the point-sharded
    renderer (VERDICT r3 weak 5: the knob + YAML surface): loss and grads
    match the unsharded config, and train() selects a trivial outer mesh
    so the batch stays replicated."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    import dpcx.train as T
    from dpcx.models.losses import compute_loss

    n_dev = len(jax.devices())
    cfg0 = Config(
        vox_size=12, pc_num_points=16 * n_dev, image_size=32,
        encoder_filters=(8, 16), latent_dim=32, fc_hidden=32,
        pc_decoder_hidden=(32,), views_per_step=2, num_views=2,
        batch_size=2, pc_point_dropout=1.0, xla_splat="matmul",
    )
    cfg1 = cfg0.replace(shard_points=True)
    B, N, V, D = 2, cfg0.pc_num_points, 2, 12
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (B, N, 3), minval=-0.4, maxval=0.4)
    batch = {
        "image": jax.random.uniform(key, (B, 32, 32, 3)),
        "masks": (jax.random.uniform(key, (B, V, D, D)) > 0.7).astype(
            jnp.float32
        ),
        "depths": jnp.zeros((B, V, D, D)),
        "quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, V, 1)),
        "quat_in": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1)),
    }

    def loss(cfg, p):
        t, _ = compute_loss(
            cfg, {"points": p}, batch, jnp.asarray(0),
            jax.random.PRNGKey(1),
        )
        return t

    l0, g0 = jax.value_and_grad(lambda p: loss(cfg0, p))(points)
    l1, g1 = jax.value_and_grad(lambda p: loss(cfg1, p))(points)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=2e-6)

    # train() with shard_points: trivial outer mesh, steps run, loss finite
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset

    ds = Dataset(make_dataset(cfg1, 2, seed=0, gt_points=128), cfg1)
    _, hist = T.train(
        cfg1, dataset=ds, max_steps=2, use_checkpoints=False
    )
    assert np.isfinite(hist[-1]["loss_total"])

    # the demo YAML parses and carries the knob
    from dpcx.config import load_config

    y = load_config("experiments/largecloud_pointshard.yaml")
    assert y.shard_points and y.pc_num_points == 131072
