"""Synthetic datagen + dataset reader tests (SURVEY.md §4 item 6 fixtures)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.data.dataset import Dataset, load_shards, save_shards
from dpcx.data.synthetic import (
    CATEGORIES,
    make_dataset,
    make_model,
    sample_category_points,
)

CFG = Config(vox_size=12, image_size=32, num_views=3, views_per_step=2)


def test_category_points_in_box():
    for cat in CATEGORIES:
        pts = sample_category_points(jax.random.PRNGKey(0), cat, 500)
        assert pts.shape == (500, 3)
        assert float(jnp.abs(pts).max()) <= 0.55, cat


def test_make_model_record():
    rec = make_model(jax.random.PRNGKey(1), CFG, "chair", gt_points=800)
    V, D, H = CFG.num_views, CFG.vox_size, CFG.image_size
    assert rec["images"].shape == (V, H, H, 3)
    assert rec["masks"].shape == (V, D, D)
    assert rec["depths"].shape == (V, D, D)
    assert rec["quats"].shape == (V, 4)
    # masks are binary and non-trivial
    m = np.asarray(rec["masks"])
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert 0.01 < m.mean() < 0.9
    # images normalized
    assert float(rec["images"].max()) <= 1.0 + 1e-5


def test_dataset_batching_and_io(tmp_path):
    records = make_dataset(CFG, 3, seed=0, gt_points=400)
    ds = Dataset(records, CFG)
    rng = np.random.default_rng(0)
    b = ds.batch(rng, 4)
    assert b["image"].shape == (4, CFG.image_size, CFG.image_size, 3)
    assert b["masks"].shape == (4, CFG.views_per_step, CFG.vox_size,
                                CFG.vox_size)
    assert b["quat_in"].shape == (4, 4)

    p = tmp_path / "shard.npz"
    save_shards(records, p)
    loaded = load_shards(p)
    np.testing.assert_allclose(loaded["masks"], np.asarray(records["masks"]))

    eb = ds.eval_batch(np.asarray([0, 1]))
    assert eb["gt_points"].shape == (2, 400, 3)


def test_datagen_deterministic():
    r1 = make_model(jax.random.PRNGKey(7), CFG, "car", gt_points=200)
    r2 = make_model(jax.random.PRNGKey(7), CFG, "car", gt_points=200)
    np.testing.assert_allclose(r1["masks"], r2["masks"])


def test_multi_category_dataset():
    records = make_dataset(CFG, 4, seed=0, category="multi", gt_points=200)
    assert "category_idx" in records
    idx = np.asarray(records["category_idx"])
    assert set(idx.tolist()) == {0, 1, 2}  # cycles chair/car/airplane + wrap
    from dpcx.data.dataset import Dataset

    ds = Dataset(records, CFG)
    b = ds.batch(np.random.default_rng(0), 3)
    assert b["image"].shape[0] == 3


def test_car_asym_breaks_mirror_mode():
    """The car_asym control category (POSE_RESULTS findings 8-9): its
    rear-set cab must make the 180-deg azimuth mirror mode — the gauge
    that dominates car pose errors — substantially more visible in
    silhouette than the near-symmetric sedan, at or near the level of
    the robustly-lockable chair."""
    from dpcx.geometry.camera import camera_from_view_angles
    from dpcx.render.project import pointcloud_project_fn

    cfg = Config(vox_size=32, pc_num_points=1000)

    def mirror_residual(cat):
        rels = []
        for seed in range(2):
            pts = sample_category_points(jax.random.PRNGKey(seed), cat, 1000)
            for az in (0.3, 1.0, 2.0):
                q0, _ = camera_from_view_angles(jnp.asarray(az),
                                                jnp.asarray(0.3))
                q1, _ = camera_from_view_angles(jnp.asarray(az + jnp.pi),
                                                jnp.asarray(0.3))
                s0 = pointcloud_project_fn(
                    cfg, pts[None], q0[None], jnp.asarray(0.02)
                ).silhouette
                s1 = pointcloud_project_fn(
                    cfg, pts[None], q1[None], jnp.asarray(0.02)
                ).silhouette
                d = float(jnp.abs(s0 - s1[:, :, ::-1]).mean())
                rels.append(d / float(jnp.abs(s0).mean()))
        return float(np.mean(rels))

    car, asym = mirror_residual("car"), mirror_residual("car_asym")
    assert asym > car * 1.15, (car, asym)


def test_load_external_shards(tmp_path):
    """External npz ingestion (real-data path) concatenates shards and
    fills optional fields."""
    from dpcx.data.dataset import load_external

    r1 = make_dataset(CFG, 2, seed=0, gt_points=100)
    r2 = make_dataset(CFG, 2, seed=1, gt_points=100)
    # simulate external shards without depths/gt
    for i, r in enumerate([r1, r2]):
        slim = {k: np.asarray(v) for k, v in r.items()
                if k in ("images", "masks", "quats")}
        save_shards(slim, tmp_path / f"shard_{i}.npz")
    ds = load_external(tmp_path / "shard_*.npz", CFG)
    assert ds.num_models == 4
    b = ds.batch(np.random.default_rng(0), 3)
    assert b["image"].shape[0] == 3


def test_multihost_datagen_sharding():
    """Each simulated host generates the strided slice p::P of the model
    list with the SAME per-model keys as one host (SURVEY.md §5: datagen
    sharded over jax.process_index) — host shards interleave back to the
    single-host dataset exactly."""
    cfg = Config(
        vox_size=8, mask_size=8, pc_num_points=32, image_size=16,
        num_views=2,
    )
    from dpcx.data.synthetic import make_dataset as mk

    full = mk(cfg, 4, seed=3, gt_points=64)
    p0 = mk(cfg, 4, seed=3, gt_points=64, process_index=0, process_count=2)
    p1 = mk(cfg, 4, seed=3, gt_points=64, process_index=1, process_count=2)
    for k in full:
        np.testing.assert_allclose(np.asarray(full[k][0::2]),
                                   np.asarray(p0[k]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(full[k][1::2]),
                                   np.asarray(p1[k]), atol=1e-6)


def test_lowfreq_texture_mode():
    """texture_mode='lowfreq': two-tone front/back albedo, <1 cycle across
    the object, so the color signal SURVIVES a resize to mask resolution
    (the round-2 stripes aliased away at D=32 — VERDICT r2 item 2)."""
    cfg = CFG.replace(texture_mode="lowfreq")
    rec = make_model(jax.random.PRNGKey(1), cfg, "car", gt_points=800)
    rec_s = make_model(jax.random.PRNGKey(1), CFG, "car", gt_points=800)
    img = np.asarray(rec["images"])
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5
    # geometry (masks/depths) is texture-independent
    np.testing.assert_allclose(rec["masks"], rec_s["masks"])
    assert np.abs(img - np.asarray(rec_s["images"])).max() > 0.05
    # the two-tone signal survives downsampling to mask resolution: the
    # foreground of the 32x32 image is far from monochrome
    img32 = np.asarray(
        jax.image.resize(
            rec["images"], (CFG.num_views, 32, 32, 3), "bilinear"
        )
    )
    fg = img32[img32.min(axis=-1) < 0.85]  # non-white-background pixels
    assert fg.shape[0] > 20
    assert fg.std(axis=0).max() > 0.05
