"""tfrecord -> npz converter (dpcx/data/convert.py): round-trip fixtures
in the two plausible reference layouts (SURVEY.md §2.2 #16 [M] — the mount
was empty, so the converter is tolerant to naming/encoding variants and
these tests pin that tolerance)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dpcx.config import Config  # noqa: E402
from dpcx.data.convert import convert_tfrecords  # noqa: E402
from dpcx.data.dataset import load_external  # noqa: E402

V, H, DM = 3, 16, 8


def _floats(x):
    return tf.train.Feature(
        float_list=tf.train.FloatList(value=np.asarray(x, np.float32).ravel())
    )


def _ints(x):
    return tf.train.Feature(
        int64_list=tf.train.Int64List(value=np.asarray(x).ravel())
    )


def _bytes(vals):
    if not isinstance(vals, list):
        vals = [vals]
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=vals))


def _write(path, examples):
    with tf.io.TFRecordWriter(str(path)) as w:
        for ex in examples:
            w.write(ex.SerializeToString())


def _rand_views(rng):
    img = rng.random((V, H, H, 3)).astype(np.float32)
    mask = (rng.random((V, DM, DM)) > 0.5).astype(np.float32)
    depth = rng.random((V, DM, DM)).astype(np.float32)
    q = rng.normal(size=(V, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return img, mask, depth, q


def test_convert_float_features_roundtrip(tmp_path):
    """Layout A: flat float_list features + quaternion cameras."""
    rng = np.random.default_rng(0)
    exs = []
    wants = []
    for _ in range(2):
        img, mask, depth, q = _rand_views(rng)
        gt = rng.random((50, 3)).astype(np.float32)
        wants.append((img, mask, depth, q, gt))
        exs.append(
            tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "image": _floats(img),
                        "mask": _floats(mask),
                        "depth": _floats(depth),
                        "quaternion": _floats(q),
                        "gt_points": _floats(gt),
                        "num_views": _ints([V]),
                    }
                )
            )
        )
    _write(tmp_path / "a.tfrecord", exs)
    stats = convert_tfrecords(
        tmp_path / "a.tfrecord", tmp_path / "a.npz"
    )
    assert stats["models"] == 2 and stats["views"] == V

    cfg = Config(vox_size=DM, mask_size=DM, image_size=H, num_views=V)
    ds = load_external(tmp_path / "a.npz", cfg)
    assert ds.records["images"].shape == (2, V, H, H, 3)
    assert ds.records["masks"].shape == (2, V, DM, DM)
    np.testing.assert_allclose(ds.records["images"][0], wants[0][0])
    np.testing.assert_allclose(ds.records["quats"][1], wants[1][3])
    np.testing.assert_allclose(
        ds.records["gt_points"][0][:50], wants[0][4]
    )
    # a training batch samples cleanly from the converted data
    b = ds.batch(np.random.default_rng(0), 2)
    assert b["image"].shape == (2, H, H, 3)


def test_convert_png_and_matrix_cameras(tmp_path):
    """Layout B: PNG-encoded views, alternative names, 4x4 extrinsics ->
    quats via matrix_to_quaternion, mask resized to the grid size."""
    from dpcx.geometry.quaternion import (
        quaternion_normalize,
        quaternion_to_matrix,
    )

    rng = np.random.default_rng(1)
    img = (rng.random((V, H, H, 3)) * 255).astype(np.uint8)
    mask8 = (rng.random((V, H, H)) > 0.5).astype(np.uint8) * 255
    q = np.asarray(
        quaternion_normalize(rng.normal(size=(V, 4)).astype(np.float32))
    )
    m44 = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    m44[:, :3, :3] = np.asarray(quaternion_to_matrix(q))
    pngs = [tf.io.encode_png(img[v]).numpy() for v in range(V)]
    mask_pngs = [
        tf.io.encode_png(mask8[v][..., None]).numpy() for v in range(V)
    ]
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "rgb": _bytes(pngs),
                "silhouette": _bytes(mask_pngs),
                "extrinsics": _floats(m44),
                "num_views": _ints([V]),
            }
        )
    )
    _write(tmp_path / "b.tfrecord", [ex])
    stats = convert_tfrecords(
        tmp_path / "b.tfrecord", tmp_path / "b.npz", mask_size=DM
    )
    assert stats["models"] == 1 and stats["mask_size"] == DM

    cfg = Config(vox_size=DM, mask_size=DM, image_size=H, num_views=V)
    ds = load_external(tmp_path / "b.npz", cfg)
    assert ds.records["images"].shape == (1, V, H, H, 3)
    assert ds.records["masks"].shape == (1, V, DM, DM)
    np.testing.assert_allclose(
        ds.records["images"][0], img.astype(np.float32) / 255.0
    )
    # matrix -> quaternion recovery (up to sign)
    got = ds.records["quats"][0]
    dots = np.abs(np.sum(got * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_all_view_evaluate():
    """evaluate(view_idx=None) sweeps every view (reference predict_eval
    protocol) and pools num_models * num_views predictions."""
    import jax

    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.predict import evaluate
    from dpcx.train import create_state

    cfg = Config(
        vox_size=12, mask_size=12, pc_num_points=64, image_size=32,
        encoder_filters=(8,), latent_dim=32, fc_hidden=32,
        pc_decoder_hidden=(32,), num_views=2,
    )
    ds = Dataset(make_dataset(cfg, 2, seed=0, gt_points=128), cfg)
    st = create_state(cfg, jax.random.PRNGKey(0))
    m = evaluate(cfg, st.params, ds, view_idx=None, batch_size=2)
    assert np.isfinite(m["chamfer"])


def test_converted_data_trains(tmp_path):
    """Full real-data loop: tfrecord -> convert -> load_external -> two
    training steps (the reference's tfrecord-backed train path,
    SURVEY.md §2.2 #15/#16)."""
    import jax
    import jax.numpy as jnp

    from dpcx.train import create_state, train_step

    rng = np.random.default_rng(7)
    exs = []
    for _ in range(4):
        img, mask, depth, q = _rand_views(rng)
        exs.append(
            tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "image": _floats(img),
                        "mask": _floats(mask),
                        "depth": _floats(depth),
                        "quaternion": _floats(q),
                        "num_views": _ints([V]),
                    }
                )
            )
        )
    _write(tmp_path / "t.tfrecord", exs)
    convert_tfrecords(tmp_path / "t.tfrecord", tmp_path / "t.npz")
    cfg = Config(
        vox_size=DM, mask_size=DM, image_size=H, num_views=V,
        views_per_step=2, pc_num_points=32, encoder_filters=(8,),
        latent_dim=16, fc_hidden=16, pc_decoder_hidden=(16,),
        batch_size=2,
    )
    ds = load_external(tmp_path / "t.npz", cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    losses = []
    for step in range(2):
        batch = ds.batch(rng_np, cfg.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = train_step(cfg, state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))


def test_adversarial_foreign_writer_roundtrip(tmp_path):
    """Dress rehearsal (VERDICT r2 missing 3): a FOREIGN producer script
    (scripts/make_adversarial_tfrecords.py — PNG-encoded views, PNG
    grayscale masks at IMAGE resolution under 'silhouettes', 4x4
    extrinsics with a translation column under 'camera_mat', 'vertices'
    GT, no num_views feature) converts losslessly up to PNG quantization
    and camera quaternions survive the matrix round trip."""
    import subprocess
    import sys

    from dpcx.data.synthetic import make_dataset

    rec_path = tmp_path / "renders.tfrecord"
    r = subprocess.run(
        [
            sys.executable, "scripts/make_adversarial_tfrecords.py",
            "--out", str(rec_path), "--models", "2",
            "--image-size", "32", "--views", "3",
        ],
        capture_output=True, text=True,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": __import__("os").getcwd(),
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    convert_tfrecords(rec_path, tmp_path / "adv.npz", mask_size=16)

    cfg = Config(
        category="chair", image_size=32, mask_size=16, vox_size=16,
        num_views=3, texture_mode="lowfreq",
    )
    ds = load_external(tmp_path / "adv.npz", cfg)
    ref = make_dataset(
        cfg.replace(mask_size=32, vox_size=32), 2, seed=123,
        gt_points=1024,
    )
    q0, q1 = np.asarray(ref["quats"]), ds.records["quats"]
    assert np.abs(np.sum(q0 * q1, axis=-1)).min() > 1 - 1e-5
    assert (
        np.abs(np.asarray(ref["images"]) - ds.records["images"]).max()
        < 1 / 128
    )
    m_ref = (
        np.asarray(ref["masks"]).reshape(2, 3, 16, 2, 16, 2).mean((3, 5))
    )
    assert np.abs(m_ref - ds.records["masks"]).max() < 1 / 128
    assert ds.records["gt_points"].shape == (2, 1024, 3)
