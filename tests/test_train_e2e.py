"""End-to-end smoke (SURVEY.md §4 item 6): short train on a tiny synthetic
set; loss must decrease. Plus data-parallel step on the 8-device CPU mesh
(item 5) — the multi-device test without a cluster."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.parallel.mesh import make_mesh, shard_batch
from dpcx.train import _prep_batch, create_state, train_step

TINY = Config(
    vox_size=12,
    pc_num_points=128,
    image_size=32,
    encoder_filters=(8, 16, 32),
    latent_dim=64,
    fc_hidden=64,
    pc_decoder_hidden=(64, 64),
    views_per_step=2,
    num_views=3,
    batch_size=8,
    learning_rate=2e-3,
    pc_point_dropout=1.0,
    pc_relative_sigma=0.12,
    pc_relative_sigma_end=0.08,
    sigma_anneal_steps=60,
)


def _run_steps(cfg, n_steps, mesh=None):
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=512), cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(n_steps):
        batch = _prep_batch(ds.batch(rng, cfg.batch_size), cfg)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = train_step(cfg, state, batch, key)
        losses.append(float(metrics["loss_total"]))
    return losses


def test_train_loss_decreases():
    losses = _run_steps(TINY, 30)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_train_step_data_parallel_mesh():
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multi-device (forced-host) runtime")
    mesh = make_mesh(TINY)
    assert mesh.devices.size == n_dev
    losses = _run_steps(TINY, 3, mesh=mesh)
    assert all(np.isfinite(losses))


def test_dp_matches_single_device():
    """Same batch, sharded vs unsharded, must give the same loss/grads."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    cfg = TINY
    ds = Dataset(make_dataset(cfg, 2, seed=0, gt_points=256), cfg)
    rng = np.random.default_rng(0)
    batch = _prep_batch(ds.batch(rng, cfg.batch_size), cfg)
    key = jax.random.PRNGKey(1)
    mesh = make_mesh(cfg)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = train_step(cfg, s1, batch, key)
    s2 = create_state(cfg, jax.random.PRNGKey(0))
    s2, m2 = train_step(cfg, s2, shard_batch(batch, mesh), key)
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m2["loss_total"]), rtol=1e-4
    )


def test_predicted_pose_train_step():
    cfg = TINY.replace(predict_pose=True, pose_predict_num_candidates=2,
                       batch_size=4)
    losses = _run_steps(cfg, 3)
    assert all(np.isfinite(losses))


def test_pose_mechanisms_train_scan():
    """The round-4 gauge-lottery mechanisms (anchor regularizer + student
    warmup) run through the REAL device-resident scan train path — the
    path the TPU screening sweep uses (scripts/pose_r2.py)."""
    from dpcx.train import train

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=4,
        batch_size=4,
        pose_anchor_weight=1.0,
        pose_anchor_steps=20,
        pose_student_warmup_steps=10,
        pose_softmin_temp=1.0,
        pose_softmin_steps=20,
        pose_consistency_weight=0.1,
        device_data=True,
        log_every=2,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    _, hist = train(cfg, dataset=ds, max_steps=6, use_checkpoints=False)
    assert hist, "no logged history"
    for h in hist:
        assert np.isfinite(h["loss_total"])
    assert "loss_anchor" in hist[-1]
    assert np.isfinite(hist[-1]["loss_anchor"])
    assert "sel_entropy" in hist[-1]
    assert np.isfinite(hist[-1]["sel_entropy"])
    assert "loss_consistency" in hist[-1]
    assert np.isfinite(hist[-1]["loss_consistency"])


def test_periodic_eval_during_train(tmp_path):
    cfg = TINY.replace(
        eval_every=2, batch_size=4, checkpoint_dir=str(tmp_path)
    )
    ds = Dataset(make_dataset(cfg, 2, seed=0, gt_points=256), cfg)
    ev = Dataset(make_dataset(cfg, 2, seed=9, gt_points=256), cfg)
    from dpcx.train import train

    _, hist = train(
        cfg, dataset=ds, max_steps=4, use_checkpoints=False,
        eval_dataset=ev,
    )
    assert any("val_chamfer" in h for h in hist)


def test_dp_scan_matches_single_device_scan():
    """Device-resident scan under an 8-device DP mesh == single-device
    scan, step for step (VERDICT round-1 item 3): every device samples
    the same global batch and takes a slice, so the pmean'd gradient is
    the full-batch gradient."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.data.synthetic import make_dataset as _mk
    from dpcx.train import (
        _device_records,
        train_steps_scan,
        train_steps_scan_dp,
    )

    cfg = TINY  # pc_point_dropout=1.0: dropout off, exact parity holds
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    recs = _device_records(ds)
    key = jax.random.PRNGKey(3)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = train_steps_scan(cfg, s1, recs, key, 4)

    mesh = make_mesh(cfg)
    assert mesh.devices.size >= 2
    s2 = create_state(cfg, jax.random.PRNGKey(0))
    s2, m2 = train_steps_scan_dp(cfg, s2, recs, key, 4, mesh)

    # pmean reduction order differs from the full-batch sum and the nets
    # run bf16 compute, so tolerances are loose — a wrong DP reduction
    # would diverge by orders of magnitude, not fractions of a percent
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m2["loss_total"]), rtol=2e-3
    )
    # params track the single-device trajectory (Adam's g/sqrt(v)
    # amplifies the reduction noise early)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_device_resident_dp_loop_learns(tmp_path):
    """train() end-to-end on the DP mesh with device_data=True takes the
    scan_dp path and the loss decreases."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.train import train

    cfg = TINY.replace(
        batch_size=8, device_data=True, log_every=5,
        checkpoint_dir=str(tmp_path),
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=512), cfg)
    mesh = make_mesh(cfg)
    _, hist = train(
        cfg, dataset=ds, max_steps=30, mesh=mesh, use_checkpoints=False
    )
    losses = [h["loss_total"] for h in hist if "loss_total" in h]
    assert len(losses) >= 3
    assert losses[-1] < losses[0] * 0.9


def test_device_resident_loop_learns(tmp_path):
    """train_steps_scan path (single-device mesh): loss decreases."""
    from dpcx.parallel.mesh import make_mesh
    from dpcx.train import train

    cfg = TINY.replace(
        batch_size=8, device_data=True, log_every=5,
        checkpoint_dir=str(tmp_path),
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=512), cfg)
    mesh = make_mesh(cfg, devices=jax.devices()[:1])
    _, hist = train(
        cfg, dataset=ds, max_steps=30, mesh=mesh, use_checkpoints=False
    )
    losses = [h["loss_total"] for h in hist if "loss_total" in h]
    assert len(losses) >= 3
    assert losses[-1] < losses[0] * 0.9

def test_dp_scan_with_pallas_renderer():
    """DP device-resident scan with the FUSED PALLAS renderer (interpret
    mode on the CPU mesh): the production multi-chip config compiles and
    matches the single-device scan (VERDICT r2 missing 5 — this
    combination previously ran for the first time on real hardware)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device runtime")
    from dpcx.train import (
        _device_records,
        train_steps_scan,
        train_steps_scan_dp,
    )

    cfg = TINY.replace(
        vox_size=16,  # pallas dispatch needs D % 8 == 0
        mask_size=16,
        renderer="pallas",
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    recs = _device_records(ds)
    key = jax.random.PRNGKey(3)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = train_steps_scan(cfg, s1, recs, key, 3)

    mesh = make_mesh(cfg)
    assert mesh.devices.size >= 2
    s2 = create_state(cfg, jax.random.PRNGKey(0))
    s2, m2 = train_steps_scan_dp(cfg, s2, recs, key, 3, mesh)

    assert np.isfinite(float(m2["loss_total"]))
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m2["loss_total"]), rtol=2e-3
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(a, b, atol=5e-3)

def test_block_rotation_trains_and_resumes_reproducibly():
    """Big-dataset path: device_records_models rotates model blocks
    through device memory between scan chunks (VERDICT r2 missing 6).
    The rotation sequence is a pure function of (seed, step): training
    3+3 steps through a restart replays the 6-step run exactly, across
    a block boundary."""
    import tempfile

    from dpcx.train import train

    with tempfile.TemporaryDirectory() as td:
        def run(name, stops):
            cfg = TINY.replace(
                checkpoint_dir=f"{td}/{name}",
                num_views=2,
                views_per_step=2,
                batch_size=2,
                device_records_models=3,  # dataset has 6 models
                block_rotate_chunks=1,    # rotate every chunk
                log_every=2,
                save_every=3,
                pc_point_dropout=1.0,
            )
            ds = Dataset(make_dataset(cfg, 6, seed=0, gt_points=64), cfg)
            state = None
            for s in stops:
                state, hist = train(cfg, dataset=ds, max_steps=s)
            return state, hist

        s1, h1 = run("straight", [6])
        s2, _ = run("resumed", [3, 6])
        assert int(s1.step) == int(s2.step) == 6
        assert all(np.isfinite(h["loss_total"]) for h in h1)
        for a, b in zip(
            jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_dir_captures_trace(tmp_path):
    """cfg.profile_dir traces exactly one post-compile chunk (SURVEY §5
    tracing row) and writes an xplane dump; training output unchanged.

    Runs in a SUBPROCESS: the TSL profiler session is process-global, and
    starting a trace late in a pytest process that has already compiled
    ~100 executables across 15 test modules segfaults inside
    backend_compile_and_load (jaxlib bug, full-suite-only — every <=5-file
    combination passes). A fresh process is also how cfg.profile_dir is
    used in practice (one-shot capture at run start)."""
    import os
    import subprocess
    import sys

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train

cfg = Config(
    vox_size=12, pc_num_points=128, image_size=32,
    encoder_filters=(8, 16, 32), latent_dim=64, fc_hidden=64,
    pc_decoder_hidden=(64, 64), views_per_step=2, num_views=3,
    batch_size=8, pc_point_dropout=1.0,
    profile_dir={str(tmp_path / "trace")!r},
    log_every=2, max_number_of_steps=6,
)
ds = Dataset(make_dataset(cfg, 4, seed=0), cfg)
_, hist = train(cfg, dataset=ds, use_checkpoints=False)
assert hist and hist[-1]["step"] == 6, hist[-1:]
print("TRAIN_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
        cwd=os.getcwd(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "TRAIN_OK" in proc.stdout
    dumps = [
        os.path.join(r, f)
        for r, _, fs in os.walk(tmp_path / "trace")
        for f in fs
        if f.endswith(".xplane.pb")
    ]
    assert dumps, "no xplane trace written"


def test_pose_from_views_train_scan():
    """Mechanism (f) through the REAL device-resident scan train path
    (the path the TPU screening sweep uses): per-view pose heads, the
    per-(sample, view) hard-min, and the per-view student all train,
    and the student/proj losses stay finite."""
    from dpcx.train import train

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=4,
        batch_size=4,
        pose_from_views=True,
        device_data=True,
        log_every=2,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    _, hist = train(cfg, dataset=ds, max_steps=6, use_checkpoints=False)
    assert hist, "no logged history"
    for h in hist:
        assert np.isfinite(h["loss_total"])
    assert "loss_student" in hist[-1]
    assert np.isfinite(hist[-1]["loss_student"])


def test_gauge_reseed_restarts_on_detected_failure():
    """Auto-reseed (finding 21 detector): an untrained pfv run has a
    large gauge_spread_deg, so a tight threshold must trigger a re-init
    at the check step (history carries the gauge_reseed record, the step
    counter restarts, training still reaches max_steps), while a loose
    threshold must never fire."""
    from dpcx.train import train

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=2,
        batch_size=4,
        pose_from_views=True,
        device_data=True,
        log_every=2,
        gauge_reseed_threshold_deg=1.0,  # untrained spread is ~50 deg
        gauge_reseed_check_step=4,
        gauge_reseed_max_retries=1,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    _, hist = train(cfg, dataset=ds, max_steps=8, use_checkpoints=False)
    reseeds = [h for h in hist if "gauge_reseed" in h]
    assert len(reseeds) == 1, hist
    assert reseeds[0]["gauge_spread_deg"] > 1.0
    # the run restarted and still completed: post-reseed steps go 0 -> 8
    assert hist[-1]["step"] == 8 and np.isfinite(hist[-1]["loss_total"])
    # max_retries exhausted -> the second attempt is never re-rolled
    steps_after = [h["step"] for h in hist[hist.index(reseeds[0]) + 1:]]
    assert steps_after == sorted(steps_after)
    # loose threshold: never fires
    cfg2 = cfg.replace(gauge_reseed_threshold_deg=179.0)
    _, hist2 = train(cfg2, dataset=ds, max_steps=6, use_checkpoints=False)
    assert not [h for h in hist2 if "gauge_reseed" in h]


def test_pose_from_views_host_fed_matches_keys():
    """The host-fed path builds the same pose_from_views batch fields as
    the device-resident sampler (images_v per target view, image_in2 for
    the consistency term)."""
    cfg = TINY.replace(
        predict_pose=True,
        pose_from_views=True,
        pose_consistency_weight=0.1,
        batch_size=4,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    import numpy as _np

    b = ds.batch(_np.random.default_rng(0), 4)
    V_use = min(cfg.views_per_step, ds.num_views)
    assert b["images_v"].shape == (
        4, V_use, cfg.image_size, cfg.image_size, 3
    )
    assert b["image_in2"].shape == (
        4, cfg.image_size, cfg.image_size, 3
    )
    # image_in2 is a DIFFERENT view of the same model than image
    assert not _np.allclose(b["image_in2"], b["image"])
    from dpcx.train import _prep_batch

    pb = _prep_batch(b, cfg)
    assert "images_v" in pb and "image_in2" in pb


def test_pose_from_views_composes_with_other_mechanisms():
    """The phase-7 candidate combo — pose_from_views x azimuth anchor x
    cross-view consistency x K offsets — trains through the device-
    resident scan (insurance before the TPU combo run burns a window)."""
    from dpcx.train import train

    cfg = TINY.replace(
        predict_pose=True,
        pose_predict_num_candidates=4,
        batch_size=4,
        pose_from_views=True,
        pose_anchor_weight=1.0,
        pose_anchor_steps=20,
        pose_anchor_mode="azimuth",
        pose_consistency_weight=0.1,
        device_data=True,
        log_every=2,
    )
    ds = Dataset(make_dataset(cfg, 4, seed=0, gt_points=256), cfg)
    _, hist = train(cfg, dataset=ds, max_steps=6, use_checkpoints=False)
    for h in hist:
        assert np.isfinite(h["loss_total"])
    m = hist[-1]
    for k in ("loss_anchor", "loss_consistency", "loss_student"):
        assert k in m and np.isfinite(m[k]), k
