"""Config system tests (ref parity: app_config defaults + YAML merge)."""

import pytest

from dpcx.config import Config, load_config, save_config


def test_defaults():
    cfg = load_config()
    assert cfg.pc_num_points == 8000
    assert cfg.vox_size == 64


def test_yaml_override(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("vox_size: 32\npc_num_points: 4000\nname: test\n")
    cfg = load_config(p)
    assert cfg.vox_size == 32
    assert cfg.pc_num_points == 4000
    assert cfg.learning_rate == 1e-4  # default preserved


def test_kwarg_override_wins(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("vox_size: 32\n")
    cfg = load_config(p, vox_size=16)
    assert cfg.vox_size == 16


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("not_a_flag: 1\n")
    with pytest.raises(ValueError, match="not_a_flag"):
        load_config(p)


def test_tuple_fields_from_yaml(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("encoder_filters: [8, 16]\n")
    cfg = load_config(p)
    assert cfg.encoder_filters == (8, 16)


def test_roundtrip(tmp_path):
    cfg = Config(vox_size=32, name="rt")
    p = tmp_path / "saved.yaml"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_shipped_experiments_load():
    import pathlib

    for f in pathlib.Path("experiments").glob("*.yaml"):
        cfg = load_config(f)
        assert cfg.name, f


def test_shipped_experiments_validate():
    import pathlib

    for f in pathlib.Path("experiments").glob("*.yaml"):
        load_config(f).validate()


def test_validate_traps():
    """Config.validate() rejects knob combinations a code path would
    otherwise silently ignore (VERDICT r4 item 4)."""
    # shard_points is GT-pose only (losses.py routes the predicted-pose
    # branch unsharded)
    with pytest.raises(ValueError, match="shard_points"):
        Config(shard_points=True, predict_pose=True).validate()
    # the gsplat branch precedes the shard_points branch in the loss
    with pytest.raises(ValueError, match="pc_gauss"):
        Config(shard_points=True, pc_gauss=True).validate()
    # pose mechanisms are dead knobs without the pose head
    for kw in (
        {"pose_from_views": True},
        {"predict_translation": True},
        {"pose_anchor_weight": 1.0},
        {"pose_softmin_temp": 0.5},
        {"pose_consistency_weight": 0.1},
    ):
        with pytest.raises(ValueError, match="predict_pose"):
            Config(**kw).validate()
    # consistency needs a second view per model
    with pytest.raises(ValueError, match="num_views"):
        Config(
            predict_pose=True,
            pose_consistency_weight=0.1,
            num_views=1,
        ).validate()
    # the gauge-reseed detector reads a metric only pfv emits
    with pytest.raises(ValueError, match="pose_from_views"):
        Config(
            predict_pose=True, gauge_reseed_threshold_deg=45.0
        ).validate()
    # enum typo fails fast instead of falling through a dispatch chain
    with pytest.raises(ValueError, match="renderer"):
        Config(renderer="cuda").validate()
    with pytest.raises(ValueError, match="gsplat_impl"):
        Config(gsplat_impl="spallas").validate()


def test_validate_passes_and_returns_self():
    cfg = Config(
        predict_pose=True,
        pose_from_views=True,
        pose_consistency_weight=0.1,
    )
    assert cfg.validate() is cfg


def test_validate_shard_points_single_device_warns():
    import warnings

    cfg = Config(shard_points=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg.validate()
    # the CPU conftest pins an 8-device platform, so the warning only
    # fires when exactly one device is visible — assert consistency
    import jax

    assert (len(w) == 1) == (len(jax.devices()) == 1)
