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
