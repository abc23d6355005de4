"""CLI smoke tests (ref: dpc/run entry points, SURVEY.md §5 Serving/CLI)."""

import json
import os

import pytest

from dpcx import cli


@pytest.fixture
def tiny_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(
        "\n".join(
            [
                "name: tiny",
                f"checkpoint_dir: {tmp_path}/run",
                f"data_dir: {tmp_path}/data",
                "vox_size: 8",
                "mask_size: 8",
                "pc_num_points: 32",
                "image_size: 16",
                "encoder_filters: [4]",
                "latent_dim: 16",
                "fc_hidden: 16",
                "pc_decoder_hidden: [16]",
                "num_views: 2",
                "views_per_step: 2",
                "batch_size: 2",
                "pc_point_dropout: 1.0",
                "save_every: 1000000",
                "log_every: 1",
            ]
        )
    )
    return str(p)


def test_datagen_and_train_and_eval(tiny_yaml, capsys):
    cli.main(["datagen", "-f", tiny_yaml, "-n", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["models"] == 2

    cli.main(["train", "-f", tiny_yaml, "-n", "2", "--steps", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "loss_total" in out

    cli.main(["eval", "-f", tiny_yaml, "-n", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "chamfer" in out


def test_predict_writes_npz(tiny_yaml, tmp_path, capsys):
    out_file = str(tmp_path / "preds.npz")
    cli.main(["datagen", "-f", tiny_yaml, "-n", "2"])
    capsys.readouterr()
    cli.main(["predict", "-f", tiny_yaml, "-n", "2", "-o", out_file])
    assert os.path.exists(out_file)
