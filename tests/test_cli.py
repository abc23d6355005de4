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


def test_serve_http_roundtrip(tiny_yaml):
    """ServingModel + HTTP front end: POST npz images -> npz predictions,
    padding/chunking across the fixed serving batch, healthz counter."""
    import io
    import threading
    import urllib.request

    import jax
    import numpy as np

    from dpcx.config import load_config
    from dpcx.serve import serve
    from dpcx.train import create_state

    cfg = load_config(tiny_yaml)
    state = create_state(cfg, jax.random.PRNGKey(0))
    srv = serve(cfg, state.params, port=0, batch_size=2)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        # 3 images with a batch of 2 -> one padded + one full chunk
        imgs = np.random.default_rng(0).random(
            (3, cfg.image_size, cfg.image_size, 3), np.float32
        )
        buf = io.BytesIO()
        np.savez(buf, images=imgs)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            with np.load(io.BytesIO(resp.read())) as f:
                pts = f["points"]
        assert pts.shape == (3, cfg.pc_num_points, 3)
        assert np.isfinite(pts).all()

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["requests"] >= 1

        # malformed body -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"junk", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_serving_model_bf16_and_chunking(tiny_yaml):
    import jax
    import numpy as np

    from dpcx.config import load_config
    from dpcx.serve import ServingModel
    from dpcx.train import create_state

    cfg = load_config(tiny_yaml)
    state = create_state(cfg, jax.random.PRNGKey(0))
    m32 = ServingModel(cfg, state.params, batch_size=2)
    m16 = ServingModel(cfg, state.params, batch_size=2, cast_bf16=True)
    imgs = np.random.default_rng(1).random(
        (5, cfg.image_size, cfg.image_size, 3), np.float32
    )
    p32 = m32(imgs)["points"]
    p16 = m16(imgs)["points"]
    assert p32.shape == p16.shape == (5, cfg.pc_num_points, 3)
    # bf16 weights drift the outputs but not far (decoder ends in tanh-ish
    # bounded coords); serving fidelity bound
    assert float(np.abs(p32 - p16).mean()) < 0.05
    # uint8 path
    pu8 = m32((imgs * 255).astype(np.uint8))["points"]
    assert float(np.abs(pu8 - p32).max()) < 0.05


def test_predict_writes_ply(tiny_yaml, tmp_path, capsys):
    """.ply suffix writes one ASCII PLY per model (viewer interop)."""
    out_file = str(tmp_path / "preds.ply")
    cli.main(["datagen", "-f", tiny_yaml, "-n", "2"])
    capsys.readouterr()
    cli.main(["predict", "-f", tiny_yaml, "-n", "2", "-o", out_file])
    files = sorted(tmp_path.glob("preds_*.ply"))
    assert len(files) == 2
    text = files[0].read_text().splitlines()
    assert text[0] == "ply" and "end_header" in text
    n = int(next(l for l in text if l.startswith("element vertex"))
            .split()[-1])
    assert len(text) == text.index("end_header") + 1 + n


def test_predict_writes_mat(tiny_yaml, tmp_path, capsys):
    """Reference-parity export: .mat suffix routes through scipy.io
    (dpc/run/predict_eval.py dumps .mat)."""
    from scipy.io import loadmat

    out_file = str(tmp_path / "preds.mat")
    cli.main(["datagen", "-f", tiny_yaml, "-n", "2"])
    capsys.readouterr()
    cli.main(["predict", "-f", tiny_yaml, "-n", "2", "-o", out_file])
    m = loadmat(out_file)
    assert "points" in m and m["points"].shape[0] == 2


def test_serving_full_output_surface(tiny_yaml):
    """A config-5 (pc_gauss + pc_rgb) model serves rgb and the gauss heads,
    not just points+scale (VERDICT r3 weak 7)."""
    import jax
    import numpy as np

    from dpcx.config import load_config
    from dpcx.serve import ServingModel
    from dpcx.train import create_state

    cfg = load_config(tiny_yaml, pc_gauss=True, pc_rgb=True)
    state = create_state(cfg, jax.random.PRNGKey(0))
    m = ServingModel(cfg, state.params, batch_size=2)
    imgs = np.random.default_rng(2).random(
        (2, cfg.image_size, cfg.image_size, 3), np.float32
    )
    out = m(imgs)
    N = cfg.pc_num_points
    assert out["rgb"].shape == (2, N, 3)
    assert out["gauss_scales"].shape == (2, N, 3)
    assert out["gauss_rot"].shape == (2, N, 4)
    assert out["gauss_opacity"].shape == (2, N)
    assert all(np.isfinite(v).all() for v in out.values())


def test_eval_flip_resolve_flag(tmp_path, capsys):
    """`dpcx eval --flip-resolve` reaches evaluate(flip_resolve=True) and
    reports the resolver metrics (VERDICT r4 weak 5: the resolver used to
    be reachable only from scripts/)."""
    p = tmp_path / "pose.yaml"
    p.write_text(
        "\n".join(
            [
                "name: tinypose",
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
                "predict_pose: true",
                "pose_predict_num_candidates: 2",
                "save_every: 1000000",
                "log_every: 1",
            ]
        )
    )
    cli.main(["train", "-f", str(p), "-n", "2", "--steps", "2"])
    capsys.readouterr()
    cli.main(["eval", "-f", str(p), "-n", "2", "--flip-resolve"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "pose_acc_30deg_flip_resolved" in out
    assert "flip_resolve_changed" in out
    # --per-sample forensics from the shipped surface (finding 21
    # tooling); pooled eval also carries the gauge detector
    cli.main(["eval", "-f", str(p), "-n", "2", "--all-views",
              "--per-sample"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "per_sample" in out and "err_deg" in out["per_sample"]
    assert "pose_gauge_spread_deg" in out
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="per-sample"):
        cli.main(["eval", "-f", str(p), "-n", "2", "--per-category",
                  "--per-sample"])


def test_cli_rejects_invalid_config(tmp_path):
    """Every CLI entry validates the config before doing work."""
    p = tmp_path / "bad.yaml"
    p.write_text("shard_points: true\npredict_pose: true\n")
    with pytest.raises(ValueError, match="shard_points"):
        cli.main(["datagen", "-f", str(p), "-n", "1"])
