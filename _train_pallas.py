"""E2E: train through the fused Pallas renderer at 64^3 (config-3-like)."""
import json, time
import jax
from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train
from dpcx.predict import evaluate

base = dict(
    category="car",
    checkpoint_dir="/tmp/dpcx_validate_pallas",
    pc_num_points=8192,
    vox_size=64,
    mask_size=64,
    image_size=64,
    encoder_filters=(16, 32, 64, 128),
    latent_dim=512,
    fc_hidden=512,
    pc_decoder_hidden=(512, 512),
    batch_size=8,
    num_views=5,
    views_per_step=2,
    learning_rate=2e-4,
    pc_relative_sigma=0.05,
    pc_relative_sigma_end=0.02,
    sigma_anneal_steps=400,
    pc_point_dropout=1.0,
    proj_depth=True,
    drc_weight=0.1,
    log_every=50,
    save_every=100000,
)
for renderer in ["pallas", "xla"]:
    cfg = Config(renderer=renderer, pallas_acc_dtype="bfloat16",
                 name=f"v_{renderer}", **base)
    ds = Dataset(make_dataset(cfg, 24, seed=0, gt_points=4096), cfg)
    t0 = time.time()
    state, hist = train(cfg, dataset=ds, max_steps=300, use_checkpoints=False)
    dt = time.time() - t0
    last = hist[-1]
    ev = Dataset(make_dataset(cfg, 6, seed=99, gt_points=4096), cfg)
    m = evaluate(cfg, state.params, ev, batch_size=6)
    print(json.dumps({
        "renderer": renderer, "train_s": round(dt, 1),
        "steps_per_sec": round(last["steps_per_sec"], 2),
        "loss": round(last["loss_total"], 5), "iou": round(last["iou"], 3),
        "chamfer": round(m["chamfer"], 5),
    }))
