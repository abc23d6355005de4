"""E2E validation on real TPU: train config-1-style chairs, check learning."""
import json, time
import jax, numpy as np
from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train
from dpcx.predict import evaluate

cfg = Config(
    name="validate_chair32",
    category="chair",
    checkpoint_dir="/tmp/dpcx_validate",
    pc_num_points=2048,
    vox_size=32,
    mask_size=32,
    image_size=64,
    encoder_filters=(16, 32, 64, 128),
    latent_dim=512,
    fc_hidden=512,
    pc_decoder_hidden=(512, 512),
    batch_size=16,
    num_views=5,
    views_per_step=3,
    learning_rate=2e-4,
    pc_relative_sigma=0.08,
    pc_relative_sigma_end=0.03,
    sigma_anneal_steps=600,
    pc_point_dropout=1.0,
    log_every=50,
    save_every=10000,
    renderer="xla",
)
t0 = time.time()
ds = Dataset(make_dataset(cfg, 40, seed=0, gt_points=4096), cfg)
print(f"datagen: {time.time()-t0:.1f}s")
t0 = time.time()
state, hist = train(cfg, dataset=ds, max_steps=800, use_checkpoints=False)
print(f"train 800 steps: {time.time()-t0:.1f}s")
for h in hist[:2] + hist[-2:]:
    print(json.dumps({k: round(v, 5) for k, v in h.items()}))
ev = Dataset(make_dataset(cfg, 8, seed=99, gt_points=4096), cfg)
print("eval:", json.dumps(evaluate(cfg, state.params, ev, batch_size=8)))
