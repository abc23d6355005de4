"""Round-2 predicted-pose protocol: reference-scale schedule (60k steps,
sigma anneal over 30k), device-resident training, periodic held-out pose
eval with refined canonical alignment. Targets (VERDICT round-1 item 2):
heldout acc@30deg >= 0.7, median <= 30 deg on synthetic chairs."""
import json
import time
from pathlib import Path

import jax

from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.predict import evaluate
from dpcx.train import train

cfg = Config(
    name="pose_long_r2",
    category="chair",
    checkpoint_dir="/tmp/dpcx_pose_r2",
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
    pc_relative_sigma_end=0.02,
    sigma_anneal_steps=40000,
    pc_point_dropout=1.0,
    predict_pose=True,
    pose_predict_num_candidates=4,
    pose_student=True,
    pose_student_weight=5.0,
    renderer="pallas",
    pallas_acc_dtype="bfloat16",
    device_data=True,
    log_every=500,
    save_every=10**9,
    eval_every=5000,
)
MAX_STEPS = 80000
ds = Dataset(make_dataset(cfg, 2000, seed=0, gt_points=4096), cfg)
ev = Dataset(make_dataset(cfg, 32, seed=99, gt_points=4096), cfg)
t0 = time.time()
state, hist = train(
    cfg, dataset=ds, max_steps=MAX_STEPS, use_checkpoints=False,
    eval_dataset=ev,
)
dt = time.time() - t0
print(f"train {MAX_STEPS} steps: {dt:.0f}s "
      f"({hist[-1].get('steps_per_sec', 0):.1f} steps/s)", flush=True)
final_ev = evaluate(cfg, state.params, ev, view_idx=None, batch_size=16)
final_tr = evaluate(
    cfg, state.params,
    Dataset(jax.tree.map(lambda x: x[:32], ds.records), cfg),
    batch_size=16,
)
out = {
    "config": "pose_long_r2 (synthetic chairs, 2000 models, K=4+student)",
    "max_steps": MAX_STEPS,
    "wall_seconds": round(dt, 1),
    "heldout": final_ev,
    "train_subset": final_tr,
    "history": hist,
}
Path("artifacts").mkdir(exist_ok=True)
Path("artifacts/pose_long_r2.json").write_text(json.dumps(out, indent=1))
print("heldout:", json.dumps(final_ev), flush=True)
print("train:", json.dumps(final_tr), flush=True)
