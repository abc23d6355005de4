"""Longer predicted-pose run for pose-accuracy reporting (round 1)."""
import json, time
import jax
from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train
from dpcx.predict import evaluate

cfg = Config(
    name="pose_long",
    category="chair",
    checkpoint_dir="/tmp/dpcx_pose_long",
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
    pc_relative_sigma_end=0.025,
    sigma_anneal_steps=5000,
    pc_point_dropout=1.0,
    predict_pose=True,
    pose_predict_num_candidates=4,
    pose_student=True,
    pose_student_weight=5.0,
    log_every=500,
    save_every=1000000,
)
ds = Dataset(make_dataset(cfg, 60, seed=0, gt_points=4096), cfg)
t0 = time.time()
state, hist = train(cfg, dataset=ds, max_steps=8000, use_checkpoints=False)
print(f"train 8000 steps: {time.time()-t0:.1f}s "
      f"({hist[-1]['steps_per_sec']:.1f} steps/s)")
print(json.dumps({k: round(v, 5) for k, v in hist[-1].items()}))
ev = Dataset(make_dataset(cfg, 16, seed=99, gt_points=4096), cfg)
print("heldout:", json.dumps(evaluate(cfg, state.params, ev, batch_size=16)))
print("train-set:", json.dumps(
    evaluate(cfg, state.params,
             Dataset(jax.tree.map(lambda x: x[:16], ds.records), cfg),
             batch_size=16)))
