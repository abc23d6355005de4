"""Validate the big-dataset block-rotation path on TPU (VERDICT r2
missing 6 acceptance): a dataset larger than the resident-block budget
trains with FLAT host RSS (the host-fed path leaked ~3.5 MB/step,
NOTES.md) and steps/s within ~15% of fully-resident.

Usage (repo root, TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/validate_block_rotation.py
Writes artifacts/block_rotation.json.
"""

import argparse
import json
import threading
import time
from pathlib import Path

import jax

from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train

p = argparse.ArgumentParser()
p.add_argument("--models", type=int, default=1200)
p.add_argument("--block", type=int, default=150)
p.add_argument("--steps", type=int, default=5000)
p.add_argument("--ref-steps", type=int, default=1500)
args = p.parse_args()


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


class RssSampler(threading.Thread):
    def __init__(self, period=5.0):
        super().__init__(daemon=True)
        self.samples: list[float] = []
        self.period = period
        self.stop = threading.Event()

    def run(self):
        while not self.stop.is_set():
            self.samples.append(rss_mb())
            self.stop.wait(self.period)


cfg = Config(
    name="blockrot",
    category="chair",
    checkpoint_dir="/tmp/dpcx_blockrot",
    pc_num_points=2048,
    vox_size=32,
    mask_size=32,
    image_size=64,
    encoder_filters=(16, 32, 64),
    latent_dim=256,
    fc_hidden=256,
    pc_decoder_hidden=(256, 256),
    batch_size=16,
    num_views=5,
    views_per_step=3,
    pc_point_dropout=1.0,
    renderer="pallas",
    pallas_acc_dtype="bfloat16",
    log_every=500,
    save_every=10**9,
)

print(f"datagen {args.models} models ...", flush=True)
t0 = time.time()
ds = Dataset(make_dataset(cfg, args.models, seed=0, gt_points=512), cfg)
rec_mb = sum(v.nbytes for v in ds.records.values()) / 1e6
print(f"datagen {time.time()-t0:.0f}s, records {rec_mb:.0f} MB", flush=True)

out = {"models": args.models, "block": args.block, "records_mb": rec_mb}

# reference: fully resident
_, hist = train(
    cfg, dataset=ds, max_steps=args.ref_steps, use_checkpoints=False
)
out["resident_steps_per_sec"] = hist[-1]["steps_per_sec"]
print("resident:", out["resident_steps_per_sec"], "steps/s", flush=True)

# rotated blocks: dataset is models/block x the resident budget
cfg_rot = cfg.replace(
    checkpoint_dir="/tmp/dpcx_blockrot_r",
    device_records_models=args.block,
    block_rotate_chunks=4,
)
sampler = RssSampler()
sampler.start()
_, hist = train(
    cfg_rot, dataset=ds, max_steps=args.steps, use_checkpoints=False
)
sampler.stop.set()
out["rotated_steps_per_sec"] = hist[-1]["steps_per_sec"]
out["ratio"] = round(
    out["rotated_steps_per_sec"] / out["resident_steps_per_sec"], 3
)
s = sampler.samples
out["rss_mb_series"] = [round(x, 1) for x in s[:: max(len(s) // 20, 1)]]
half = len(s) // 2
out["rss_drift_mb"] = round(
    (sum(s[half:]) / max(len(s[half:]), 1))
    - (sum(s[:half]) / max(half, 1)),
    1,
)
print(json.dumps(out), flush=True)
Path("artifacts").mkdir(exist_ok=True)
Path("artifacts/block_rotation.json").write_text(json.dumps(out, indent=1))
