"""Measure multicat_128 training steps/s (VERDICT round-1 item 1 target:
>= 6 steps/s; round-1 measured 2.1 host-fed with the fwd-only kernel +
XLA-recompute VJP)."""
import json
import time

import jax

from dpcx.config import Config, load_config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train

cfg = load_config("experiments/multicat_128_fused.yaml").replace(
    checkpoint_dir="/tmp/dpcx_mc128",
    device_data=True,
    pallas_acc_dtype="bfloat16",
    log_every=50,
    save_every=10**9,
    eval_every=10**9,
)
ds = Dataset(make_dataset(cfg, 48, seed=0, gt_points=1024), cfg)
t0 = time.time()
state, hist = train(cfg, dataset=ds, max_steps=300, use_checkpoints=False)
dt = time.time() - t0
tail = [h for h in hist if "steps_per_sec" in h][-3:]
print(json.dumps({
    "wall_s": round(dt, 1),
    "steps_per_sec_tail": [round(h["steps_per_sec"], 2) for h in tail],
    "loss_total": tail[-1].get("loss_total"),
}))
