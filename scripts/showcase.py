"""Round-1 showcase: train shipped-config-style runs on synthetic data,
with periodic held-out eval + image summaries; artifacts under runs/."""
import json, time
from dpcx.config import Config, load_config, save_config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.train import train
from dpcx.predict import evaluate

RUNS = [
    ("chair32_gt", dict(
        category="chair", vox_size=32, mask_size=32, pc_num_points=4096,
        batch_size=16, views_per_step=3, steps=6000,
        renderer="pallas", pallas_acc_dtype="bfloat16")),
    ("car64_depth", dict(
        category="car", vox_size=64, mask_size=64, pc_num_points=8192,
        batch_size=8, views_per_step=2, steps=3000, proj_depth=True,
        drc_weight=0.1, renderer="pallas", pallas_acc_dtype="bfloat16")),
    ("airplane64_depth", dict(
        category="airplane", vox_size=64, mask_size=64, pc_num_points=8192,
        batch_size=8, views_per_step=2, steps=3000, proj_depth=True,
        drc_weight=0.1, renderer="pallas", pallas_acc_dtype="bfloat16")),
]
results = {}
for name, kw in RUNS:
    steps = kw.pop("steps")
    cfg = Config(
        name=name, checkpoint_dir=f"runs/showcase_{name}",
        image_size=64, encoder_filters=(16, 32, 64, 128), latent_dim=512,
        fc_hidden=512, pc_decoder_hidden=(512, 512), num_views=5,
        learning_rate=2e-4, pc_relative_sigma=0.06,
        pc_relative_sigma_end=0.02, sigma_anneal_steps=steps // 2,
        pc_point_dropout=1.0, log_every=250, save_every=steps,
        eval_every=steps // 3, **kw)
    ds = Dataset(make_dataset(cfg, 100, seed=0, gt_points=4096), cfg)
    ev = Dataset(make_dataset(cfg, 16, seed=99, gt_points=4096), cfg)
    t0 = time.time()
    state, hist = train(cfg, dataset=ds, max_steps=steps,
                        use_checkpoints=True, eval_dataset=ev)
    dt = time.time() - t0
    final = evaluate(cfg, state.params, ev, batch_size=16)
    last_train = [h for h in hist if "loss_total" in h][-1]
    results[name] = {
        "steps": steps, "wall_s": round(dt, 1),
        "steps_per_sec": round(last_train["steps_per_sec"], 2),
        "final_loss": round(last_train["loss_total"], 5),
        "final_iou": round(last_train["iou"], 4),
        "heldout_chamfer": round(final["chamfer"], 5),
    }
    print(name, json.dumps(results[name]))
with open("runs/showcase_results.json", "w") as f:
    json.dump(results, f, indent=1)
print("ALL DONE")
