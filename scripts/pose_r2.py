"""Round-2 predicted-pose protocol (VERDICT item 2), parameterized.

Best round-1.5 recipe: 1500 asymmetric synthetic chairs, 40k steps, sigma
0.08->0.02 annealed over 20k, device-resident pallas bf16 (118 steps/s).
That run reached heldout acc@30 = 0.594 / median 13.9 deg with the residual
errors being discrete ~180-deg azimuth flips (NOTES.md round-2 pose
findings). This script layers the candidate-azimuth-offset ensemble
(dpcx/nets/pose.py) and exposes the knobs that matter so variants are one
CLI flag, not an edit.

Usage: python scripts/pose_r2.py --tag offsets --steps 40000
"""
import argparse
import json
import time
from pathlib import Path

import jax

from dpcx.config import Config
from dpcx.data.dataset import Dataset
from dpcx.data.synthetic import make_dataset
from dpcx.predict import evaluate
from dpcx.train import train

p = argparse.ArgumentParser()
p.add_argument("--tag", default="offsets")
p.add_argument("--seed", type=int, default=0,
               help="init/data-stream seed (datasets stay fixed so runs"
               " are comparable; this probes mode-locking variance)")
p.add_argument("--category", default="chair")
p.add_argument("--steps", type=int, default=40000)
p.add_argument("--models", type=int, default=1500)
p.add_argument("--anneal", type=int, default=20000)
p.add_argument("--sigma0", type=float, default=0.08)
p.add_argument("--sigma1", type=float, default=0.02)
p.add_argument("--k", type=int, default=4)
p.add_argument("--no-offsets", action="store_true")
p.add_argument("--student-weight", type=float, default=5.0)
p.add_argument("--student-warmup", type=int, default=0,
               help="linear student-weight warmup steps (gauge-lottery "
                    "mechanism c: the early argmin teacher is noise and "
                    "its gradient reaches the shared pose trunk)")
p.add_argument("--anchor-weight", type=float, default=0.0,
               help="candidate re-anchoring regularizer weight (gauge-"
                    "lottery mechanism b: pull pre-offset corrections "
                    "toward identity so offsets keep owning their sector)")
p.add_argument("--anchor-steps", type=int, default=0,
               help=">0: anchor weight decays linearly to 0 by this step")
p.add_argument("--anchor-mode", default="full",
               choices=["full", "azimuth"],
               help="full = whole correction to identity (measured "
                    "harmful); azimuth = only the vertical-axis component")
p.add_argument("--softmin-temp", type=float, default=0.0,
               help="soft-min -> hard-min annealing initial relative "
                    "temperature (gauge-lottery mechanism d: losing "
                    "candidates keep projection gradient while warm, so "
                    "early gauge coin flips stay reversible)")
p.add_argument("--softmin-steps", type=int, default=0,
               help=">0: softmin temperature decays to 0 by this step")
p.add_argument("--consistency-weight", type=float, default=0.0,
               help="cross-view canonical-shape Chamfer consistency "
                    "(gauge-lottery mechanism e: two views of one model "
                    "must decode to the same canonical cloud, which "
                    "punishes per-input mirror gauges directly)")
p.add_argument("--predict-translation", action="store_true",
               help="per-candidate camera-frame offsets; with "
                    "--pose-from-views each target view's offset comes "
                    "from its own pose head (round-5 pfv x translation)")
p.add_argument("--pose-from-views", action="store_true",
               help="predict each target view's pose from that view's "
                    "own image (gauge-lottery mechanism f = the "
                    "reference's shape-and-pose-from-different-views "
                    "protocol): the shape's and poses' mirror bits come "
                    "from different images, so per-image gauge coin "
                    "flips raise the loss on random view pairings")
p.add_argument("--gauge-reseed-threshold", type=float, default=0.0,
               help=">0: abandon + re-init (new deterministic init key) "
                    "when the live gauge_spread_deg metric exceeds this "
                    "at --gauge-reseed-step (finding 21's detector; the "
                    "lottery is init-only — the dataset is fixed)")
p.add_argument("--gauge-reseed-step", type=int, default=10000)
p.add_argument("--gauge-reseed-retries", type=int, default=3)
p.add_argument("--lr", type=float, default=2e-4)
p.add_argument("--views-per-step", type=int, default=3)
p.add_argument("--rgb", action="store_true",
               help="color re-projection for every candidate, entering "
                    "the hard-min SELECTION (breaks silhouette-symmetric "
                    "pose gauges that a mask-only argmin cannot)")
p.add_argument("--rgb-weight", type=float, default=1.0)
p.add_argument("--rgb-warmup", type=int, default=0,
               help="linear rgb-weight warmup steps (collapse guard)")
p.add_argument("--texture", default="stripes",
               help="datagen texture mode: stripes (round-2 high-freq, "
                    "aliases away at mask resolution) | lowfreq (two-tone "
                    "front/back split — the resolution control)")
p.add_argument("--raw-selection", action="store_true",
               help="disable rgb_sel_normalize (round-2 raw-sum argmin)")
p.add_argument("--vox", type=int, default=32)
p.add_argument("--batch", type=int, default=16,
               help="16 fits K=4+rgb or K=8 sil-only; K=8+rgb needs 8 "
                    "(HBM: the K x V render fan-out dominates)")
p.add_argument("--points", type=int, default=2048)
p.add_argument("--remat", action="store_true",
               help="jax.checkpoint the loss (HBM relief for the K-rgb "
                    "graph under the device-resident scan)")
p.add_argument("--log-every", type=int, default=1000)
p.add_argument("--host-data", action="store_true",
               help="host-fed batches (the device-resident scan with the "
                    "K-rgb graph at 1500+ models crashes the TPU worker)")
args = p.parse_args()

cfg = Config(
    name=f"pose_r2_{args.tag}",
    seed=args.seed,
    category=args.category,
    checkpoint_dir=f"/tmp/dpcx_pose_r2_{args.tag}",
    pc_num_points=args.points,
    vox_size=args.vox,
    mask_size=args.vox,
    image_size=64,
    encoder_filters=(16, 32, 64, 128),
    latent_dim=512,
    fc_hidden=512,
    pc_decoder_hidden=(512, 512),
    batch_size=args.batch,
    num_views=5,
    views_per_step=args.views_per_step,
    learning_rate=args.lr,
    pc_relative_sigma=args.sigma0,
    pc_relative_sigma_end=args.sigma1,
    sigma_anneal_steps=args.anneal,
    pc_point_dropout=1.0,
    predict_pose=True,
    pose_predict_num_candidates=args.k,
    pose_candidate_offsets=not args.no_offsets,
    pose_student=True,
    pose_student_weight=args.student_weight,
    pose_student_warmup_steps=args.student_warmup,
    pose_anchor_weight=args.anchor_weight,
    pose_anchor_steps=args.anchor_steps,
    pose_anchor_mode=args.anchor_mode,
    pose_softmin_temp=args.softmin_temp,
    pose_softmin_steps=args.softmin_steps,
    pose_consistency_weight=args.consistency_weight,
    pose_from_views=args.pose_from_views,
    gauge_reseed_threshold_deg=args.gauge_reseed_threshold,
    gauge_reseed_check_step=args.gauge_reseed_step,
    gauge_reseed_max_retries=args.gauge_reseed_retries,
    predict_translation=args.predict_translation,
    pc_rgb=args.rgb,
    rgb_weight=args.rgb_weight,
    rgb_warmup_steps=args.rgb_warmup,
    texture_mode=args.texture,
    rgb_sel_normalize=not args.raw_selection,
    renderer="pallas",
    pallas_acc_dtype="bfloat16",
    device_data=not args.host_data,
    remat=args.remat,
    log_every=args.log_every,
    save_every=10**9,
    eval_every=10000,
)
ds = Dataset(make_dataset(cfg, args.models, seed=0, gt_points=4096), cfg)
ev = Dataset(make_dataset(cfg, 32, seed=99, gt_points=4096), cfg)
t0 = time.time()
state, hist = train(
    cfg, dataset=ds, max_steps=args.steps, use_checkpoints=False,
    eval_dataset=ev,
)
dt = time.time() - t0
print(
    f"train {args.steps} steps: {dt:.0f}s "
    f"({hist[-1].get('steps_per_sec', 0):.1f} steps/s)",
    flush=True,
)
final_ev = evaluate(cfg, state.params, ev, view_idx=None, batch_size=16,
                    flip_resolve=True, per_sample=True)
final_tr = evaluate(
    cfg,
    state.params,
    Dataset(jax.tree.map(lambda x: x[:32], ds.records), cfg),
    batch_size=args.batch,
)
out = {
    "config": vars(args),
    "wall_seconds": round(dt, 1),
    "heldout": final_ev,
    "train_subset": final_tr,
    "history": hist[-4:],
    # auto-reseed audit trail (finding 21 detector): which attempts were
    # abandoned and at what measured spread
    "gauge_reseeds": [h for h in hist if "gauge_reseed" in h],
}
Path("artifacts").mkdir(exist_ok=True)
Path(f"artifacts/pose_r2_{args.tag}.json").write_text(
    json.dumps(out, indent=1)
)
print(
    "heldout:",
    json.dumps({k: v for k, v in final_ev.items() if k != "per_sample"}),
    flush=True,
)
print("train:", json.dumps(final_tr), flush=True)
