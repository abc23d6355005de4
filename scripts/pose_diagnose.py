"""Characterize a pose-run failure mode from a pose_r2 artifact.

Reads the ``per_sample`` block evaluate(per_sample=True) attaches
(post-alignment angular error, object-side residual axis/angle,
per-sample Chamfer, source view) and prints the forensics VERDICT r4
item 2 asks for: is a locked seed a vertical-axis (azimuth) lock, an
elevation/tumble lock, or shape collapse?

Usage: python scripts/pose_diagnose.py artifacts/pose_r2_<tag>.json
"""
import json
import sys

import numpy as np

path = sys.argv[1]
d = json.load(open(path))
# accept a pose_r2 artifact ({"heldout": {...}}) or a flat
# `dpcx eval --all-views --per-sample` JSON
d = d.get("heldout", d)
ps = d.get("per_sample")
if ps is None:
    sys.exit(f"{path} has no per_sample block (pose_r2.py round-5+, or "
             "`dpcx eval --all-views --per-sample`)")

err = np.asarray(ps["err_deg"])
axis = np.asarray(ps["res_axis"])          # [M, 3] object-side, unit
angle = np.asarray(ps["res_angle_deg"])
cham = np.asarray(ps["chamfer"])
view = np.asarray(ps["view"])

print(f"== {path}  ({len(err)} samples) ==")
print(f"acc@30 {np.mean(err <= 30):.3f}   median {np.median(err):.1f} deg")
gs = d.get("pose_gauge_spread_deg")
if gs is not None:
    print(f"pose_gauge_spread_deg {gs:.1f} (GT-free; healthy <~15, "
          "gauge failure >~45)")

bins = [0, 15, 30, 60, 90, 120, 150, 181]
hist = np.histogram(err, bins)[0]
print("err histogram:",
      "  ".join(f"{bins[i]}-{bins[i+1]}:{hist[i]}" for i in range(len(hist))))

bad = err > 30
if bad.any():
    # the rig's vertical is +y (camera_from_view_angles: y=sin(elev);
    # FLIP_QUAT is the y-axis pi-rotation); z is reported too so a
    # convention slip can't mislabel the mode
    vy = np.abs(axis[bad, 1])
    vz = np.abs(axis[bad, 2])
    print(f"failing samples: {bad.sum()}")
    print(f"  residual-axis |y|>0.9: {np.mean(vy > 0.9):.2f}   "
          f"|z|>0.9: {np.mean(vz > 0.9):.2f}   "
          f"(vertical-axis lock if either ~1; tumble if both ~0)")
    ah = np.histogram(angle[bad], bins)[0]
    print("  residual-angle histogram:",
          "  ".join(f"{bins[i]}-{bins[i+1]}:{ah[i]}" for i in range(len(ah))))
    # discrete-sector check: mass near 90/180 = candidate-offset sectors
    for center in (90, 180):
        frac = np.mean(np.abs(angle[bad] - center) < 20)
        print(f"  residual angle within 20 deg of {center}: {frac:.2f}")
    print(f"  chamfer  bad {cham[bad].mean():.4f}  vs  ok "
          f"{cham[~bad].mean() if (~bad).any() else float('nan'):.4f}  "
          "(>2x = shape degradation rides along)")
    for v in sorted(set(view.tolist())):
        m = view == v
        print(f"  view {v}: acc@30 {np.mean(err[m] <= 30):.3f}  "
              f"median {np.median(err[m]):.1f}")
    # per-model coherence: a frame lock is per-MODEL consistent across
    # views (same residual axis*angle for all views of one model), a
    # per-input gauge is not. Models are sample_index % num_models when
    # pooled view-major (evaluate view_idx=None ordering: v*M + i).
    nv = len(set(view.tolist()))
    M = len(err) // nv
    rot = axis * np.radians(angle)[:, None]  # rotation-vector form
    rv = rot.reshape(nv, M, 3)
    spread = np.linalg.norm(rv - rv.mean(0, keepdims=True), axis=-1).mean(0)
    bad_m = (err.reshape(nv, M) > 30).any(0)
    print(f"  cross-view residual spread (rad): "
          f"locked models {spread[bad_m].mean():.2f}  "
          f"clean models {spread[~bad_m].mean() if (~bad_m).any() else float('nan'):.2f}  "
          "(small+equal => coherent wrong frame; large => per-view gauge)")
else:
    print("no failing samples (> 30 deg)")
