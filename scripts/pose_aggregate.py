"""Aggregate pose-study artifacts into per-(mechanism, category) seed
tables — the round-4 gauge-lottery study's bookkeeping (VERDICT r3 item 1
asks for seed MEANS, not best-of-N: POSE_RESULTS finding 9 shows proj loss
cannot select the right gauge, so only the mean is a legitimate metric).

Usage: python scripts/pose_aggregate.py [--json artifacts/POSE_R4_SWEEP.json]

Groups artifacts/pose_r2_<tag>.json by tag with the trailing _s<seed>
stripped (seed 0 has no suffix); prints a markdown table of heldout
acc@30 per seed + mean, median-error mean, and flip-rate mean.
"""

import argparse
import json
import re
from pathlib import Path

p = argparse.ArgumentParser()
p.add_argument("--dir", default="artifacts")
p.add_argument("--json", default="")
p.add_argument("--prefix", default="pose_r2_",
               help="artifact filename prefix to scan")
args = p.parse_args()

groups: dict[str, dict[int, dict]] = {}
for f in sorted(Path(args.dir).glob(f"{args.prefix}*.json")):
    try:
        d = json.loads(f.read_text())
    except json.JSONDecodeError:
        continue
    if "heldout" not in d or "pose_acc_30deg" not in d.get("heldout", {}):
        continue
    tag = f.stem[len("pose_r2_"):]
    m = re.fullmatch(r"(.+)_s(\d+)", tag)
    base, seed = (m.group(1), int(m.group(2))) if m else (tag, 0)
    cfg_seed = d.get("config", {}).get("seed")
    if cfg_seed is not None:
        seed = cfg_seed
    groups.setdefault(base, {})[seed] = d["heldout"]

rows = []
for base in sorted(groups):
    seeds = groups[base]
    accs = {s: seeds[s]["pose_acc_30deg"] for s in sorted(seeds)}
    meds = [seeds[s]["pose_median_err_deg"] for s in seeds]
    flips = [
        seeds[s]["pose_flip_rate"]
        for s in seeds
        if "pose_flip_rate" in seeds[s]
        and "pose_flip_rate_note" not in seeds[s]  # pre-fix = vacuous
    ]
    utf = [
        seeds[s].get("pose_acc_30deg_up_to_flip")
        for s in seeds
        if seeds[s].get("pose_acc_30deg_up_to_flip") is not None
    ]
    rows.append({
        "group": base,
        "n_seeds": len(seeds),
        "acc_per_seed": {str(s): round(a, 3) for s, a in accs.items()},
        "acc_mean": round(sum(accs.values()) / len(accs), 4),
        "acc_min": round(min(accs.values()), 4),
        "median_err_mean": round(sum(meds) / len(meds), 2),
        "up_to_flip_mean": (
            round(sum(utf) / len(utf), 4) if utf else None
        ),
        "flip_rate_mean": (
            round(sum(flips) / len(flips), 4) if flips else None
        ),
    })

hdr = ("| group | seeds | acc@30 per seed | mean | min | med err | "
       "up-to-flip | flip rate |")
print(hdr)
print("|" + "---|" * 8)
for r in rows:
    per = " ".join(
        f"s{s}:{a}" for s, a in sorted(r["acc_per_seed"].items())
    )
    print(
        f"| {r['group']} | {r['n_seeds']} | {per} | {r['acc_mean']} | "
        f"{r['acc_min']} | {r['median_err_mean']} | "
        f"{r['up_to_flip_mean']} | {r['flip_rate_mean']} |"
    )

if args.json:
    Path(args.json).write_text(json.dumps(rows, indent=1))
    print(f"\nwrote {args.json}")
