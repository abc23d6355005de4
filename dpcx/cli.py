"""dpcx CLI: train / eval / predict / datagen / bench, each from a YAML.

Reference parity: the argparse entry points in dpc/run/ (train_eval.py,
predict_eval.py; SURVEY.md §2.2 #15, #17 and §5 "Serving/CLI"), unified into
one console entry:

    python -m dpcx.cli train   -f experiments/chair_gt_pose.yaml
    python -m dpcx.cli eval    -f experiments/chair_gt_pose.yaml
    python -m dpcx.cli predict -f experiments/chair_gt_pose.yaml -o preds.npz
    python -m dpcx.cli datagen -f experiments/chair_gt_pose.yaml -n 200
    python -m dpcx.cli bench
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_cfg(args) -> "Config":
    from dpcx.config import load_config

    cfg = load_config(args.config) if args.config else load_config()
    return cfg.validate()


def cmd_train(args) -> None:
    from dpcx.train import train

    cfg = _load_cfg(args)
    if args.steps:
        cfg = cfg.replace(max_number_of_steps=args.steps)
    _, history = train(cfg, num_models=args.num_models)
    if history:
        print(json.dumps(history[-1]))


def cmd_eval(args) -> None:
    import jax

    from dpcx.data.dataset import load_or_make
    from dpcx.predict import evaluate
    from dpcx.train import (
        _checkpoint_manager,
        create_state,
        record_and_check_run_config,
        restore_checkpoint,
    )

    cfg = _load_cfg(args)
    record_and_check_run_config(cfg, write=False)
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    state = restore_checkpoint(_checkpoint_manager(cfg), state)
    ds = load_or_make(cfg, args.num_models, seed=cfg.seed + 1)  # held out
    # --all-views sweeps EVERY view per model and pools predictions — the
    # reference's predict_eval protocol (stronger statistic than view 0)
    view_idx = None if args.all_views else 0
    if args.per_category and args.per_sample:
        raise SystemExit(
            "--per-sample is not supported with --per-category (the "
            "per-category table aggregates; run per-sample on one slice)"
        )
    if args.per_category:
        from dpcx.predict import evaluate_category_slices

        metrics = evaluate_category_slices(
            cfg, state.params, ds, view_idx=view_idx,
            flip_resolve=args.flip_resolve,
        )
    else:
        metrics = evaluate(
            cfg, state.params, ds, view_idx=view_idx,
            flip_resolve=args.flip_resolve,
            per_sample=args.per_sample,
        )
    print(json.dumps(metrics))


def cmd_predict(args) -> None:
    import jax

    from dpcx.data.dataset import load_or_make
    from dpcx.predict import predict_dataset
    from dpcx.train import (
        _checkpoint_manager,
        create_state,
        restore_checkpoint,
    )

    from dpcx.train import record_and_check_run_config

    cfg = _load_cfg(args)
    record_and_check_run_config(cfg, write=False)
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    state = restore_checkpoint(_checkpoint_manager(cfg), state)
    ds = load_or_make(cfg, args.num_models, seed=cfg.seed + 1)
    out = predict_dataset(cfg, state.params, ds, out_path=args.out)
    print(json.dumps({"num_models": len(out["points"]), "out": args.out}))


def cmd_datagen(args) -> None:
    from dpcx.data.dataset import load_or_make

    cfg = _load_cfg(args)
    ds = load_or_make(cfg, args.num_models, seed=cfg.seed)
    print(
        json.dumps(
            {"models": ds.num_models, "views": ds.num_views,
             "dir": cfg.data_dir}
        )
    )


def cmd_bench(args) -> None:
    import bench

    bench.main()


def cmd_serve(args) -> None:
    """Online inference server (dpcx/serve.py, SURVEY.md §5 Serving)."""
    import jax

    from dpcx.serve import serve
    from dpcx.train import (
        _checkpoint_manager,
        create_state,
        record_and_check_run_config,
        restore_checkpoint,
    )

    cfg = _load_cfg(args)
    record_and_check_run_config(cfg, write=False)
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    state = restore_checkpoint(_checkpoint_manager(cfg), state)
    srv = serve(
        cfg,
        state.params,
        port=args.port,
        batch_size=args.batch,
        cast_bf16=args.bf16,
    )
    srv.serve_forever()


def cmd_convert(args) -> None:
    """Reference tfrecords -> npz shards (dpcx/data/convert.py)."""
    from dpcx.data.convert import convert_tfrecords

    stats = convert_tfrecords(
        args.inp, args.out,
        mask_size=args.mask_size or None,
        limit=args.num_models or None,
    )
    print(json.dumps(stats))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="dpcx")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("train", cmd_train),
        ("eval", cmd_eval),
        ("predict", cmd_predict),
        ("datagen", cmd_datagen),
        ("bench", cmd_bench),
        ("convert", cmd_convert),
        ("serve", cmd_serve),
    ]:
        sp = sub.add_parser(name)
        sp.add_argument("-f", "--config", default=None)
        # convert defaults to NO limit — silently converting only the
        # first 200 models of a real dataset would be a trap
        sp.add_argument(
            "-n", "--num-models", type=int,
            default=0 if name == "convert" else 200,
        )
        sp.add_argument("--steps", type=int, default=0)
        sp.add_argument("-o", "--out", default="predictions.npz")
        if name == "eval":
            sp.add_argument(
                "--all-views", action="store_true",
                help="evaluate every view per model (pooled), not view 0",
            )
            sp.add_argument(
                "--per-category", action="store_true",
                help="per-category metric table + mean row (joint "
                "'multi' models; reference per-ShapeNet-category table)",
            )
            sp.add_argument(
                "--flip-resolve", action="store_true",
                help="also report pose metrics after the shape-matching "
                "mirror-flip resolver (predict.resolve_pose_flips); "
                "diagnostic only — changed-rate 0.0 on held-out inputs "
                "is the measured outcome (the decoder co-flips with "
                "the pose, POSE_RESULTS finding 15)",
            )
            sp.add_argument(
                "--per-sample", action="store_true",
                help="attach the per-sample forensics block (angular "
                "error, object-side residual axis/angle, chamfer, view; "
                "plus per-model gauge_spread_deg with --all-views) — "
                "feed the JSON to scripts/pose_diagnose.py to classify "
                "a failure mode (POSE_RESULTS findings 20-21)",
            )
        if name == "convert":
            sp.add_argument("-i", "--inp", required=True,
                            help="tfrecord glob pattern")
            sp.add_argument("--mask-size", type=int, default=0)
        if name == "serve":
            sp.add_argument("--port", type=int, default=8787)
            sp.add_argument("--batch", type=int, default=16,
                            help="fixed serving batch (requests are "
                                 "padded/chunked to it)")
            sp.add_argument("--bf16", action="store_true",
                            help="cast params to bfloat16 for serving")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
