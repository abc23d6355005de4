"""Training loop: Adam, jit + data-parallel mesh, Orbax checkpoints, metrics.

Reference parity: dpc/run/train_eval.py (SURVEY.md §2.2 #15, #20, #21, §3.1):
tf.data -> ModelPointCloud -> Adam(1e-4) -> session loop with global-step
schedules (sigma anneal, point dropout), Saver checkpoints and summaries.

TPU-native differences:
- the whole step (fwd + renderer + bwd + Adam update) is ONE jitted function;
  the host crosses the device boundary once per step, as the reference's
  sess.run did, but with donated buffers so params update in place;
- batch is sharded over the ICI data mesh; XLA inserts the grad all-reduce
  (SURVEY.md §2.3);
- checkpoint/resume via Orbax (auto-resume from latest step, SURVEY.md §5);
- metrics go to JSONL (+ stdout), the lightweight stand-in for tf.summary.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from dpcx.config import Config
from dpcx.data.dataset import Dataset, load_or_make
from dpcx.models.losses import compute_loss
from dpcx.models.model_pc import ModelPointCloud
from dpcx.parallel.mesh import make_mesh, shard_batch


class TrainState(train_state.TrainState):
    """Flax TrainState; schedules are pure functions of .step, so no extra
    mutable state is carried (sigma/dropout recompute from step on resume)."""


def create_state(cfg: Config, rng: jax.Array) -> TrainState:
    model = ModelPointCloud(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = model.init(rng, dummy)
    tx = optax.adam(cfg.learning_rate)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx
    )


def apply_model(
    cfg: Config,
    apply_fn,
    params,
    batch: dict[str, jax.Array],
) -> dict[str, jax.Array]:
    """Full model application for one training batch: the input-view
    forward plus the auxiliary applications some loss terms need — the
    second-view decode of the consistency loss (mechanism e) and the
    per-view pose heads of cfg.pose_from_views (mechanism f, the
    reference's shape-and-pose-from-different-views protocol). Single
    source shared by train_step and both device-resident scan paths."""
    preds = apply_fn(params, batch["image"])
    if "image_in2" in batch:
        preds["points_view2"] = apply_fn(params, batch["image_in2"])[
            "points"
        ]
    if "images_v" in batch:
        # encoder + pose head only per target view — the decoder (the
        # bulk of the parameters) runs once, on the input view
        iv = batch["images_v"]
        Bv, Vu = iv.shape[:2]
        pv = apply_fn(
            params,
            iv.reshape((Bv * Vu,) + iv.shape[2:]),
            method="pose_only",
        )
        preds["quats_views"] = pv["quats"].reshape(Bv, Vu, -1, 4)
        preds["correction_quats_views"] = pv["correction_quats"].reshape(
            Bv, Vu, -1, 4
        )
        if "translation" in pv:
            # per-view camera-frame offsets (predict_translation x
            # pose_from_views): each target view's offset from its own
            # pose head, like the candidate quats
            preds["translations_views"] = pv["translation"].reshape(
                Bv, Vu, -1, 3
            )
        if "student_quat" in pv:
            preds["student_quat_views"] = pv["student_quat"].reshape(
                Bv, Vu, 4
            )
    return preds


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(
    cfg: Config,
    state: TrainState,
    batch: dict[str, jax.Array],
    key: jax.Array,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One fully-fused training step (fwd + render + bwd + Adam)."""
    step_key = jax.random.fold_in(key, state.step)

    def loss_fn(params):
        preds = apply_model(cfg, state.apply_fn, params, batch)
        return compute_loss(
            cfg, preds, batch, state.step, step_key, train=True
        )

    if cfg.remat:
        loss_fn = jax.checkpoint(loss_fn)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads=grads)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps"),
    donate_argnames=("state",),
)
def train_steps_scan(
    cfg: Config,
    state: TrainState,
    records: dict[str, jax.Array],
    key: jax.Array,
    n_steps: int,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """Run n_steps training steps entirely on device (lax.scan).

    The dataset stays device-resident and batches are sampled inside the
    scan with jax.random — the TPU-native replacement for the reference's
    host-side tf.data feed (SURVEY.md §3.1 'device boundary per sess.run'):
    here the host is involved once per n_steps, not once per step. Returns
    the final state and the LAST step's metrics.
    """
    M, V = records["images"].shape[:2]
    B = cfg.batch_size
    V_use = min(cfg.views_per_step, V)

    def body(carry, _):
        state, key = carry
        # per-step keys are a pure function of (key, ABSOLUTE step), not
        # of the carried split chain: a chunk boundary (resume, block
        # rotation) then never changes the batch stream
        kk = jax.random.fold_in(key, state.step)
        k_m, k_vin, k_tgt, k_drop = jax.random.split(kk, 4)
        m = jax.random.randint(k_m, (B,), 0, M)
        v_in = jax.random.randint(k_vin, (B,), 0, V)
        # target views without replacement: argsort of uniform keys
        perm = jnp.argsort(
            jax.random.uniform(k_tgt, (B, V)), axis=1
        )[:, :V_use]

        # flat 1-D takes on an [M*V, ...] view instead of broadcasted 2-D
        # fancy indexing: identical semantics, and the simpler gather
        # lowering avoids a TPU-worker fault observed with the broadcast
        # form on larger record tables (NOTES.md)
        def take_mv(arr, rows):  # rows [B] or [B, V_use] of m*V+v
            flatr = rows.reshape(-1)
            out = arr.reshape((M * V,) + arr.shape[2:])[flatr]
            return out.reshape(rows.shape + arr.shape[2:])

        rows_in = m * V + v_in
        rows_tgt = m[:, None] * V + perm
        batch = {
            "image": take_mv(records["images"], rows_in),
            "masks": take_mv(records["masks"], rows_tgt),
            "depths": take_mv(records["depths"], rows_tgt),
            "quats": take_mv(records["quats"], rows_tgt),
        }
        if cfg.predict_pose:
            batch["quat_in"] = take_mv(records["quats"], rows_in)
        if cfg.pc_rgb:
            batch["images_tgt"] = take_mv(records["images"], rows_tgt)
        if cfg.pose_consistency_weight > 0:
            # mechanism (e): a SECOND input view of the same model (key
            # derived by fold_in so existing configs' batch streams are
            # untouched); guaranteed != v_in when V >= 2
            k_vin2 = jax.random.fold_in(kk, 7)
            v_in2 = (
                v_in + 1 + jax.random.randint(k_vin2, (B,), 0, V - 1)
            ) % V
            batch["image_in2"] = take_mv(
                records["images"], m * V + v_in2
            )
        if cfg.pose_from_views:
            # mechanism (f): the pose for each target view is predicted
            # from that view's own image (same gather rows as the masks)
            batch["images_v"] = take_mv(records["images"], rows_tgt)

        def loss_fn(params):
            preds = apply_model(cfg, state.apply_fn, params, batch)
            return compute_loss(
                cfg, preds, batch, state.step, k_drop, train=True
            )

        if cfg.remat:
            loss_fn = jax.checkpoint(loss_fn)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (new_state, key), metrics

    (state, _), ms = jax.lax.scan(
        body, (state, key), None, length=n_steps
    )
    return state, jax.tree.map(lambda x: x[-1], ms)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "mesh"),
    donate_argnames=("state",),
)
def train_steps_scan_dp(
    cfg: Config,
    state: TrainState,
    records: dict[str, jax.Array],
    key: jax.Array,
    n_steps: int,
    mesh,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """Device-resident training under DATA PARALLELISM: the lax.scan loop
    of train_steps_scan, run per-device under shard_map with a gradient
    pmean over the ICI data axis (SURVEY.md §2.3).

    Semantics match single-device training EXACTLY (up to fp reduction
    order): every device samples the SAME global batch indices from the
    shared key and takes its own slice, so pmean of per-slice gradients
    equals the full-batch gradient. Records and params are replicated;
    only the per-step batch gather is device-local. Point-dropout draws
    are decorrelated per device (key folded with the axis index), so
    exact parity with single-device holds when dropout is off.
    """
    from jax.sharding import PartitionSpec as P

    ndev = mesh.devices.size
    B = cfg.batch_size
    assert B % ndev == 0, (B, ndev)
    B_local = B // ndev
    M, V = records["images"].shape[:2]
    V_use = min(cfg.views_per_step, V)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        # pallas_call inside shard_map rejects out_shapes without vma
        # annotations when the varying-mesh-axes checker is on; every
        # output here is replicated post-pmean, so the check buys nothing
        check_vma=False,
    )
    def run(state, records, key):
        di = jax.lax.axis_index("data")

        def body(carry, _):
            state, key = carry
            # absolute-step keys: see train_steps_scan
            kk = jax.random.fold_in(key, state.step)
            k_m, k_vin, k_tgt, k_drop = jax.random.split(kk, 4)
            # full-batch indices from the shared key; slice per device
            m = jax.random.randint(k_m, (B,), 0, M)
            v_in = jax.random.randint(k_vin, (B,), 0, V)
            perm = jnp.argsort(
                jax.random.uniform(k_tgt, (B, V)), axis=1
            )[:, :V_use]
            sl = di * B_local
            m = jax.lax.dynamic_slice_in_dim(m, sl, B_local)
            v_in = jax.lax.dynamic_slice_in_dim(v_in, sl, B_local)
            perm = jax.lax.dynamic_slice_in_dim(perm, sl, B_local)
            k_drop = jax.random.fold_in(k_drop, di)

            # flat 1-D takes (see train_steps_scan: the broadcast 2-D
            # fancy-gather faults the TPU worker on larger record tables)
            def take_mv(arr, rows):
                flatr = rows.reshape(-1)
                out = arr.reshape((M * V,) + arr.shape[2:])[flatr]
                return out.reshape(rows.shape + arr.shape[2:])

            rows_in = m * V + v_in
            rows_tgt = m[:, None] * V + perm
            batch = {
                "image": take_mv(records["images"], rows_in),
                "masks": take_mv(records["masks"], rows_tgt),
                "depths": take_mv(records["depths"], rows_tgt),
                "quats": take_mv(records["quats"], rows_tgt),
            }
            if cfg.predict_pose:
                batch["quat_in"] = take_mv(records["quats"], rows_in)
            if cfg.pc_rgb:
                batch["images_tgt"] = take_mv(records["images"], rows_tgt)
            if cfg.pose_consistency_weight > 0:
                # mechanism (e): see train_steps_scan
                k_vin2 = jax.random.fold_in(kk, 7)
                v_in2 = (
                    v_in
                    + 1
                    + jax.random.randint(k_vin2, (B_local,), 0, V - 1)
                ) % V
                batch["image_in2"] = take_mv(
                    records["images"], m * V + v_in2
                )
            if cfg.pose_from_views:
                # mechanism (f): see train_steps_scan
                batch["images_v"] = take_mv(records["images"], rows_tgt)

            def loss_fn(params):
                preds = apply_model(cfg, state.apply_fn, params, batch)
                return compute_loss(
                    cfg, preds, batch, state.step, k_drop, train=True
                )

            if cfg.remat:
                loss_fn = jax.checkpoint(loss_fn)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            # the DP all-reduce over ICI (SURVEY.md §2.3)
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            new_state = state.apply_gradients(grads=grads)
            metrics["grad_norm"] = optax.global_norm(grads)
            return (new_state, key), metrics

        (state, _), ms = jax.lax.scan(
            body, (state, key), None, length=n_steps
        )
        return state, jax.tree.map(lambda x: x[-1], ms)

    return run(state, records, key)


def _device_records(dataset: Dataset) -> dict[str, jax.Array]:
    keep = ("images", "masks", "depths", "quats")
    return {
        k: jnp.asarray(v, jnp.float32)
        for k, v in dataset.records.items()
        if k in keep
    }


def _device_block(
    dataset: Dataset, cfg: Config, block_idx: int
) -> dict[str, jax.Array]:
    """Rotate a block of cfg.device_records_models models onto the device.

    The big-dataset path for the device-resident scan (the reference
    streamed via tf.data, dpc/run/train_eval.py; the host-fed per-step
    path is not viable on this runtime — NOTES.md dispatch-leak). The
    block's model indices are a PURE FUNCTION of (seed, block_idx) so a
    resumed run rotates through the identical block sequence, and every
    block has the same static shape, so the scan executable compiles once
    and is reused across rotations.
    """
    M = dataset.num_models
    R = min(cfg.device_records_models, M)
    idx = np.sort(
        np.random.default_rng((cfg.seed, 7, block_idx)).choice(
            M, R, replace=False
        )
    )
    keep = ("images", "masks", "depths", "quats")
    return {
        k: jnp.asarray(np.asarray(v)[idx], jnp.float32)
        for k, v in dataset.records.items()
        if k in keep
    }


class MetricWriter:
    """JSONL + stdout metric logging (stand-in for tf.summary scalars)."""

    def __init__(self, log_dir: str | Path):
        self.path = Path(log_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def write(self, step: int, metrics: dict[str, Any]) -> None:
        rec = {"step": step}
        for k, v in metrics.items():
            rec[k] = float(np.asarray(v))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "MetricWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# Flags whose value changes what a checkpoint's params MEAN without
# changing the param tree: pose_candidate_offsets composes fixed azimuth
# rotations into the candidate quats, so a checkpoint trained one way
# loads cleanly under the other flag but produces rotated candidates at
# eval (ADVICE r2). Recorded in <checkpoint_dir>/config.yaml and checked
# whenever a checkpoint is resumed or evaluated.
_SEMANTIC_FLAGS = (
    "predict_pose",
    "pose_predict_num_candidates",
    "pose_candidate_offsets",
    "pc_rgb",
    "pc_gauss",
)


def record_and_check_run_config(cfg: Config, write: bool = True) -> None:
    """Write the run config next to the checkpoints (first call) or verify
    the semantic flags against the recorded one (later calls / eval)."""
    import yaml

    from dpcx.config import save_config

    path = Path(cfg.checkpoint_dir) / "config.yaml"
    if not path.exists():
        if write:
            save_config(cfg, path)
        return
    with open(path) as f:
        saved = yaml.safe_load(f) or {}
    bad = {
        k: (saved[k], getattr(cfg, k))
        for k in _SEMANTIC_FLAGS
        if k in saved and saved[k] != getattr(cfg, k)
    }
    if bad:
        raise ValueError(
            f"checkpoints in {cfg.checkpoint_dir} were trained with "
            f"different pose/appearance semantics: "
            + ", ".join(
                f"{k}: saved={s!r} vs current={c!r}"
                for k, (s, c) in bad.items()
            )
            + " — evaluate with the recorded flags or point "
            "checkpoint_dir at a fresh run"
        )


def _checkpoint_manager(cfg: Config):
    import orbax.checkpoint as ocp

    path = Path(cfg.checkpoint_dir).absolute() / "ckpt"
    path.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=3, create=True)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(mngr, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    mngr.save(
        int(state.step),
        args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": int(state.step)}
        ),
    )


def restore_checkpoint(mngr, state: TrainState) -> TrainState:
    """Auto-resume from the latest step if a checkpoint exists."""
    import orbax.checkpoint as ocp

    latest = mngr.latest_step()
    if latest is None:
        return state
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": 0}
    restored = mngr.restore(
        latest, args=ocp.args.StandardRestore(target)
    )
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )


def train(
    cfg: Config,
    dataset: Dataset | None = None,
    num_models: int = 200,
    max_steps: int | None = None,
    mesh=None,
    use_checkpoints: bool = True,
    eval_dataset: Dataset | None = None,
) -> tuple[TrainState, list[dict]]:
    """Full training entry (ref: dpc/run/train_eval.py::main)."""
    cfg.validate()
    if mesh is None:
        devices = jax.devices()
        if cfg.shard_points:
            # the device axis is consumed by point sharding inside the
            # loss (models/losses.py -> render/sharded.py); the batch
            # must stay replicated, so the OUTER mesh is trivial
            n = 1
        else:
            # batch must shard evenly: use the largest device count that
            # divides the batch size
            n = len(devices)
            while cfg.batch_size % n:
                n -= 1
        mesh = make_mesh(cfg, devices=devices[:n])
    rng = jax.random.PRNGKey(cfg.seed)
    state = create_state(cfg, rng)
    mngr = _checkpoint_manager(cfg) if use_checkpoints else None
    if mngr is not None:
        record_and_check_run_config(cfg)
        state = restore_checkpoint(mngr, state)
    if mesh.devices.size > 1:
        # Orbax restore commits arrays to a single device; re-place the
        # state replicated over the DP mesh so shard_map accepts it
        from dpcx.parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))

    if dataset is None:
        dataset = load_or_make(cfg, num_models, seed=cfg.seed)

    writer = MetricWriter(cfg.checkpoint_dir)
    # Data randomness is a PURE FUNCTION of (seed, step) — no cumulative
    # key/rng state — so a run resumed from any checkpoint replays the
    # exact batch stream of the uninterrupted run (bit-reproducible
    # resume; VERDICT r2 weak 7). Per-chunk/per-step keys are derived
    # below via fold_in(base_key, step) / default_rng((seed, step)).
    base_key = jax.random.PRNGKey(cfg.seed + 1)

    max_steps = max_steps or cfg.max_number_of_steps
    history: list[dict] = []
    t0 = time.time()
    start_step = int(state.step)

    # host-boundary cadence: the device-resident fast path advances
    # `chunk` steps per host interaction (log/save/eval granularity)
    use_device_data = cfg.device_data and (
        cfg.batch_size % mesh.devices.size == 0
    )
    chunk = max(
        1,
        min(
            cfg.log_every,
            cfg.save_every,
            cfg.eval_every or cfg.save_every,
        ),
    )
    rotate_blocks = (
        use_device_data
        and 0 < cfg.device_records_models < dataset.num_models
    )
    if rotate_blocks:
        block_period = chunk * max(cfg.block_rotate_chunks, 1)
        dev_records, cur_block = None, -1
    else:
        dev_records = _device_records(dataset) if use_device_data else None

    def crossed(prev: int, cur: int, every: int) -> bool:
        # trigger on crossing a multiple of `every` — the device-resident
        # path advances in chunks from an arbitrary resume step, so a plain
        # modulo test could never fire
        return every > 0 and cur // every > prev // every

    trace_state = "armed" if cfg.profile_dir else "off"
    reseed_attempt = 0
    with writer:
        step = start_step
        while step < max_steps:
            prev_step = step
            if trace_state == "armed" and step >= start_step + chunk:
                # one traced chunk per run, after the compile chunk
                # (SURVEY §5 tracing row); view with tensorboard/xprof.
                # cfg itself is never mutated — it is a static jit arg
                # and replacing it would retrace the train step.
                jax.profiler.start_trace(cfg.profile_dir)
                trace_state = "on"
            elif trace_state == "on":
                # the traced chunk was dispatched asynchronously — wait
                # for it, or stop_trace truncates the device events (the
                # final-chunk path below already does this)
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                trace_state = "done"
            if use_device_data:
                n = min(chunk, max_steps - step)
                if rotate_blocks:
                    bi = step // block_period
                    if bi != cur_block:
                        dev_records = _device_block(dataset, cfg, bi)
                        cur_block = bi
                    # keep the chunk inside the block so the data stream
                    # stays a pure function of (seed, step) across resumes
                    n = min(n, (bi + 1) * block_period - step)
                data_key = base_key  # scan derives keys from state.step
                if mesh.devices.size > 1:
                    state, metrics = train_steps_scan_dp(
                        cfg, state, dev_records, data_key, n, mesh
                    )
                else:
                    state, metrics = train_steps_scan(
                        cfg, state, dev_records, data_key, n
                    )
                step += n
                batch = None
            else:
                np_rng = np.random.default_rng((cfg.seed, step))
                batch = dataset.batch(np_rng, cfg.batch_size)
                batch = _prep_batch(batch, cfg)
                batch = shard_batch(batch, mesh)
                state, metrics = train_step(cfg, state, batch, base_key)
                step += 1
            if crossed(prev_step, step, cfg.log_every) or prev_step == start_step:
                metrics = jax.device_get(metrics)
                sps = (step - start_step) / max(time.time() - t0, 1e-9)
                metrics["steps_per_sec"] = sps
                writer.write(step, metrics)
                history.append({"step": step, **{
                    k: float(np.asarray(v)) for k, v in metrics.items()}})
            if (
                cfg.gauge_reseed_threshold_deg > 0
                and reseed_attempt < cfg.gauge_reseed_max_retries
                and prev_step < cfg.gauge_reseed_check_step <= step
            ):
                # detector-triggered re-roll of the pose lottery (see
                # config.gauge_reseed_threshold_deg): abandon an attempt
                # whose gauge never cohered, re-init from a deterministic
                # per-attempt key, restart the step counter. The batch
                # stream stays a pure function of (seed, step).
                gs = float(
                    np.asarray(
                        jax.device_get(metrics).get(
                            "gauge_spread_deg", 0.0
                        )
                    )
                )
                if gs > cfg.gauge_reseed_threshold_deg:
                    reseed_attempt += 1
                    rec = {
                        "gauge_reseed": reseed_attempt,
                        "gauge_spread_deg": gs,
                    }
                    writer.write(step, rec)
                    history.append({"step": step, **rec})
                    state = create_state(
                        cfg,
                        jax.random.PRNGKey(
                            cfg.seed + 7919 * reseed_attempt
                        ),
                    )
                    if mesh.devices.size > 1:
                        from dpcx.parallel.mesh import replicated_sharding

                        state = jax.device_put(
                            state, replicated_sharding(mesh)
                        )
                    if mngr is not None:
                        # the dead attempt's checkpoints would otherwise
                        # win the max-step restore race on resume
                        for s in list(mngr.all_steps()):
                            mngr.delete(s)
                        mngr.wait_until_finished()
                    step = start_step = 0
                    t0 = time.time()
                    continue
            if mngr is not None and crossed(prev_step, step, cfg.save_every):
                save_checkpoint(mngr, state)
                if batch is None:
                    batch = _prep_batch(
                        dataset.batch(
                            np.random.default_rng((cfg.seed, step)),
                            cfg.batch_size,
                        ),
                        cfg,
                    )
                _write_image_summary(cfg, state, batch, step)
            if (
                eval_dataset is not None
                and crossed(prev_step, step, cfg.eval_every or 0)
            ):
                # periodic held-out eval (ref: train_eval.py's periodic eval)
                from dpcx.predict import evaluate

                val = evaluate(
                    cfg, state.params, eval_dataset,
                    batch_size=min(cfg.batch_size, eval_dataset.num_models),
                )
                val_rec = {f"val_{k}": v for k, v in val.items()}
                writer.write(step, val_rec)
                history.append({"step": step, **val_rec})
        if trace_state == "on":  # trace spanned the final chunk
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
        if mngr is not None:
            save_checkpoint(mngr, state)
            mngr.wait_until_finished()
    return state, history


def _write_image_summary(cfg: Config, state: TrainState, batch, step) -> None:
    """Projected-cloud image grids (stand-in for the reference's tf.summary
    image summaries, SURVEY.md §2.2 #20). Best-effort: never fails training."""
    try:
        import numpy as np

        from dpcx.utils.visualise import render_cloud_image, save_image_grid

        preds = state.apply_fn(state.params, batch["image"][:4])
        imgs = [
            render_cloud_image(cfg, preds["points"][i])
            for i in range(min(4, preds["points"].shape[0]))
        ]
        gt = [
            np.asarray(batch["masks"][i, 0], dtype=np.float32)
            for i in range(len(imgs))
        ]
        if imgs and gt and gt[0].shape != imgs[0].shape:
            # foreign-resolution masks (external datasets): match the
            # rendered grid so the side-by-side panel composes
            gt = [
                np.asarray(
                    jax.image.resize(g, imgs[0].shape, method="bilinear")
                )
                for g in gt
            ]
        save_image_grid(
            imgs + gt,
            Path(cfg.checkpoint_dir) / "summaries" / f"proj_{step:07d}.png",
            cols=len(imgs),
        )
    except Exception as e:  # pragma: no cover
        print(f"[dpcx] image summary skipped: {e}")


def _prep_batch(batch: dict, cfg: Config) -> dict:
    """numpy batch -> jnp with the fields the loss expects."""
    out = {
        "image": jnp.asarray(batch["image"], jnp.float32),
        "masks": jnp.asarray(batch["masks"], jnp.float32),
        "quats": jnp.asarray(batch["quats"], jnp.float32),
    }
    if "depths" in batch:
        out["depths"] = jnp.asarray(batch["depths"], jnp.float32)
    if cfg.predict_pose:
        # input-view camera for relative-pose composition
        out["quat_in"] = jnp.asarray(
            batch.get("quat_in", batch["quats"][:, 0]), jnp.float32
        )
    if cfg.pc_rgb and "images_tgt" in batch:
        out["images_tgt"] = jnp.asarray(batch["images_tgt"], jnp.float32)
    if cfg.pose_from_views and "images_v" in batch:
        out["images_v"] = jnp.asarray(batch["images_v"], jnp.float32)
    if "image_in2" in batch:
        out["image_in2"] = jnp.asarray(batch["image_in2"], jnp.float32)
    return out
