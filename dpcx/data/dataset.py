"""Dataset container, batch sampling, and npz shard IO.

Reference parity: the tfrecord reader + tf.data input pipeline
(dpc/util/simple_dataset.py, SURVEY.md §2.2 #16): each element yields one
input view plus V candidate projection views (masks, cameras) for the
re-projection loss. Here the reader is a thin numpy-backed sampler producing
fixed-shape batches for jit, and shards are npz files (the TPU-native stack
has no use for tfrecords).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from dpcx.config import Config


class Dataset:
    """In-memory dataset of model records; batches for training.

    records: dict of arrays stacked over models —
      images [M, V, H, W, 3], masks [M, V, D, D], depths [M, V, D, D],
      quats [M, V, 4], gt_points [M, Ngt, 3]
    """

    def __init__(self, records: dict, cfg: Config):
        self.records = {k: np.asarray(v) for k, v in records.items()}
        self.cfg = cfg
        self.num_models = self.records["images"].shape[0]
        self.num_views = self.records["images"].shape[1]

    def batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        """Sample a batch: one random input view per model + views_per_step
        random target views (with replacement across models).

        Mirrors the reference's tf.data shuffle->batch of (input view,
        candidate projection views) tuples (SURVEY.md §3.1).
        """
        V_use = min(self.cfg.views_per_step, self.num_views)
        m = rng.integers(0, self.num_models, size=batch_size)
        v_in = rng.integers(0, self.num_views, size=batch_size)
        v_tgt = np.stack(
            [
                rng.choice(self.num_views, size=V_use, replace=False)
                for _ in range(batch_size)
            ]
        )
        bi = np.arange(batch_size)[:, None]
        batch = {
            "image": self.records["images"][m, v_in],
            "masks": self.records["masks"][m[:, None], v_tgt],
            "depths": self.records["depths"][m[:, None], v_tgt],
            "quats": self.records["quats"][m[:, None], v_tgt],
            "quat_in": self.records["quats"][m, v_in],
            "model_idx": m,
        }
        if self.cfg.pc_rgb:
            # target-view RGB renders for the color re-projection loss
            # (config 5 of BASELINE.json; no reference counterpart beyond
            # the rgb channels of pointcloud2voxels3d_fast)
            batch["images_tgt"] = self.records["images"][m[:, None], v_tgt]
        if self.cfg.pose_from_views:
            # mechanism (f): each target view's pose is predicted from
            # that view's own image (same rows as the masks)
            batch["images_v"] = self.records["images"][m[:, None], v_tgt]
        if self.cfg.pose_consistency_weight > 0 and self.num_views >= 2:
            # mechanism (e): a second input view of the same model
            v_in2 = (
                v_in
                + 1
                + rng.integers(0, self.num_views - 1, size=batch_size)
            ) % self.num_views
            batch["image_in2"] = self.records["images"][m, v_in2]
        return batch

    def eval_batch(self, model_idx: np.ndarray, view_idx: int = 0) -> dict:
        return {
            "image": self.records["images"][model_idx, view_idx],
            "quats": self.records["quats"][model_idx, view_idx],
            "gt_points": self.records["gt_points"][model_idx],
        }


def load_external(
    pattern: str | Path, cfg: Config, limit: int | None = None
) -> Dataset:
    """Ingest externally produced npz shards (e.g. real ShapeNet renders)
    behind the same Dataset interface.

    Each shard must hold per-model arrays with matching view counts:
    ``images [M, V, H, W, 3]`` float in [0,1], ``masks [M, V, D, D]``,
    ``quats [M, V, 4]`` (w,x,y,z world->camera, SURVEY camera conventions),
    optional ``depths [M, V, D, D]`` and ``gt_points [M, Ngt, 3]``.
    Shards are concatenated along the model axis. This replaces the
    reference's tfrecord ingestion of Blender renders (SURVEY.md §2.2 #16).
    """
    import glob as _glob

    paths = sorted(_glob.glob(str(pattern)))
    if not paths:
        raise FileNotFoundError(f"no shards match {pattern}")
    parts = [load_shards(p) for p in paths]
    keys = set(parts[0])
    for p in parts[1:]:
        keys &= set(p)
    records = {
        k: np.concatenate([np.asarray(p[k]) for p in parts], axis=0)
        for k in keys
    }
    if "depths" not in records:
        records["depths"] = np.ones_like(records["masks"], np.float32)
    if "gt_points" not in records:
        records["gt_points"] = np.zeros(
            (records["images"].shape[0], 1, 3), np.float32
        )
    if limit:
        records = {k: v[:limit] for k, v in records.items()}
    return Dataset(records, cfg)


def save_shards(records: dict, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in records.items()}
    )


def load_shards(path: str | Path) -> dict:
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def load_or_make(cfg: Config, num_models: int, seed: int = 0) -> Dataset:
    """Load cached shards if present, else generate + cache.

    cfg.dataset == "npz" ingests externally produced shards from
    cfg.data_dir instead of generating synthetic data."""
    from dpcx.data.synthetic import make_dataset

    if cfg.dataset == "npz":
        return load_external(
            Path(cfg.data_dir) / "*.npz", cfg, limit=num_models or None
        )

    cache = (
        Path(cfg.data_dir)
        / f"{cfg.category}_m{num_models}_v{cfg.num_views}"
          f"_d{cfg.vox_size}_s{seed}.npz"
    )
    if cache.exists():
        return Dataset(load_shards(cache), cfg)
    records = make_dataset(cfg, num_models, seed=seed)
    records = jax.tree.map(np.asarray, records)
    save_shards(records, cache)
    return Dataset(records, cfg)
