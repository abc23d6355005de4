"""Device mesh + sharding for data-parallel training over ICI.

No reference counterpart — the reference is one GPU, one tf.Session
(SURVEY.md §2.3). TPU-native design: a 1-D "data" mesh; the batch is sharded
over it, parameters and optimizer state are replicated, and jit/XLA insert
the gradient all-reduce over ICI (the NamedSharding-in-jit formulation of the
scaling-book DP recipe — no hand-written collectives needed for pure DP).

Point/grid sharding inside the renderer (points axis sharded, grids
psum-reduced) is the scale-up lever described in SURVEY.md §2.3 and rides the
same mesh via shard_map in dpcx.render.sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpcx.config import Config


def make_mesh(
    cfg: Config | None = None, devices: list | None = None
) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    axes = cfg.mesh_axes if cfg is not None else ("data",)
    shape = cfg.mesh_shape if cfg is not None else (-1,)
    shape = tuple(len(devices) if s == -1 else s for s in shape)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
