"""Parallelism: device mesh + sharding helpers.

The reference has NO distribution layer (single GPU tf.Session, SURVEY.md
§2.3); this package is the new TPU-native capability: data-parallel batch
sharding over ICI via jax.sharding, with XLA inserting the gradient psum.
"""

from dpcx.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
