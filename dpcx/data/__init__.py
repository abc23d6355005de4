"""Data pipeline: jit-compiled synthetic datagen + shard IO + batching.

Replaces the reference's offline Blender multi-view rendering + tfrecord
reader (SURVEY.md §2.2 #16, #22; §3.5): here dataset generation is a
jit-compiled preprocessor (per BASELINE.json's north star) producing
(image, mask, depth, camera-quaternion) tuples for V views per model, plus a
dense GT point cloud for Chamfer eval (the reference's "densify" step).
"""

from dpcx.data.synthetic import make_dataset, sample_category_points
from dpcx.data.dataset import (
    Dataset,
    load_external,
    load_shards,
    save_shards,
)

__all__ = [
    "make_dataset",
    "sample_category_points",
    "Dataset",
    "load_external",
    "save_shards",
    "load_shards",
]
