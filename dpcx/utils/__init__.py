"""Utilities: profiling harness, visualization helpers."""

from dpcx.utils.profiling import benchmark_fn, trace
from dpcx.utils.visualise import render_cloud_image, save_image_grid

__all__ = ["benchmark_fn", "trace", "render_cloud_image", "save_image_grid"]
