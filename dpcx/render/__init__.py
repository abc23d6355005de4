"""Differentiable point-cloud renderer.

The four-stage pipeline of the reference (SURVEY.md §1):
  1. pose/perspective transform      (transform.py)
  2. trilinear scatter-splat         (voxelize.py)
  3. separable 3D Gaussian smoothing (gauss.py)
  4. DRC expected-visibility ray reduction (drc.py)

``project.py`` composes them (ref: dpc/util/point_cloud.py::
pointcloud_project_fast); ``pallas_kernel.py`` is the fused TPU kernel
behind the same interface.
"""

from dpcx.render.transform import pc_perspective_transform
from dpcx.render.voxelize import (
    pointcloud2voxels_scatter,
    pointcloud2voxels_matmul,
    pc_point_dropout_weights,
)
from dpcx.render.gauss import gauss_kernel_1d, blur_matrix, smoothen_voxels3d
from dpcx.render.drc import drc_projection, sum_projection
from dpcx.render.project import RenderOut, pointcloud_project, sigma_schedule

__all__ = [
    "pc_perspective_transform",
    "pointcloud2voxels_scatter",
    "pointcloud2voxels_matmul",
    "pc_point_dropout_weights",
    "gauss_kernel_1d",
    "blur_matrix",
    "smoothen_voxels3d",
    "drc_projection",
    "sum_projection",
    "RenderOut",
    "pointcloud_project",
    "sigma_schedule",
]
