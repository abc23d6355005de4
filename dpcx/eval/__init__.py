"""Evaluation: Chamfer distance, pose metrics, canonical alignment.

Reference parity: dpc/util/point_cloud_distance.py + eval logic in dpc/run/
(SURVEY.md §2.2 #18, §3.2).
"""

from dpcx.eval.chamfer import chamfer_distance, directed_distance
from dpcx.eval.iou import voxel_iou
from dpcx.eval.pose_metrics import pose_error_metrics, align_canonical_frame

__all__ = [
    "chamfer_distance",
    "directed_distance",
    "voxel_iou",
    "pose_error_metrics",
    "align_canonical_frame",
]
