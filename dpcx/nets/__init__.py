"""Trainable Flax modules (ref: dpc/nets/)."""

from dpcx.nets.img_encoder import ImageEncoder
from dpcx.nets.pc_decoder import PointCloudDecoder
from dpcx.nets.pose import PoseHead
from dpcx.nets.net_factory import get_network, register_network

__all__ = [
    "ImageEncoder",
    "PointCloudDecoder",
    "PoseHead",
    "get_network",
    "register_network",
]
