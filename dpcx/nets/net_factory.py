"""Network registry: string -> module constructor.

Reference parity: dpc/nets/net_factory.py::get_network (SURVEY.md §2.2 #13).
Lets experiment YAMLs select architectures by name and downstream code build
them without import cycles.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_network(name: str) -> Callable:
    def deco(ctor: Callable) -> Callable:
        _REGISTRY[name] = ctor
        return ctor

    return deco


def get_network(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown network '{name}'. Registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _register_defaults() -> None:
    from dpcx.nets.img_encoder import ImageEncoder
    from dpcx.nets.pc_decoder import PointCloudDecoder
    from dpcx.nets.pose import PoseHead

    _REGISTRY.setdefault("img_encoder", ImageEncoder)
    _REGISTRY.setdefault("pc_decoder", PointCloudDecoder)
    _REGISTRY.setdefault("pose_head", PoseHead)


_register_defaults()
