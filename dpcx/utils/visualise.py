"""Visualization helpers: render predicted clouds to images for qualitative
inspection.

Reference parity: dpc/util/visualise.py (SURVEY.md §2.2 #23). Uses the dpcx
renderer itself (no matplotlib dependency on the hot path) to produce
depth-shaded silhouette renders, plus a PNG grid writer for summaries.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.geometry.camera import camera_from_view_angles
from dpcx.render.project import pointcloud_project


def render_cloud_image(
    cfg: Config,
    points: jnp.ndarray,
    azimuth: float = 0.7,
    elevation: float = 0.4,
) -> np.ndarray:
    """points [N, 3] -> depth-shaded grayscale image [D, D] in [0, 1]."""
    quat, _ = camera_from_view_angles(
        jnp.asarray(azimuth), jnp.asarray(elevation), cfg.camera_distance
    )
    out = pointcloud_project(
        cfg.replace(proj_depth=True, renderer="xla"),
        points[None],
        quat[None],
        jnp.asarray(1.5 / cfg.vox_size),
    )
    sil = np.asarray(out.silhouette[0])
    depth = np.asarray(out.depth[0])
    mask = sil > 0.3
    shade = np.where(mask, np.clip(1.25 - (depth + 0.5), 0.0, 1.0), 0.0)
    return shade


def save_image_grid(
    images: list[np.ndarray], path: str | Path, cols: int = 4
) -> None:
    """Tile grayscale images into a grid and write a PNG (pure-python PNG
    writer; no imaging dependency)."""
    import struct
    import zlib

    n = len(images)
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    h, w = images[0].shape
    canvas = np.zeros((rows * h, cols * w), dtype=np.float32)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    img8 = (np.clip(canvas, 0, 1) * 255).astype(np.uint8)

    height, width = img8.shape
    raw = b"".join(
        b"\x00" + img8[row].tobytes() for row in range(height)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0),
        )
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(png)
