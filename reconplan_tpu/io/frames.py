"""RGBD frame feeds — the host->device boundary for camera data.

Protocol-shaped replacement for the reference's three capture paths:
  - recorded directories (``stitcher.py:202-258`` load_default /
    load_dataset_two_folders / load_dataset_realsense),
  - PyBullet's rendered wrist camera (``bullet_camera.py``) — replaced by
    the on-device splat renderer in :mod:`reconplan_tpu.io.render`,
  - librealsense capture (``data_recorder.py:55-153``) — host-side driver
    stub, same FrameSet output.

A feed yields ``FrameSet`` batches: stacked depth (+color, +poses) arrays
ready to ship to device in one transfer.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class FrameSet:
    """A batch of RGBD frames with optional camera poses (cam->world)."""

    depth: np.ndarray  # (F, H, W) raw depth (depth_scale units)
    color: np.ndarray | None = None  # (F, H, W, 3) uint8 or float [0,1]
    poses: np.ndarray | None = None  # (F, 4, 4) cam->world, if known
    depth_scale: float = 1000.0
    intrinsics: tuple | None = None  # (fx, fy, cx, cy)

    def __len__(self):
        return len(self.depth)


def _read_image(path):
    import PIL.Image

    return np.asarray(PIL.Image.open(path))


def load_rgbd_folder(
    folder_path,
    rgb_foldername="rgb",
    depth_foldername="depth",
    truncate_to_multiple=None,
) -> FrameSet:
    """Load a recorded capture directory.

    Handles both reference layouts: PNG depth (sim path,
    ``load_dataset_two_folders``) and ``.npy`` float depth (RealSense path,
    ``load_dataset_realsense``). ``truncate_to_multiple`` mirrors the
    reference's optimization_modulus trimming (``stitcher.py:228-232``).
    Reads ``metadata.json`` for intrinsics when present
    (``data_recorder.py:304-315`` format).
    """
    rgb_dir = os.path.join(folder_path, rgb_foldername)
    depth_dir = os.path.join(folder_path, depth_foldername)
    rgbs, depths = [], []
    for name in sorted(os.listdir(rgb_dir)):
        rgbs.append(_read_image(os.path.join(rgb_dir, name))[..., :3])
    for name in sorted(os.listdir(depth_dir)):
        p = os.path.join(depth_dir, name)
        if name.endswith(".npy"):
            depths.append(np.load(p))
        else:
            depths.append(_read_image(p))
    if truncate_to_multiple:
        n = len(rgbs) - (len(rgbs) % truncate_to_multiple)
        rgbs, depths = rgbs[:n], depths[:n]

    intrinsics = None
    meta_path = os.path.join(folder_path, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        intr = meta.get("camera_intrinsics") or meta.get("intrinsics")
        if intr:
            intrinsics = (intr["fx"], intr["fy"], intr["cx"] if "cx" in intr else intr["ppx"],
                          intr["cy"] if "cy" in intr else intr["ppy"])
    return FrameSet(
        depth=np.stack(depths).astype(np.float32),
        color=np.stack(rgbs),
        intrinsics=intrinsics,
    )


class DirectoryFrameFeed:
    """Iterate a recorded directory in fixed-size batches."""

    def __init__(self, folder_path, batch_size=8, **kwargs):
        self.frames = load_rgbd_folder(folder_path, **kwargs)
        self.batch_size = batch_size

    def __iter__(self):
        f = self.frames
        for i in range(0, len(f), self.batch_size):
            sl = slice(i, i + self.batch_size)
            yield FrameSet(
                f.depth[sl],
                f.color[sl] if f.color is not None else None,
                f.poses[sl] if f.poses is not None else None,
                f.depth_scale,
                f.intrinsics,
            )


class ArrayFrameFeed:
    """Feed over in-memory arrays (synthetic renders, tests)."""

    def __init__(self, frameset: FrameSet, batch_size=8):
        self.frames = frameset
        self.batch_size = batch_size

    def __iter__(self):
        f = self.frames
        for i in range(0, len(f), self.batch_size):
            sl = slice(i, i + self.batch_size)
            yield FrameSet(
                f.depth[sl],
                f.color[sl] if f.color is not None else None,
                f.poses[sl] if f.poses is not None else None,
                f.depth_scale,
                f.intrinsics,
            )
