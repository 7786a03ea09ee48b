"""Point-cloud primitives: backprojection, voxel filtering, normals, outliers.

Replaces the Open3D C++ calls in the reference's ``stitcher.py``:
  - ``create_point_cloud_from_rgbd`` (stitcher.py:21-48) -> backproject_depth
  - ``voxel_down_sample`` (stitcher.py:58,151)           -> voxel_downsample
  - ``estimate_normals`` (stitcher.py:62-63)             -> estimate_normals
  - ``remove_statistical_outlier`` (stitcher.py:158-159) -> remove_statistical_outliers

All kernels are fixed-shape: clouds are (N, 3) arrays with a (N,) validity
mask; filters return same-size arrays with updated masks instead of
compacting (compaction is a host-side convenience, ``compact()``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reconplan_tpu.ops.nn import knn


class PointCloud(NamedTuple):
    """Fixed-capacity point cloud: (N, 3) positions + mask (+ optional
    colors/normals, zero-sized when absent)."""

    points: jnp.ndarray  # (N, 3)
    valid: jnp.ndarray  # (N,) bool
    colors: jnp.ndarray  # (N, 3) in [0, 1], or (0, 3)
    normals: jnp.ndarray  # (N, 3), or (0, 3)

    @property
    def has_colors(self):
        return self.colors.shape[0] == self.points.shape[0]

    @property
    def has_normals(self):
        return self.normals.shape[0] == self.points.shape[0]

    def count(self):
        return int(jnp.sum(self.valid))

    def compact(self):
        """Host-side: drop invalid points (dynamic shape — not jittable)."""
        m = np.asarray(self.valid)
        pts = np.asarray(self.points)[m]
        cols = np.asarray(self.colors)[m] if self.has_colors else np.zeros((0, 3), np.float32)
        nrms = np.asarray(self.normals)[m] if self.has_normals else np.zeros((0, 3), np.float32)
        return pts, cols, nrms


def make_cloud(points, colors=None, normals=None, valid=None) -> PointCloud:
    points = jnp.asarray(points, dtype=jnp.float32)
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    empty = jnp.zeros((0, 3), dtype=jnp.float32)
    return PointCloud(
        points,
        jnp.asarray(valid),
        jnp.asarray(colors, dtype=jnp.float32) if colors is not None else empty,
        jnp.asarray(normals, dtype=jnp.float32) if normals is not None else empty,
    )


@partial(jax.jit, static_argnames=("depth_scale", "depth_trunc"))
def backproject_depth(
    depth,  # (H, W) raw depth
    fx, fy, cx, cy,  # pinhole intrinsics (scalars)
    color=None,  # optional (H, W, 3) in [0, 255] or [0, 1]
    depth_scale: float = 1000.0,
    depth_trunc: float = 3.0,
):
    """Depth (+RGB) image -> camera-frame point cloud.

    Matches Open3D ``RGBDImage.create_from_color_and_depth`` +
    ``PointCloud.create_from_rgbd_image`` semantics used at
    ``stitcher.py:38-48``: metric depth = raw / depth_scale, truncated at
    ``depth_trunc`` meters; pixel (u, v) backprojects through the pinhole.

    Returns a PointCloud with N = H*W (invalid pixels masked, not dropped).
    """
    H, W = depth.shape
    z = depth.astype(jnp.float32) / depth_scale
    valid = jnp.logical_and(z > 0.0, z < depth_trunc)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = valid.reshape(-1)
    if color is not None:
        c = color.astype(jnp.float32).reshape(-1, 3)
        c = jnp.where(jnp.max(c) > 1.5, c / 255.0, c)
        return make_cloud(pts, colors=c, valid=valid)
    return make_cloud(pts, valid=valid)


@partial(jax.jit, static_argnames=("voxel_size", "grid_extent"))
def voxel_downsample(cloud: PointCloud, voxel_size: float, grid_extent=None):
    """Average points within each voxel (Open3D ``voxel_down_sample``).

    Exact, fixed-shape algorithm:
      1. quantize to voxel ids packed into int32 (2^10 cells per axis).
         The packable window spans ±512 voxels around the valid points'
         centroid (auto-centered on device) unless ``grid_extent`` pins a
         fixed ±extent around the origin; points outside the window clamp
         into edge cells (merged conservatively),
      2. sort by id, mark segment starts, build dense segment indices with a
         cumulative sum,
      3. segment-mean positions/colors/normals into N output slots.

    Output capacity equals input capacity; slot i is valid iff it is the
    representative (mean) of a distinct occupied voxel.
    """
    n = cloud.points.shape[0]
    inv = 1.0 / voxel_size
    cells = 1 << 10  # 3 * 10 bits packs into int32
    if grid_extent is not None:
        if int(2 * grid_extent * inv) > cells:
            raise ValueError(
                f"grid_extent {grid_extent} too large for voxel {voxel_size}: "
                f"needs more than {cells} cells/axis"
            )
        center = jnp.zeros(3, dtype=jnp.float32)
    else:
        w = cloud.valid.astype(jnp.float32)
        center = jnp.sum(cloud.points * w[:, None], axis=0) / jnp.maximum(
            jnp.sum(w), 1.0
        )
        # snap to the voxel lattice so cell boundaries stay origin-aligned
        # (Open3D semantics: boundaries at integer multiples of voxel_size)
        center = jnp.round(center * inv) * voxel_size
    half_span = (cells // 2) * voxel_size
    q = jnp.clip(
        jnp.floor((cloud.points - center + half_span) * inv).astype(jnp.int32),
        0,
        cells - 1,
    )
    ids = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
    # push invalid points to the end of the sort order
    ids = jnp.where(cloud.valid, ids, jnp.int32(2**31 - 1))

    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    pts_sorted = cloud.points[order]
    valid_sorted = cloud.valid[order]

    starts = jnp.concatenate(
        [jnp.ones(1, dtype=bool), ids_sorted[1:] != ids_sorted[:-1]]
    )
    seg = jnp.cumsum(starts.astype(jnp.int32)) - 1  # dense segment index

    w = valid_sorted.astype(jnp.float32)
    sums = jax.ops.segment_sum(pts_sorted * w[:, None], seg, num_segments=n)
    counts = jax.ops.segment_sum(w, seg, num_segments=n)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    out_valid = counts > 0.0

    def seg_mean(x_sorted):
        s = jax.ops.segment_sum(x_sorted * w[:, None], seg, num_segments=n)
        return s / jnp.maximum(counts, 1.0)[:, None]

    colors = (
        seg_mean(cloud.colors[order])
        if cloud.has_colors
        else jnp.zeros((0, 3), dtype=jnp.float32)
    )
    normals = cloud.normals
    if cloud.has_normals:
        nm = seg_mean(cloud.normals[order])
        normals = nm / jnp.maximum(jnp.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)
    return PointCloud(means, out_valid, colors, normals)


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(cloud: PointCloud, k: int = 30):
    """Per-point normals from the k-NN covariance (Open3D
    ``estimate_normals`` with KDTreeSearchParamHybrid, stitcher.py:62-63;
    radius gating is dropped — dense top-k dominates at these sizes).

    Normals are the smallest-eigenvalue eigenvector of the local covariance,
    oriented toward the origin (camera) like Open3D's default for clouds
    born from RGBD frames.
    """
    _, idx = knn(cloud.points, cloud.points, k, valid=cloud.valid)
    nbrs = cloud.points[idx]  # (N, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum(
        "nki,nkj->nij", centered, centered, precision=jax.lax.Precision.HIGHEST
    ) / k
    # smallest eigenvector of each 3x3 symmetric matrix
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    # orient toward viewpoint at origin
    flip = jnp.sum(normals * cloud.points, axis=-1) > 0
    normals = jnp.where(flip[:, None], -normals, normals)
    return PointCloud(cloud.points, cloud.valid, cloud.colors, normals)


@partial(jax.jit, static_argnames=("nb_neighbors",))
def remove_statistical_outliers(
    cloud: PointCloud, nb_neighbors: int = 20, std_ratio: float = 2.0
):
    """Open3D ``remove_statistical_outlier`` (stitcher.py:158-159):
    points whose mean k-NN distance exceeds (mean + std_ratio * std) of the
    per-point means are masked out."""
    d, _ = knn(cloud.points, cloud.points, nb_neighbors + 1, valid=cloud.valid)
    mean_d = jnp.mean(d[:, 1:], axis=-1)  # skip self
    mean_d = jnp.where(cloud.valid, mean_d, 0.0)
    n_valid = jnp.maximum(jnp.sum(cloud.valid), 1)
    mu = jnp.sum(mean_d) / n_valid
    var = jnp.sum(jnp.where(cloud.valid, (mean_d - mu) ** 2, 0.0)) / n_valid
    thresh = mu + std_ratio * jnp.sqrt(var)
    keep = jnp.logical_and(cloud.valid, mean_d <= thresh)
    return PointCloud(cloud.points, keep, cloud.colors, cloud.normals)
