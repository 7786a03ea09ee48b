"""Multi-frame RGBD stitching — API-parity port of the reference stitcher.

Public surface mirrors ``stitcher.py:9-258`` (``RGBDStitcher`` with
``create_point_cloud_from_rgbd``, ``preprocess_point_cloud``,
``register_point_clouds``, ``stitch_sequence``, ``load_default``,
``load_dataset_two_folders``, ``load_dataset_realsense``) with the same
defaults (voxel 0.02 m, distance threshold 0.05 m, colored-ICP then
point-to-point refinement, every-2-frames downsample + statistical outlier
removal 20/2.0).

Differences by design:
  * Open3D C++ -> reconplan_tpu.ops JAX kernels; the per-frame register
    loop runs as a handful of device dispatches.
  * Clouds are fixed-capacity (points + mask); the growing "combined"
    model cloud lives in a preallocated device buffer.
  * Known camera poses (e.g. from robot FK) can seed each registration —
    the reference always started from identity (``stitcher.py:77``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from reconplan_tpu.io.frames import load_rgbd_folder
from reconplan_tpu.ops.icp import (
    color_gradients,
    colored_icp,
    icp_point_to_point,
)
from reconplan_tpu.ops.pointcloud import (
    PointCloud,
    backproject_depth,
    estimate_normals,
    make_cloud,
    remove_statistical_outliers,
    voxel_downsample,
)


class PinholeIntrinsic:
    """Minimal stand-in for o3d.camera.PinholeCameraIntrinsic."""

    def __init__(self, width, height, fx, fy, cx, cy):
        self.width, self.height = width, height
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy


class RGBDStitcher:
    def __init__(self, intrinsic: PinholeIntrinsic):
        self.intrinsic = intrinsic
        self.voxel_size = 0.02  # stitcher.py:17
        self.distance_threshold = 0.05  # stitcher.py:18
        self.optimization_modulus = 2  # stitcher.py:19
        self.model_capacity = 1 << 18  # fixed device buffer for the model

    # ------------------------------------------------------------------
    def create_point_cloud_from_rgbd(self, color_img, depth_img) -> PointCloud:
        """RGBD -> camera-frame cloud (``stitcher.py:21-48`` semantics:
        depth_scale 1000, trunc 3 m)."""
        return backproject_depth(
            jnp.asarray(depth_img),
            self.intrinsic.fx,
            self.intrinsic.fy,
            self.intrinsic.cx,
            self.intrinsic.cy,
            color=jnp.asarray(color_img) if color_img is not None else None,
            depth_scale=1000.0,
            depth_trunc=3.0,
        )

    def preprocess_point_cloud(self, pcd: PointCloud) -> PointCloud:
        """Downsample + estimate normals (``stitcher.py:50-71``; the FPFH
        the reference computed there was never consumed — see
        ops.features for the standalone FPFH op)."""
        down = voxel_downsample(pcd, self.voxel_size)
        return estimate_normals(down, k=30)

    def register_point_clouds(self, source: PointCloud, target: PointCloud,
                              initial_transform=None):
        """Colored-ICP (when colors exist) then point-to-point refinement
        (``stitcher.py:73-112``). Returns (T (4,4) np, fitness float)."""
        src = self.preprocess_point_cloud(source)
        tgt = self.preprocess_point_cloud(target)
        T = (
            jnp.eye(4)
            if initial_transform is None
            else jnp.asarray(initial_transform, dtype=jnp.float32)
        )
        if source.has_colors and target.has_colors:
            grads = color_gradients(tgt)
            res_col = colored_icp(
                src, tgt, grads, self.distance_threshold, init=T, max_iteration=50
            )
            T = res_col.transformation
        res = icp_point_to_point(
            src, tgt, self.distance_threshold, init=T, max_iteration=30
        )
        return np.asarray(res.transformation), float(res.fitness)

    # ------------------------------------------------------------------
    def _append_to_model(self, model: PointCloud, cloud: PointCloud, T) -> PointCloud:
        """Transform ``cloud`` by T and append into the fixed-capacity
        model buffer (drops points if capacity is exceeded, oldest kept)."""
        R = jnp.asarray(T, dtype=jnp.float32)
        pts = jnp.matmul(
            cloud.points, R[:3, :3].T, precision=jax.lax.Precision.HIGHEST
        ) + R[:3, 3]
        new_pts = np.concatenate([np.asarray(model.points), np.asarray(pts)])
        new_valid = np.concatenate([np.asarray(model.valid), np.asarray(cloud.valid)])
        if model.has_colors and cloud.has_colors:
            new_col = np.concatenate([np.asarray(model.colors), np.asarray(cloud.colors)])
        else:
            new_col = None
        if len(new_pts) > self.model_capacity:
            # keep valid points preferentially
            order = np.argsort(~new_valid, kind="stable")[: self.model_capacity]
            order.sort()
            new_pts, new_valid = new_pts[order], new_valid[order]
            if new_col is not None:
                new_col = new_col[order]
        return make_cloud(new_pts, colors=new_col, valid=new_valid)

    def stitch_sequence(self, color_images, depth_images, poses=None) -> PointCloud:
        """Incremental frame-to-model stitching (``stitcher.py:114-166``):
        register frame i to the merged model, transform + append, and every
        ``optimization_modulus`` frames re-downsample and remove outliers.

        ``poses`` (optional (F, 4, 4) cam->world) seeds each registration —
        pass robot-FK camera poses for the scan-plan-capture loop.
        """
        if len(color_images) != len(depth_images):
            raise ValueError("Number of color and depth images must match")

        combined = self.create_point_cloud_from_rgbd(color_images[0], depth_images[0])
        if poses is not None:
            T0 = np.asarray(poses[0], dtype=np.float32)
            combined = make_cloud(
                np.asarray(combined.points) @ T0[:3, :3].T + T0[:3, 3],
                colors=np.asarray(combined.colors) if combined.has_colors else None,
                valid=np.asarray(combined.valid),
            )

        for i in range(1, len(color_images)):
            current = self.create_point_cloud_from_rgbd(color_images[i], depth_images[i])
            init = poses[i] if poses is not None else None
            T, fitness = self.register_point_clouds(current, combined, init)
            combined = self._append_to_model(combined, current, T)

            if i % self.optimization_modulus == 0:  # stitcher.py:139
                combined = voxel_downsample(combined, self.voxel_size)
                if combined.count() > 1000:
                    combined = remove_statistical_outliers(combined, 20, 2.0)
        return combined

    # ------------------------------------------------------------------
    # dataset loaders (stitcher.py:202-258)
    # ------------------------------------------------------------------
    def load_default(self):
        return self.load_dataset_two_folders("./camera", "rgb", "depth")

    def load_dataset_two_folders(self, folder_path, rgb_foldername, depth_foldername):
        fs = load_rgbd_folder(
            folder_path,
            rgb_foldername,
            depth_foldername,
            truncate_to_multiple=self.optimization_modulus,
        )
        return list(fs.color), list(fs.depth)

    def load_dataset_realsense(self, rgb_folder, depth_folder):
        import os

        parent = os.path.dirname(rgb_folder.rstrip("/"))
        fs = load_rgbd_folder(
            parent,
            os.path.basename(rgb_folder.rstrip("/")),
            os.path.basename(depth_folder.rstrip("/")),
            truncate_to_multiple=self.optimization_modulus,
        )
        return list(fs.color), list(fs.depth)
