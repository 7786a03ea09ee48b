"""Tests for point-cloud ops and NN kernels against numpy/scipy golden values."""

import numpy as np
import pytest

import jax.numpy as jnp

from reconplan_tpu.ops import (
    backproject_depth,
    estimate_normals,
    knn,
    nearest_neighbor,
    pairwise_sqdist,
    remove_statistical_outliers,
    se3_knn,
    voxel_downsample,
)
from reconplan_tpu.ops.pointcloud import make_cloud

RNG = np.random.default_rng(0)


class TestNN:
    def test_pairwise_sqdist_matches_numpy(self):
        x = RNG.normal(size=(50, 3)).astype(np.float32)
        y = RNG.normal(size=(70, 3)).astype(np.float32)
        d = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
        expected = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, expected, atol=1e-4)

    @pytest.mark.slow
    def test_knn_matches_sklearn(self):
        from sklearn.neighbors import NearestNeighbors

        pts = RNG.normal(size=(500, 3)).astype(np.float32)
        q = RNG.normal(size=(40, 3)).astype(np.float32)
        d, idx = knn(jnp.asarray(q), jnp.asarray(pts), 5)
        ref = NearestNeighbors(n_neighbors=5).fit(pts)
        rd, ridx = ref.kneighbors(q)
        np.testing.assert_array_equal(np.asarray(idx), ridx)
        np.testing.assert_allclose(np.asarray(d), rd, atol=1e-4)

    def test_knn_respects_valid_mask(self):
        pts = np.zeros((10, 3), dtype=np.float32)
        pts[5] = [10, 10, 10]
        valid = np.ones(10, bool)
        valid[:5] = False
        valid[6:] = False  # only point 5 valid
        _, idx = knn(jnp.zeros((1, 3)), jnp.asarray(pts), 1, valid=jnp.asarray(valid))
        assert int(idx[0, 0]) == 5

    def test_nearest_neighbor(self):
        pts = RNG.normal(size=(300, 3)).astype(np.float32)
        q = RNG.normal(size=(17, 3)).astype(np.float32)
        d, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(pts))
        expected = np.linalg.norm(q[:, None] - pts[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), expected.argmin(1))

    def test_se3_knn_matches_reference_metric(self):
        from reconplan_tpu.core import maths

        def se3_np(p1, p2):
            return np.linalg.norm(p1[:3] - p2[:3]) + 0.3 * (
                1 - abs(np.dot(p1[3:7], p2[3:7]))
            )

        q = RNG.normal(size=(100, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pts = np.concatenate([RNG.normal(size=(100, 3)), q], -1).astype(np.float32)
        d, idx = se3_knn(jnp.asarray(pts[:5]), jnp.asarray(pts), 3)
        for i in range(5):
            ref_d = np.array([se3_np(pts[i], p) for p in pts])
            np.testing.assert_array_equal(np.asarray(idx[i]), np.argsort(ref_d)[:3])
            np.testing.assert_allclose(np.asarray(d[i]), np.sort(ref_d)[:3], atol=1e-4)


class TestBackprojection:
    def test_pinhole_roundtrip(self):
        """Project known 3D points to a synthetic depth image and backproject."""
        fx, fy, cx, cy = 615.67, 615.96, 326.06, 240.56  # main.py:241-244
        H, W = 480, 640
        depth = np.zeros((H, W), np.float32)
        # fill a synthetic plane at 1.5 m
        depth[:] = 1500.0  # raw units (mm with depth_scale 1000)
        cloud = backproject_depth(jnp.asarray(depth), fx, fy, cx, cy)
        pts = np.asarray(cloud.points).reshape(H, W, 3)
        assert np.allclose(pts[..., 2], 1.5, atol=1e-5)
        # center pixel maps to the optical axis
        np.testing.assert_allclose(
            pts[int(cy), int(cx), :2], [0, 0], atol=2e-3
        )
        # a known pixel: x = (u - cx) * z / fx
        u, v = 400, 100
        np.testing.assert_allclose(
            pts[v, u, 0], (u - cx) * 1.5 / fx, atol=1e-5
        )

    def test_truncation_and_invalid(self):
        depth = np.array([[0.0, 500.0], [4000.0, 2999.0]], np.float32)
        cloud = backproject_depth(jnp.asarray(depth), 1.0, 1.0, 0.5, 0.5,
                                  depth_scale=1000.0, depth_trunc=3.0)
        valid = np.asarray(cloud.valid)
        np.testing.assert_array_equal(valid, [False, True, False, True])

    def test_colors_normalized(self):
        depth = np.full((4, 4), 1000.0, np.float32)
        color = np.full((4, 4, 3), 128.0, np.float32)
        cloud = backproject_depth(
            jnp.asarray(depth), 1.0, 1.0, 2.0, 2.0, color=jnp.asarray(color)
        )
        assert cloud.has_colors
        np.testing.assert_allclose(np.asarray(cloud.colors), 128 / 255.0, atol=1e-6)


class TestVoxelDownsample:
    def test_means_within_voxels(self):
        # two clusters of 4 points each in distinct 0.1-voxels
        a = np.array([[0.01, 0.01, 0.01], [0.02, 0.03, 0.01],
                      [0.03, 0.02, 0.04], [0.04, 0.04, 0.02]], np.float32)
        b = a + 1.0
        cloud = make_cloud(np.vstack([a, b]))
        out = voxel_downsample(cloud, 0.1)
        pts = np.asarray(out.points)[np.asarray(out.valid)]
        assert len(pts) == 2
        got = pts[np.argsort(pts[:, 0])]
        np.testing.assert_allclose(got[0], a.mean(0), atol=1e-6)
        np.testing.assert_allclose(got[1], b.mean(0), atol=1e-6)

    def test_invalid_points_excluded(self):
        pts = np.array([[0.0, 0, 0], [0.05, 0, 0], [5.0, 5, 5]], np.float32)
        valid = np.array([True, True, False])
        out = voxel_downsample(make_cloud(pts, valid=valid), 0.1)
        kept = np.asarray(out.points)[np.asarray(out.valid)]
        assert len(kept) == 1
        np.testing.assert_allclose(kept[0], [0.025, 0, 0], atol=1e-6)

    def test_matches_open3d_voxel_structure(self):
        """Grid quantization boundaries: floor(p / voxel)."""
        pts = np.array([[0.019, 0, 0], [0.021, 0, 0]], np.float32)
        out = voxel_downsample(make_cloud(pts), 0.02)
        assert int(np.asarray(out.valid).sum()) == 2  # straddle the boundary


class TestNormals:
    def test_plane_normals(self):
        # points on z=0 plane -> normals +-z
        pts = RNG.uniform(-1, 1, (256, 3)).astype(np.float32)
        pts[:, 2] = 0.0
        pts[:, 2] += 1.0  # plane at z=1, viewpoint at origin below
        cloud = estimate_normals(make_cloud(pts), k=12)
        normals = np.asarray(cloud.normals)
        nz = np.abs(normals[:, 2])
        assert nz.min() > 0.999
        # oriented toward origin => n_z negative
        assert (normals[:, 2] < 0).all()

    def test_sphere_normals_radial(self):
        d = RNG.normal(size=(512, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = (d * 1.0).astype(np.float32) + np.array([0, 0, 3], np.float32)
        cloud = estimate_normals(make_cloud(pts), k=10)
        normals = np.asarray(cloud.normals)
        radial = pts - np.array([0, 0, 3], np.float32)
        align = np.abs(np.sum(normals * radial, axis=-1))
        assert np.quantile(align, 0.1) > 0.9


class TestOutliers:
    def test_far_outlier_removed(self):
        pts = RNG.uniform(0, 0.5, (200, 3)).astype(np.float32)
        pts[0] = [50.0, 50.0, 50.0]
        cloud = remove_statistical_outliers(make_cloud(pts), 20, 2.0)
        valid = np.asarray(cloud.valid)
        assert not valid[0]
        assert valid[1:].mean() > 0.9
