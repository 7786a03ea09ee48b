"""ICP registration tests: recover known rigid transforms."""

import numpy as np
import pytest

import jax.numpy as jnp

from reconplan_tpu.core import maths
from reconplan_tpu.ops import (
    colored_icp,
    icp_point_to_plane,
    icp_point_to_point,
    register_kabsch,
)
from reconplan_tpu.ops.icp import color_gradients
from reconplan_tpu.ops.pointcloud import make_cloud
from reconplan_tpu.ops.pointcloud import estimate_normals

RNG = np.random.default_rng(42)


def random_transform(angle_scale=0.1, trans_scale=0.05):
    rv = RNG.normal(size=3) * angle_scale
    t = RNG.normal(size=3) * trans_scale
    R = np.asarray(maths.quat_to_matrix(maths.rotvec_to_quat(jnp.asarray(rv))))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def surface_points(n=2000):
    """Random points on a bumpy sphere (registration-friendly geometry)."""
    d = RNG.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = 0.5 + 0.05 * np.sin(5 * d[:, 0]) + 0.04 * np.cos(7 * d[:, 1])
    return (d * r[:, None]).astype(np.float32)


def transform_error(T_got, T_true):
    delta = T_got @ np.linalg.inv(T_true)
    rot_err = np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
    trans_err = np.linalg.norm(delta[:3, 3])
    return rot_err, trans_err


class TestKabsch:
    def test_exact_recovery(self):
        pts = surface_points(100)
        T = random_transform(0.5, 0.3)
        moved = pts @ T[:3, :3].T + T[:3, 3]
        T_got = np.asarray(
            register_kabsch(jnp.asarray(pts), jnp.asarray(moved), jnp.ones(100))
        )
        rot_err, trans_err = transform_error(T_got, T)
        assert rot_err < 1e-5 and trans_err < 1e-5

    def test_weighted(self):
        pts = surface_points(100)
        T = random_transform(0.3, 0.2)
        moved = pts @ T[:3, :3].T + T[:3, 3]
        moved_corrupt = moved.copy()
        moved_corrupt[:10] += 5.0  # corrupted correspondences
        w = np.ones(100, np.float32)
        w[:10] = 0.0
        T_got = np.asarray(
            register_kabsch(jnp.asarray(pts), jnp.asarray(moved_corrupt), jnp.asarray(w))
        )
        rot_err, trans_err = transform_error(T_got, T)
        assert rot_err < 1e-5 and trans_err < 1e-5


class TestICP:
    def test_point_to_point_recovers_pose(self):
        pts = surface_points(1500)
        T = random_transform(0.08, 0.03)
        src = make_cloud(pts)
        dst = make_cloud((pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        res = icp_point_to_point(src, dst, max_correspondence_distance=0.1)
        rot_err, trans_err = transform_error(np.asarray(res.transformation), T)
        assert rot_err < 5e-3, rot_err
        assert trans_err < 2e-3, trans_err
        assert float(res.fitness) > 0.95

    def test_point_to_plane_recovers_pose(self):
        pts = surface_points(1500)
        T = random_transform(0.08, 0.03)
        src = make_cloud(pts)
        dst = estimate_normals(
            make_cloud((pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)), k=12
        )
        res = icp_point_to_plane(src, dst, max_correspondence_distance=0.1)
        rot_err, trans_err = transform_error(np.asarray(res.transformation), T)
        assert rot_err < 5e-3, rot_err
        assert trans_err < 2e-3, trans_err

    def test_icp_with_partial_overlap(self):
        pts = surface_points(2000)
        T = random_transform(0.05, 0.02)
        # source sees only one hemisphere, target the other 75%
        src_sel = pts[pts[:, 0] > -0.1]
        dst_sel = pts[pts[:, 0] < 0.3]
        src = make_cloud(src_sel)
        dst = make_cloud((dst_sel @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        res = icp_point_to_point(src, dst, max_correspondence_distance=0.1)
        rot_err, trans_err = transform_error(np.asarray(res.transformation), T)
        assert rot_err < 0.02
        assert trans_err < 0.01

    def test_identity_when_aligned(self):
        pts = surface_points(500)
        src = make_cloud(pts)
        res = icp_point_to_point(src, src, max_correspondence_distance=0.05)
        rot_err, trans_err = transform_error(np.asarray(res.transformation), np.eye(4))
        assert rot_err < 1e-4 and trans_err < 1e-4
        assert float(res.fitness) > 0.999


class TestColoredICP:
    def test_color_breaks_geometric_ambiguity(self):
        """A flat textured plane: geometry alone can't register in-plane
        shifts; color must lock it in (the reason stitcher.py:94-103 uses
        colored ICP first)."""
        n = 4000
        xy = RNG.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.ones((n, 1), np.float32)], -1)
        # smooth color texture
        col = 0.5 + 0.5 * np.sin(3 * xy[:, :1]) * np.cos(4 * xy[:, 1:2])
        colors = np.repeat(col, 3, axis=1).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.04  # pure in-plane shift
        src = make_cloud(pts, colors=colors)
        dst_pts = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        dst = estimate_normals(make_cloud(dst_pts, colors=colors), k=12)
        grads = color_gradients(dst)
        res = colored_icp(src, dst, grads, max_correspondence_distance=0.1)
        rot_err, trans_err = transform_error(np.asarray(res.transformation), T)
        assert trans_err < 0.01, trans_err

        # plain point-to-plane must NOT recover the in-plane shift
        res_geo = icp_point_to_plane(src, dst, max_correspondence_distance=0.1)
        _, trans_err_geo = transform_error(np.asarray(res_geo.transformation), T)
        assert trans_err_geo > trans_err
