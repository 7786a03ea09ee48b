"""Parity tests for reconplan_tpu.core.maths against scipy golden values.

Mirrors the reference test strategy gap: the reference has no tests
(SURVEY.md §4); scipy is the ground truth the reference itself delegated to
(``grr/utils.py`` imports scipy.spatial.transform.Rotation).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp

import jax.numpy as jnp

from reconplan_tpu.core import maths

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def assert_quat_close(q1, q2, atol=1e-5):
    """Quaternions equal up to sign."""
    q1, q2 = np.asarray(q1), np.asarray(q2)
    d = np.abs(np.sum(q1 * q2, axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=atol)


class TestQuaternionBasics:
    def test_mul_matches_matrix_product(self):
        q1, q2 = random_quats(2)
        m = np.asarray(maths.quat_to_matrix(maths.quat_mul(q1, q2)))
        expected = R.from_quat(q1).as_matrix() @ R.from_quat(q2).as_matrix()
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_rotate_matches_scipy_apply(self):
        q = random_quats(8)
        v = RNG.normal(size=(8, 3))
        out = np.asarray(maths.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        expected = np.stack([R.from_quat(qi).apply(vi) for qi, vi in zip(q, v)])
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_quat_to_matrix(self):
        q = random_quats(16)
        out = np.asarray(maths.quat_to_matrix(jnp.asarray(q)))
        expected = R.from_quat(q).as_matrix()
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_matrix_to_quat_roundtrip(self):
        q = random_quats(64)
        m = R.from_quat(q).as_matrix()
        out = np.asarray(maths.matrix_to_quat(jnp.asarray(m)))
        assert_quat_close(out, q)

    def test_matrix_to_quat_degenerate_cases(self):
        # 180-degree rotations hit every Shepperd pivot branch
        for axis in np.eye(3):
            m = R.from_rotvec(np.pi * axis).as_matrix()
            out = np.asarray(maths.matrix_to_quat(jnp.asarray(m)))
            assert_quat_close(out, R.from_matrix(m).as_quat())
        out = np.asarray(maths.matrix_to_quat(jnp.eye(3)))
        assert_quat_close(out, [0, 0, 0, 1])


class TestEuler:
    @pytest.mark.parametrize("seq", ["zyx", "ZYX", "xyz", "XYZ"])
    def test_euler_to_quat(self, seq):
        eulers = RNG.uniform(-np.pi, np.pi, size=(32, 3))
        out = np.asarray(maths.euler_to_quat(jnp.asarray(eulers), seq=seq))
        expected = R.from_euler(seq, eulers).as_quat()
        assert_quat_close(out, expected)

    @pytest.mark.parametrize("seq", ["zyx", "ZYX", "xyz", "XYZ"])
    def test_quat_to_euler_roundtrip(self, seq):
        q = random_quats(32)
        eulers = np.asarray(maths.quat_to_euler(jnp.asarray(q), seq=seq))
        expected = R.from_quat(q).as_euler(seq)
        np.testing.assert_allclose(eulers, expected, atol=1e-4)

    def test_euler_to_matrix(self):
        eulers = RNG.uniform(-np.pi, np.pi, size=(8, 3))
        out = np.asarray(maths.euler_to_matrix(jnp.asarray(eulers), seq="zyx"))
        np.testing.assert_allclose(
            out, R.from_euler("zyx", eulers).as_matrix(), atol=1e-5
        )


class TestRotvec:
    def test_rotvec_to_quat(self):
        rv = RNG.normal(size=(32, 3))
        out = np.asarray(maths.rotvec_to_quat(jnp.asarray(rv)))
        assert_quat_close(out, R.from_rotvec(rv).as_quat())

    def test_rotvec_to_quat_small_angle(self):
        rv = np.array([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
        out = np.asarray(maths.rotvec_to_quat(jnp.asarray(rv)))
        assert_quat_close(out, R.from_rotvec(rv).as_quat())

    def test_quat_to_rotvec_roundtrip(self):
        q = random_quats(32)
        out = np.asarray(maths.quat_to_rotvec(jnp.asarray(q)))
        expected = R.from_quat(q).as_rotvec()
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestMetricsAndInterp:
    def test_quaternion_angle(self):
        q = random_quats(10)
        for i in range(5):
            q1, q2 = q[2 * i], q[2 * i + 1]
            got = float(maths.quaternion_angle(jnp.asarray(q1), jnp.asarray(q2)))
            dist = min(abs(np.dot(q1, q2)), 1.0)
            expected = 2 * np.arccos(dist)
            assert abs(got - expected) < 1e-5

    def test_se3_distance_position_only(self):
        p1 = np.array([0.0, 0.0, 0.0])
        p2 = np.array([1.0, 2.0, 2.0])
        assert float(maths.se3_distance(p1, p2)) == pytest.approx(3.0)

    def test_se3_distance_full(self):
        q1, q2 = random_quats(2)
        p1 = np.concatenate([[0.1, 0.2, 0.3], q1])
        p2 = np.concatenate([[0.4, 0.2, 0.3], q2])
        got = float(maths.se3_distance(jnp.asarray(p1), jnp.asarray(p2)))
        expected = 1.0 * 0.3 + 0.3 * (1 - abs(np.dot(q1, q2)))
        assert got == pytest.approx(expected, abs=1e-6)

    def test_slerp_matches_scipy(self):
        q = random_quats(2)
        rot = R.from_quat(q)
        sl = Slerp([0, 1], rot)
        for u in [0.0, 0.25, 0.5, 0.99, 1.0]:
            got = np.asarray(maths.slerp(jnp.asarray(q[0]), jnp.asarray(q[1]), u))
            assert_quat_close(got, sl([u]).as_quat()[0], atol=1e-4)

    def test_wrap_to_pi(self):
        angles = np.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.3])
        got = np.asarray(maths.wrap_to_pi(jnp.asarray(angles)))
        expected = (angles + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_interpolate_angle_shortest_path(self):
        # crossing the -pi/pi boundary
        a1, a2 = 3.0, -3.0
        mid = float(maths.interpolate_angle(a1, a2, 0.5))
        assert abs(abs(mid) - np.pi) < 0.15  # midway across the seam

    def test_circular_mean(self):
        angles = np.array([3.1, -3.1])
        w = np.array([0.5, 0.5])
        m = float(maths.circular_mean(jnp.asarray(angles), jnp.asarray(w)))
        assert abs(abs(m) - np.pi) < 1e-5  # mean wraps at the seam, not 0


class TestTransforms:
    def test_pose_matrix_roundtrip(self):
        q = random_quats(4)
        p = RNG.normal(size=(4, 3))
        T = np.asarray(maths.pose_to_matrix(jnp.asarray(p), jnp.asarray(q)))
        p2, q2 = maths.matrix_to_pose(jnp.asarray(T))
        np.testing.assert_allclose(np.asarray(p2), p, atol=1e-6)
        assert_quat_close(np.asarray(q2), q)

    def test_transform_points(self):
        q = random_quats(1)[0]
        p = np.array([1.0, 2.0, 3.0])
        pts = RNG.normal(size=(10, 3))
        T = np.asarray(maths.pose_to_matrix(jnp.asarray(p), jnp.asarray(q)))
        got = np.asarray(maths.transform_points(jnp.asarray(T), jnp.asarray(pts)))
        expected = pts @ R.from_quat(q).as_matrix().T + p
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_look_at_quat_matches_reference_construction(self):
        # replicate main.py:107-127 construction in numpy
        eye = np.array([0.3, 0.4, 0.5])
        target = np.array([0.75, 0.75, 0.0])
        v = target - eye
        z_axis = v / np.linalg.norm(v)
        arbit = np.array([1, 0, 0]) if not np.allclose(z_axis, [1, 0, 0]) else np.array([0, 1, 0])
        x_axis = np.cross(arbit, z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        rotation_matrix = np.column_stack((x_axis, y_axis, z_axis)).T
        euler_calc = R.from_matrix(rotation_matrix).as_euler("ZYX")
        expected = R.from_euler("ZYX", [0, euler_calc[1], euler_calc[2]]).as_quat()
        got = np.asarray(maths.look_at_quat(jnp.asarray(eye), jnp.asarray(target)))
        assert_quat_close(got, expected, atol=1e-5)


class TestSampling:
    def test_sample_quat_uniform_unit(self):
        import jax

        q = np.asarray(maths.sample_quat(jax.random.PRNGKey(0), (256,)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        # rough uniformity: mean should be near zero
        assert np.abs(q.mean(axis=0)).max() < 0.15


class TestGrids:
    def test_staggered_grid_matches_reference_semantics(self):
        from reconplan_tpu.core import grids

        domain = [[-1.0, 1.0], [-1.0, 1.0], [-0.5, 1.0]]
        points, edges = grids.get_staggered_grid(200, domain)
        assert points.shape[1] == 3
        # in-domain
        for d in range(3):
            assert points[:, d].min() >= domain[d][0] - 1e-9
            assert points[:, d].max() <= domain[d][1] + 1e-9
        # edges index valid nodes
        assert edges.min() >= 0 and edges.max() < len(points)
        assert len(edges) > len(points)  # connected grid

    def test_staggered_grid_constant_dim(self):
        from reconplan_tpu.core import grids

        domain = [[-1.0, 1.0], [0.5, 0.5], [0.0, 1.0]]
        points, _ = grids.get_staggered_grid(100, domain)
        np.testing.assert_allclose(points[:, 1], 0.5)

    def test_super_fibonacci_unit_and_spread(self):
        from reconplan_tpu.core import grids

        q = grids.super_fibonacci_so3(512)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
        # low discrepancy: no two identical, rough coverage of both hemispheres
        assert len(np.unique(q.round(6), axis=0)) == 512

    def test_so3_grid_single_axis(self):
        from reconplan_tpu.core import grids

        quats, edges = grids.get_so3_grid(
            8, [0, 0, 1], [-np.pi, 0.0, 0.0], num_neighbors=2
        )
        assert quats.shape == (8, 4)
        assert len(edges) > 0
        # all quats should share fixed x/y rotation structure: check they are
        # valid unit quats
        np.testing.assert_allclose(np.linalg.norm(quats, axis=-1), 1.0, atol=1e-6)

    def test_so3_grid_yaw_axis_matches_reference_artifacts(self):
        """rot_domain [0,0,1] must vary the rotation about +z (the euler
        vector is (x, y, z) per ``grr/utils.py:270-273`` and the shipped
        planar_5 rot_variable artifact), NOT about x as the reference's
        own ``seq="zyx"`` default would read it."""
        from reconplan_tpu.core import grids, maths

        quats, _ = grids.get_so3_grid(8, [0, 0, 1], [0.0, 0.0, 0.0], 2)
        # rotations about z: x/y quat components stay zero
        np.testing.assert_allclose(quats[:, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(quats[:, 1], 0.0, atol=1e-7)
        assert np.abs(quats[:, 2]).max() > 0.9  # z component sweeps the circle

    def test_problem_euler_seq_tool_down(self):
        """The ur10/kinova rot_fixed ``fixed_rotation`` [-pi, 0, pi/2]
        must realize tool-z-DOWN (R = Rz(pi/2) @ Rx(-pi)) — the
        orientation every reference roadmap artifact achieves."""
        from reconplan_tpu.core import maths

        q = maths.euler_to_quat(
            jnp.asarray([-np.pi, 0.0, np.pi / 2]), seq=maths.PROBLEM_EULER_SEQ
        )
        R = np.asarray(maths.quat_to_matrix(q))
        np.testing.assert_allclose(
            R, [[0, 1, 0], [1, 0, 0], [0, 0, -1]], atol=1e-6
        )
