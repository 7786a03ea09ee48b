"""Kinematics tests: .rob parsing, FK vs golden files, batched DLS-IK.

The FK golden test is the strongest parity check in the suite: the
reference's own ``main.py:153-165`` produced ``wtraj.txt`` by running Klampt
FK over ``ctraj.txt``; our chain must reproduce it.
"""

import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconplan_tpu.core import maths
from reconplan_tpu.kin import (
    UR10,
    Planar,
    dls_ik_batch,
    fk_all,
    parse_rob,
)
from reconplan_tpu.kin.chain import model_from_rob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")


def _parse_nums(s):
    return [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", s)]


def load_golden():
    ctraj = np.array(
        [_parse_nums(l.split(",", 1)[1]) for l in open(os.path.join(DATA, "golden/ctraj.txt"))]
    )
    wtraj = np.array(
        [_parse_nums(l.split(",", 1)[1]) for l in open(os.path.join(DATA, "golden/wtraj.txt"))]
    )
    return ctraj, wtraj


@pytest.fixture(scope="module")
def ur10():
    return UR10(
        "ur10", [[-1, 1], [-1, 1], [-0.5, 1]], [0, 0, 1], [-np.pi, 0, 0]
    )


class TestRobParser:
    def test_ur10_structure(self):
        rob = parse_rob(os.path.join(DATA, "robots/ur10.rob"))
        assert rob.num_links == 18
        assert rob.link_names[0] == "base_link"
        assert rob.link_index("ee_link") == 13
        assert rob.parents[0] == -1
        assert rob.joint_types[14] == "p"  # gripper prismatic
        assert np.isinf(rob.qmin[1]) and np.isinf(rob.qmax[1])  # cyclic base

    def test_planar_defaults_serial_chain(self):
        rob = parse_rob(os.path.join(DATA, "robots/planar_5.rob"))
        assert rob.num_links == 6
        np.testing.assert_array_equal(rob.parents, np.arange(-1, 5))


class TestFK:
    def test_golden_ctraj_wtraj_parity(self, ur10):
        """FK over the committed 500-waypoint trajectory must match the
        reference's Klampt output (wtraj.txt) at float32 precision."""
        ctraj, wtraj = load_golden()
        pos, rot = ur10.solve_fk_batch(ctraj.astype(np.float32))
        pos = np.asarray(pos)[:, -1]  # ee = index -1 of fk_links
        quat = np.asarray(rot)[:, -1]
        pos_err = np.linalg.norm(pos - wtraj[:, :3], axis=-1)
        assert pos_err.max() < 5e-5, pos_err.max()
        # Reference quirk: Klampt getTransform() returns R as a COLUMN-major
        # 9-list, but grr/utils.py:101-105 matrix_to_quat reshapes it
        # row-major — so wtraj.txt stores quats of R^T (the conjugate).
        # Our FK returns the true rotation; compare against the conjugate.
        quat_conj = quat * np.array([-1.0, -1.0, -1.0, 1.0])
        dots = np.abs(np.sum(quat_conj * wtraj[:, 3:7], axis=-1))
        assert dots.min() > 1 - 1e-5

    def test_planar_fk_analytic(self):
        """Planar 5R: FK must equal the textbook sum-of-angles formula."""
        robot = Planar("planar_5", [[-0.5, 0.5], [-0.5, 0.5], [0, 0]], [0, 0, 1])
        q = np.array([0.3, -0.2, 0.5, 0.1, -0.4], dtype=np.float32)
        pos, _ = robot.solve_fk(q, index=-1)
        # chain of 5 links, each 0.1 long (first at origin), revolute about z
        x = y = 0.0
        th = 0.0
        # link i origin at cumulative; ee link = link 5 (0-indexed) at 0.1 after link4
        angles = np.concatenate([q, [0.0]])
        th = 0.0
        pts = [(0.0, 0.0)]
        for i in range(5):
            th += angles[i]
            x, y = pts[-1]
            pts.append((x + 0.1 * np.cos(th), y + 0.1 * np.sin(th)))
        # ee link (link index 5) origin sits at pts[5]
        np.testing.assert_allclose(pos[:2], pts[5], atol=1e-5)
        assert abs(pos[2]) < 1e-6

    def test_fk_index_semantics(self, ur10):
        """index=-1 returns ee; index list mirrors grr/robot.py:236-239."""
        q = np.zeros(6, dtype=np.float32)
        pos_all, rot_all = ur10.solve_fk(q)
        assert pos_all.shape == (7, 3)  # 6 active + ee
        pos_ee, _ = ur10.solve_fk(q, index=-1)
        np.testing.assert_allclose(pos_ee, pos_all[-1])


class TestJacobianIK:
    def test_jacobian_matches_autodiff(self, ur10):
        from reconplan_tpu.kin.chain import geometric_jacobian

        q6 = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, 6), dtype=jnp.float32)

        def fk_pos(qa):
            q = jnp.zeros(18).at[jnp.asarray(ur10.active_joints)].set(qa)
            _, t = fk_all(ur10.model, q)
            return t[ur10.ee_link]

        J_auto = jax.jacfwd(fk_pos)(q6)
        J_geo = geometric_jacobian(
            ur10.model,
            jnp.zeros(18).at[jnp.asarray(ur10.active_joints)].set(q6),
            ur10.ee_link,
            tuple(ur10.active_joints),
        )
        np.testing.assert_allclose(np.asarray(J_geo[:3]), np.asarray(J_auto), atol=1e-4)

    @pytest.mark.slow
    def test_batched_ik_converges_on_reachable_poses(self, ur10):
        """IK re-solves FK-generated poses: guaranteed-feasible targets."""
        rng = np.random.default_rng(7)
        B = 64
        seeds = rng.uniform(-1.5, 1.5, (B, 6)).astype(np.float32)
        # only keep targets whose generating config is itself valid
        # (floor-free + collision-free) — invalid ones are rightly rejected
        valid_seed = np.asarray(ur10._validate_batch(jnp.asarray(seeds)))
        seeds = seeds[valid_seed]
        assert len(seeds) >= 8
        points = np.asarray(ur10.fk_point_batch(seeds))
        # perturb the seed so IK has work to do
        init = seeds + rng.normal(0, 0.1, seeds.shape).astype(np.float32)
        q, ok = ur10.solve_ik_batch(points, init)
        # check achieved pose error for successful solves
        achieved = np.asarray(ur10.fk_point_batch(np.asarray(q)))
        pos_err = np.linalg.norm(achieved[:, :3] - points[:, :3], axis=-1)
        ok = np.asarray(ok)
        assert ok.mean() > 0.7, ok.mean()
        assert pos_err[ok].max() < 2e-3

    def test_ik_single_none_on_fail(self, ur10):
        # unreachable: 3 m away
        q = ur10.solve_ik(np.array([3.0, 0, 0.5, 0, 0, 0, 1], dtype=np.float32))
        assert q is None

    @pytest.mark.slow
    def test_ik_position_only_mode(self):
        robot = UR10(
            "ur10", [[-1, 1], [-1, 1], [-0.5, 1]], [0, 0, 1], [-np.pi, 0, 0],
            rotation="free_position",  # not variable/fixed -> position-only
        )
        seeds = robot.sample(16)
        seeds = seeds[np.asarray(robot._validate_batch(jnp.asarray(seeds)))]
        assert len(seeds) >= 2
        pts = np.asarray(robot.fk_point_batch(seeds))[:, :3]
        q, ok = robot.solve_ik_batch(pts, seeds)
        achieved = np.asarray(robot.fk_point_batch(np.asarray(q)))[:, :3]
        ok = np.asarray(ok)
        assert ok.any()
        assert np.linalg.norm(achieved[ok] - pts[ok], axis=-1).max() < 2e-3


class TestConfigOps:
    def test_distance_cyclic_wrap(self, ur10):
        q1 = np.zeros(6)
        q2 = np.zeros(6)
        q2[0] = 2 * np.pi - 0.1  # cyclic base joint
        assert ur10.distance(q1, q2) == pytest.approx(0.1, abs=1e-5)

    def test_interpolate_cyclic(self, ur10):
        q1 = np.array([3.0, 0, 0, 0, 0, 0])
        q2 = np.array([-3.0, 0, 0, 0, 0, 0])
        mid = ur10.interpolate(q1, q2, 0.5)
        assert abs(abs(mid[0]) - np.pi) < 0.15

    def test_average_circular(self, ur10):
        configs = np.array(
            [[3.1, 0.5, 0, 0, 0, 0], [-3.1, 0.7, 0, 0, 0, 0]], dtype=np.float32
        )
        avg = ur10.average(configs)
        assert abs(abs(avg[0]) - np.pi) < 1e-4  # circular mean across seam
        assert avg[1] == pytest.approx(0.6, abs=1e-5)  # linear mean

    def test_average_weighted_matches_reference_formula(self, ur10):
        rng = np.random.default_rng(0)
        configs = rng.uniform(-1, 1, (5, 6))
        w = rng.uniform(0.1, 1, 5)
        avg = ur10.average(configs, w)
        expected_lin = np.average(configs, axis=0, weights=w)
        x = np.sum(w / w.sum() * np.cos(configs[:, 0]))
        y = np.sum(w / w.sum() * np.sin(configs[:, 0]))
        expected0 = np.arctan2(y, x)
        np.testing.assert_allclose(avg[1:], expected_lin[1:], atol=1e-5)
        assert avg[0] == pytest.approx(expected0, abs=1e-5)


class TestValidity:
    def test_floor_rejection(self, ur10):
        # a pose pointing the arm below the floor plane
        q_down = np.array([0.0, 1.2, 1.8, 0.0, 0.0, 0.0], dtype=np.float32)
        pos, _ = ur10.solve_fk(q_down)
        if (pos[:, 2] <= 0).any():
            ok = np.asarray(ur10._validate_batch(jnp.asarray(q_down)[None]))[0]
            assert not ok

    def test_self_collision_spheres_loaded(self, ur10):
        assert ur10._spheres is not None
        assert ur10._spheres["self"][0].shape[0] == 6
        assert ur10._spheres["ee"][0].shape[0] == 6
        # covering property: every fitted sphere cloud has >= 1 live sphere
        assert (np.asarray(ur10._spheres["self"][2]) > 0).any(axis=1).all()

    def test_sphere_cloud_covers_mesh(self, ur10):
        # every mesh vertex of the forearm link must lie inside (or on)
        # some sphere of its cloud — the no-false-negative guarantee
        import os
        from reconplan_tpu.kin.collision import fit_spheres_off
        from reconplan_tpu.kin.rob_parser import load_off_vertices

        li = int(ur10._spheres["self"][0][2])
        path = os.path.join(ur10.rob.source_dir, ur10.rob.geometry[li])
        v = load_off_vertices(path)
        c, r = fit_spheres_off(v)
        d = np.linalg.norm(v[:, None, :] - c[None, :, :], axis=-1)
        assert (d.min(axis=1) <= r[np.argmin(d, axis=1)] + 1e-5).all()

    def test_zero_config_collision_free(self, ur10):
        assert ur10.check_self_collision(np.zeros(6)) in (False,)


class TestSegmentDistance:
    def test_parallel_and_crossing_segments(self):
        from reconplan_tpu.kin.collision import segment_segment_distance as ssd

        d = float(ssd(jnp.array([0.0, 0, 0]), jnp.array([1.0, 0, 0]),
                      jnp.array([0.0, 1, 0]), jnp.array([1.0, 1, 0])))
        assert d == pytest.approx(1.0, abs=1e-6)
        d = float(ssd(jnp.array([0.0, 0, 0]), jnp.array([1.0, 0, 0]),
                      jnp.array([0.5, -1, 1]), jnp.array([0.5, 1, 1])))
        assert d == pytest.approx(1.0, abs=1e-6)
        # degenerate: point vs segment
        d = float(ssd(jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 0]),
                      jnp.array([1.0, -1, 0]), jnp.array([1.0, 1, 0])))
        assert d == pytest.approx(1.0, abs=1e-6)


class TestRelaxedIK:
    @pytest.mark.slow
    def test_converges_with_smooth_motion(self, ur10):
        from reconplan_tpu.kin.relaxed import RelaxedIK

        q0 = np.array([0.0, -1.0, 1.7, -2.27, -1.57, 1.57], dtype=np.float32)
        pt = np.asarray(ur10.fk_point_batch(q0[None]))[0]
        solver = RelaxedIK(ur10)
        solver.reset(q0 + 0.1)
        q = solver.solve_precise(pt[:3], pt[3:7], n_rounds=10)
        ee = np.asarray(ur10.fk_point_batch(np.asarray(q, np.float32)[None]))[0]
        assert np.linalg.norm(ee[:3] - pt[:3]) < 2e-3
        assert abs(np.dot(ee[3:7], pt[3:7])) > 0.999
        # motion bounded (soft objective resists wild jumps)
        assert np.abs(np.asarray(q) - (q0 + 0.1)).max() < 0.5

    def test_velocity_weight_relaxes_tracking(self, ur10):
        """Higher smoothness weight (damping) -> smaller single-step motion."""
        from reconplan_tpu.kin.relaxed import _relaxed_step
        from reconplan_tpu.core import maths as M

        q0 = jnp.asarray([0.0, -1.0, 1.7, -2.27, -1.57, 1.57], dtype=jnp.float32)
        target = np.asarray(ur10.fk_point_batch((np.asarray(q0) + 0.05)[None]))[0]
        moves = []
        for w_vel in (0.5, 500.0):
            w = jnp.asarray([50.0, 10.0, w_vel, 1.0], dtype=jnp.float32)
            q = _relaxed_step(
                ur10.model, ur10._active_tuple, ur10.ee_link, q0,
                jnp.asarray(target[:3]), jnp.asarray(target[3:7]),
                ur10._q_rest, w, n_steps=1,
            )
            moves.append(float(jnp.abs(q - q0).max()))
        assert moves[1] < moves[0]


class TestServoDynamics:
    """Physics-based execution twin (reference ``main.py:218-234``:
    PyBullet POSITION_CONTROL motors stepped at 240 Hz). The servo model
    makes executed-vs-planned tracking error a measurable quantity."""

    def _golden_timed(self):
        times, qs = [], []
        for line in open(os.path.join(DATA, "golden/ctraj.txt")):
            t, rest = line.split(",", 1)
            times.append(float(t))
            qs.append(_parse_nums(rest))
        return np.asarray(times, np.float32), np.asarray(qs, np.float32)

    def test_converges_and_respects_velocity_limits(self, ur10):
        from reconplan_tpu.kin.dynamics import ServoExecutor

        ex = ServoExecutor(ur10)
        q0 = np.zeros(6, np.float32)
        qt = np.asarray([0.4, -0.3, 0.5, 0.2, -0.2, 0.3], np.float32)
        res = ex.execute(np.asarray([3.0]), qt[None], q0=q0)
        # generous time -> converged
        assert np.abs(res["q_ticks"][-1] - qt).max() < 1e-3
        # velocity limit respected at every tick
        assert np.all(np.abs(res["qd_ticks"]) <= ex.vmax + 1e-4)

    def test_golden_ctraj_execution_lags_but_tracks(self, ur10):
        from reconplan_tpu.kin.dynamics import ServoExecutor

        times, qs = self._golden_timed()
        res = ServoExecutor(ur10).execute(times, qs)
        # the servo LAGS the command (real dynamics, not teleport) ...
        assert res["joint_err_max"] > 1e-4
        # ... but tracks the 50 Hz golden trajectory closely
        assert res["joint_err_mean"] < 0.05, res
        assert res["ee_err_mean_mm"] < 25.0, res

    def test_simrtde_dynamics_mode(self, ur10):
        from reconplan_tpu.io.drivers import SimRTDE

        sim = SimRTDE(ur10, dynamics=True)
        target = [0.3, -0.2, 0.4, 0.1, -0.1, 0.2]
        sim.move_joint(target)
        assert np.abs(np.asarray(sim.get_joint_values()) - target).max() < 5e-3
        path = [[*np.linspace(0, 0.3, 5)[i].repeat(6), 1.05, 1.4, 0.02]
                for i in range(5)]
        sim.move_joint_trajectory(path)
        assert sim.last_execution["joint_err_max"] >= 0.0
