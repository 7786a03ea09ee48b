"""Expansion-GRR tests: workspace sampling, solver expansion, online solve.

The reference has no tests; these encode its *measured* semantics
(SURVEY.md §4 strategy): roadmap-quality metrics as regression values,
golden-formula checks for the arc construction, and behavior tests for the
solve() mode logic including its quirks.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from reconplan_tpu.core import maths
from reconplan_tpu.grr import (
    RedundancyResolution,
    arc_interpolate,
    evaluate_roadmap,
    get_arc_path,
    get_linear_path,
    linear_interpolate,
)
from reconplan_tpu.grr.paths import scan_arc
from reconplan_tpu.io.config import load_problem
from reconplan_tpu.kin import UR10


@pytest.fixture(scope="module")
def ur10():
    opts = load_problem("ur10", "rot_free")
    return UR10(
        opts["robot_name"], opts["domain"], opts["rotation_domain"],
        opts["fixed_rotation"],
    )


@pytest.fixture(scope="module")
def small_roadmap(ur10):
    """A small built roadmap shared by the expansion/solve tests."""
    opts = load_problem("ur10", "rot_free")
    res = RedundancyResolution(ur10)
    res.sample_workspace([0.75, 0.75, 0.0], 40, 1, "random")
    res.global_expansion(np.asarray(opts["init_configs"], dtype=np.float32))
    res.build_resolution_graph_and_nn()
    return res


class TestPaths:
    def test_scan_arc_matches_reference_formula(self):
        """Replicate main.py:68-136 arc geometry in numpy and compare."""
        from scipy.spatial.transform import Rotation as R

        obj = [0.75, 0.75, 0.0]
        n = 10
        arc = scan_arc(obj, radius=0.3, height=0.15, num_points=n)
        t = np.linspace(0, np.pi, n)
        x = obj[0] - 0.15 * np.cos(np.pi / 4) + 0.3 * np.cos(t) * np.cos(3 * np.pi / 4)
        y = obj[1] - 0.15 * np.cos(np.pi / 4) + 0.3 * np.cos(t) * np.sin(3 * np.pi / 4)
        z = 0.15 + obj[2] + 0.3 * np.sin(t)
        np.testing.assert_allclose(arc[:, 0], x, atol=1e-6)
        np.testing.assert_allclose(arc[:, 1], y, atol=1e-6)
        np.testing.assert_allclose(arc[:, 2], z, atol=1e-6)
        # orientation: look-at construction of main.py:107-127
        for i in [0, n // 2, n - 1]:
            v = np.asarray(obj) - arc[i, :3]
            z_axis = v / np.linalg.norm(v)
            arbit = np.array([1, 0, 0]) if not np.allclose(z_axis, [1, 0, 0]) else np.array([0, 1, 0])
            x_axis = np.cross(arbit, z_axis)
            x_axis /= np.linalg.norm(x_axis)
            y_axis = np.cross(z_axis, x_axis)
            rm = np.column_stack((x_axis, y_axis, z_axis)).T
            e = R.from_matrix(rm).as_euler("ZYX")
            expected = R.from_euler("ZYX", [0, e[1], e[2]]).as_quat()
            assert abs(np.dot(arc[i, 3:7], expected)) > 1 - 1e-5

    def test_linear_interpolate(self):
        start = np.array([0, 0, 0, 0, 0, 0, 1], dtype=np.float64)
        goal = np.array([1, 2, 3, 0, 0, np.sin(0.5), np.cos(0.5)], dtype=np.float64)
        mid = linear_interpolate(start, goal, 0.5)
        np.testing.assert_allclose(mid[:3], [0.5, 1.0, 1.5], atol=1e-6)
        # slerp halfway: rotation angle about z is half
        ang = 2 * np.arctan2(mid[5], mid[6])
        assert ang == pytest.approx(0.5, abs=1e-5)

    def test_arc_interpolate_rotates_about_axis(self):
        # point at (1,0,0), axis through origin along z, rotate pi/2
        start = np.array([1.0, 0, 0])
        axis = np.array([0, 0, 0, 0, 0, np.pi / 2])
        out = arc_interpolate(start, axis, 1.0)
        np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)
        # u=0.5 -> 45 degrees
        out = arc_interpolate(start, axis, 0.5)
        np.testing.assert_allclose(out, [np.sqrt(0.5), np.sqrt(0.5), 0], atol=1e-6)

    def test_path_generators_timestamps(self):
        path = get_linear_path(np.zeros(3), np.ones(3), 4.0, 5)
        assert len(path) == 5
        assert path[0][0] == 0.0 and path[-1][0] == 4.0
        arc = get_arc_path(np.array([1.0, 0, 0]), np.array([0, 0, 0, 0, 0, np.pi]), 2.0, 5)
        assert arc[-1][0] == 2.0
        np.testing.assert_allclose(arc[-1][1], [-1, 0, 0], atol=1e-6)


class TestWorkspace:
    def test_arc_workspace_connectivity(self, ur10):
        res = RedundancyResolution(ur10)
        res.sample_workspace([0.75, 0.75, 0.0], 30, 1, "random")
        ws = res.workspace
        assert ws.num_nodes == 30
        assert ws.points.shape == (30, 7)
        # k = n_rot*3-1 = 2 neighbors per node -> chain-ish graph
        deg = np.zeros(30)
        for i, j in ws.edges:
            deg[i] += 1
            deg[j] += 1
        assert deg.min() >= 2
        # edges connect arc-adjacent nodes (chain): every node i has i+-1
        adj_pairs = {tuple(e) for e in ws.edges}
        for i in range(29):
            assert (i, i + 1) in adj_pairs

    @pytest.mark.slow
    def test_neighbor_query_exact(self, ur10):
        res = RedundancyResolution(ur10)
        res.sample_workspace([0.75, 0.75, 0.0], 25, 1, "random")
        ws = res.workspace
        # query with an exact node point: nearest must be itself
        idx = ws.get_workspace_neighbors(ws.points[7], k=3)
        assert idx[0] == 7

    def test_grid_workspace(self):
        # grid mode needs a 1-axis rotation domain (rot_variable_yaw);
        # rot_free's [[0,0],[0,0],[0,0]] domain crashes the reference's
        # get_so3_grid too (utils.py:284)
        opts = load_problem("ur10", "rot_variable_yaw")
        robot = UR10(opts["robot_name"], opts["domain"],
                     opts["rotation_domain"], opts["fixed_rotation"])
        res = RedundancyResolution(robot)
        res.sample_workspace(None, 27, 4, "grid")
        ws = res.workspace
        assert ws.points.shape[1] == 7
        assert len(ws.edges) > 0
        # product structure: N = n_pos_actual * n_rot
        assert ws.num_nodes % 4 == 0

    @pytest.mark.slow
    def test_workspace_npz_roundtrip(self, ur10, tmp_path):
        res = RedundancyResolution(ur10)
        res.sample_workspace([0.75, 0.75, 0.0], 20, 1, "random")
        p = str(tmp_path / "ws.npz")
        res.workspace.save(p)
        from reconplan_tpu.grr.workspace import RoadmapWorkspace

        ws2 = RoadmapWorkspace(ur10).load(p)
        np.testing.assert_array_equal(ws2.points, res.workspace.points)
        np.testing.assert_array_equal(ws2.edges, res.workspace.edges)


@pytest.mark.slow
class TestExpansion:
    def test_expansion_configures_roadmap(self, small_roadmap):
        res = small_roadmap
        m = evaluate_roadmap(res, verbose=False)
        assert m["n_configured"] >= 0.8 * m["n_nodes"], m
        assert m["disconnection_ratio"] < 25.0, m

    def test_coherent_expansion_matches_or_beats_batched(self, ur10):
        """coherent=True (direct-neighbor-first + graph-colored waves)
        must configure a comparable share of the roadmap with no worse
        field coherence than the plain batched wave (round 5; the
        rot_fixed artifact-parity lever)."""
        opts = load_problem("ur10", "rot_free")
        res = RedundancyResolution(ur10)
        res.sample_workspace([0.75, 0.75, 0.0], 40, 1, "random")
        res.global_expansion(
            np.asarray(opts["init_configs"], dtype=np.float32),
            coherent=True, verbose=False,
        )
        res.build_resolution_graph_and_nn()
        m = evaluate_roadmap(res, verbose=False)
        assert m["n_configured"] >= 0.8 * m["n_nodes"], m
        assert m["disconnection_ratio"] < 25.0, m

    def test_resolution_configs_satisfy_fk(self, small_roadmap):
        """Every resolution node's config must FK onto its workspace point."""
        res = small_roadmap
        robot = res.robot
        if len(res.points) == 0:
            pytest.skip("no configured nodes")
        ee = np.asarray(robot.fk_point_batch(res.configs))
        pos_err = np.linalg.norm(ee[:, :3] - res.points[:, :3], axis=-1)
        assert np.quantile(pos_err, 0.9) < 5e-3, pos_err.max()

    def test_continuity_check_basics(self, small_roadmap):
        res = small_roadmap
        solver = res.solver
        robot = res.robot
        q = res.configs[0]
        p = res.points[0]
        # a config is trivially continuous with itself
        assert solver.is_continuous(q, q, p, p)

    def test_resolution_npz_roundtrip(self, small_roadmap, tmp_path):
        res = small_roadmap
        p = str(tmp_path / "res.npz")
        res.save_resolution_graph(p)
        res2 = RedundancyResolution(res.robot)
        res2.load_resolution_graph(p)
        np.testing.assert_array_equal(res2.configs, res.configs)
        np.testing.assert_array_equal(res2.edges, res.edges)

    def test_solver_npz_roundtrip_preserves_connectivity(
        self, small_roadmap, tmp_path
    ):
        """True edge connectivity must survive a save/load round trip —
        the legacy eval path fabricated it from has_config pairs."""
        res = small_roadmap
        ws_p = str(tmp_path / "ws.npz")
        sv_p = str(tmp_path / "solver.npz")
        res.save_workspace_graph(ws_p)
        res.save_solver_graph(sv_p)
        res2 = RedundancyResolution(res.robot)
        res2.load_workspace_graph(ws_p)
        res2.load_solver_graph(sv_p)
        np.testing.assert_array_equal(
            res2.solver.edge_connected, res.solver.edge_connected
        )
        np.testing.assert_array_equal(
            res2.solver.has_config, res.solver.has_config
        )
        np.testing.assert_array_equal(res2.solver.configs, res.solver.configs)

    def test_resume_completes_interrupted_expansion(self, ur10, tmp_path):
        """Kill a build mid-expansion (simulated by checkpointing after
        the first sweep and reloading), resume to completion."""
        opts = load_problem("ur10", "rot_free")
        seeds = np.asarray(opts["init_configs"], dtype=np.float32)
        res = RedundancyResolution(ur10)
        res.sample_workspace([0.75, 0.75, 0.0], 30, 1, "random")
        ws_p = str(tmp_path / "ws.npz")
        sv_p = str(tmp_path / "solver.npz")
        res.save_workspace_graph(ws_p)

        class _Abort(Exception):
            pass

        def checkpoint_then_abort(s):
            res.save_solver_graph(sv_p)
            raise _Abort

        with pytest.raises(_Abort):
            res.solver.global_expansion(seeds, on_sweep=checkpoint_then_abort)
        partial = int(res.solver.has_config.sum())
        assert partial > 0

        res2 = RedundancyResolution(ur10)
        res2.load_workspace_graph(ws_p)
        res2.load_solver_graph(sv_p)
        assert int(res2.solver.has_config.sum()) == partial
        res2.solver.global_expansion(seeds)
        assert int(res2.solver.has_config.sum()) >= partial
        # resumed build must reach the same completion as an uninterrupted
        # one (both stabilise the same frontier)
        res3 = RedundancyResolution(ur10)
        res3.load_workspace_graph(ws_p)
        res3.solver.global_expansion(seeds)
        assert int(res2.solver.has_config.sum()) == int(
            res3.solver.has_config.sum()
        )


@pytest.mark.slow
class TestSolve:
    def test_tracking_mode_uses_joint_closest_seed(self, small_roadmap):
        """With curr_config given, solve() must seed from the joint-space
        closest neighbor (resolution.py:299-330) and track continuously."""
        res = small_roadmap
        arc = scan_arc([0.75, 0.75, 0.0], num_points=8)
        curr = None
        solved = []
        for p in arc:
            q = res.solve(list(p), curr_config=curr, none_on_fail=True)
            if q is not None:
                if curr is not None:
                    # tracking: consecutive configs stay close modulo 2pi
                    # (wrist joints have +-2pi limits, so IK may land on the
                    # 2pi-equivalent branch — physically the same pose)
                    diff = np.abs(
                        (np.asarray(q) - np.asarray(curr) + np.pi) % (2 * np.pi)
                        - np.pi
                    )
                    assert diff.max() < 1.5, diff
                curr = q
                solved.append(q)
        assert len(solved) >= 5

    def test_solved_configs_reach_targets(self, small_roadmap):
        res = small_roadmap
        arc = scan_arc([0.75, 0.75, 0.0], num_points=6)
        for p in arc[:3]:
            q = res.solve(list(p), none_on_fail=True)
            if q is None:
                continue
            ee = np.asarray(res.robot.fk_point_batch(q[None]))[0]
            assert np.linalg.norm(ee[:3] - p[:3]) < 5e-3

    def test_regular_ik_shortcircuit(self, small_roadmap):
        res = small_roadmap
        arc = scan_arc([0.75, 0.75, 0.0], num_points=4)
        seed = res.configs[0]
        q = res.solve(list(arc[0]), curr_config=seed, regular_ik=True,
                      none_on_fail=True)
        # regular IK from a roadmap config near the arc should succeed
        if q is not None:
            ee = np.asarray(res.robot.fk_point_batch(q[None]))[0]
            assert np.linalg.norm(ee[:3] - arc[0, :3]) < 5e-3

    def test_nearest_node_only(self, small_roadmap):
        res = small_roadmap
        p = res.points[3]
        q = res.solve(list(p), nearest_node_only=True)
        np.testing.assert_allclose(q, res.configs[3], atol=1e-6)

    def test_track_array_codes(self, small_roadmap):
        """TrackArray diagnostics: cold start on an exact node -> 0 or 2;
        tracking -> the min joint distance (resolution.py:281,317,322)."""
        res = small_roadmap
        ta = []
        res.solve(list(res.points[2]), none_on_fail=True, TrackArray=ta)
        assert ta[0] in (0, 2)
        ta2 = []
        res.solve(
            list(res.points[2]), curr_config=res.configs[2],
            none_on_fail=True, TrackArray=ta2,
        )
        assert ta2[0] == pytest.approx(0.0, abs=1e-5)

    def test_plan_on_roadmap(self, small_roadmap):
        res = small_roadmap
        if len(res.points) < 5:
            pytest.skip("roadmap too small")
        c_path, w_path = res.plan(res.points[0], res.points[4], interpolation=2)
        assert len(c_path) >= 2
        # path endpoints reach the goal
        ee = np.asarray(res.robot.fk_point_batch(np.asarray(c_path[-1])[None]))[0]
        assert np.linalg.norm(ee[:3] - res.points[4][:3]) < 1e-2


@pytest.mark.slow
class TestQuality:
    def test_metrics_formulas(self, small_roadmap):
        m = evaluate_roadmap(small_roadmap, verbose=False)
        assert 0 <= m["disconnection_ratio"] <= 100
        assert m["distance_ratio"] > 0

    def test_census_counts_consistent(self, small_roadmap):
        from reconplan_tpu.grr import census_reachability

        c = census_reachability(small_roadmap, restarts=2, verbose=False)
        n_cfg = int(small_roadmap.solver.has_config.sum())
        # every configured node is by definition reachable, and the
        # witness at a configured node is its existing config
        assert c["n_reachable"] >= n_cfg
        assert c["n_configured"] == n_cfg
        assert bool(np.all(c["reachable"][small_roadmap.solver.has_config]))
        i = np.flatnonzero(small_roadmap.solver.has_config)[0]
        np.testing.assert_allclose(
            c["witness"][i], small_roadmap.solver.configs[i]
        )
        assert 0 < c["coverage_of_reachable"] <= 100.0


class TestNearestNeighbors:
    """C9 parity: the GNAT-interface dense engine."""

    def test_dense_topk_interface(self):
        from reconplan_tpu.grr.nearest_neighbors import DenseTopK

        rng = np.random.default_rng(0)
        q = rng.normal(size=(50, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pts = np.concatenate([rng.normal(size=(50, 3)), q], -1).astype(np.float32)
        nn = DenseTopK()
        nn.add_list(pts)
        assert nn.size() == 50
        # nearest of an existing point is itself
        assert nn.nearest(pts[7]) == 7
        ids, dists = nn.nearest_k(pts[3], 5)
        assert ids[0] == 3 and dists[0] < 1e-5
        # removal masks the point out
        nn.remove(7)
        assert nn.nearest(pts[7]) != 7
        assert nn.size() == 49
        # radius query is sorted and within r
        ids, dists = nn.nearest_r(pts[0], 1.0)
        assert all(d <= 1.0 for d in dists)
        assert dists == sorted(dists)

    def test_greedy_kcenters_spread(self):
        from reconplan_tpu.grr.nearest_neighbors import GreedyKCenters

        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        centers, dists = GreedyKCenters().kcenters(pts, 8)
        assert len(set(centers)) == 8
        # centers mutually distant: min pairwise > random-pair median / 2
        off = dists[np.triu_indices(8, 1)]
        assert off.min() > 0.4


@pytest.mark.slow
class TestKinova:
    def test_kinova_fk_ik(self):
        from reconplan_tpu.kin import Kinova

        opts = load_problem("kinova", "rot_free")
        robot = Kinova(
            opts["robot_name"], opts["domain"], opts["rotation_domain"],
            opts["fixed_rotation"],
        )
        assert robot.num_joints == 7
        seeds = np.asarray(opts["init_configs"], dtype=np.float32)
        pts = np.asarray(robot.fk_point_batch(seeds))
        assert np.isfinite(pts).all()
        # IK re-solves an FK pose
        q, ok = robot.solve_ik_batch(pts[:2], seeds[:2])
        achieved = np.asarray(robot.fk_point_batch(np.asarray(q)))
        err = np.linalg.norm(achieved[:, :3] - pts[:2, :3], axis=-1)
        ok = np.asarray(ok)
        assert ok.any()
        assert err[ok].max() < 2e-3


@pytest.mark.slow
class TestTeleopAndBatch:
    def test_teleop_towards_clamps_step(self, small_roadmap):
        res = small_roadmap
        q0 = np.zeros(6)
        q1 = np.ones(6)
        out = res.teleop_towards(q0, q1, max_change=0.03)
        assert np.abs(np.asarray(out) - q0).max() <= 0.03 + 1e-6
        # within reach: jumps to target
        out2 = res.teleop_towards(q0, q0 + 0.01, max_change=0.03)
        np.testing.assert_allclose(out2, q0 + 0.01, atol=1e-6)

    def test_teleop_solve_steps_toward_target(self, small_roadmap):
        res = small_roadmap
        if len(res.points) < 3:
            pytest.skip("roadmap too small")
        q_curr = res.configs[0]
        target = res.points[1]
        res.plan_path = None
        res.path_index = 0
        q_new = res.teleop_solve(list(target), np.asarray(q_curr), max_change=0.05)
        if q_new is not None:
            diff = np.abs(np.asarray(q_new) - np.asarray(q_curr))
            # cyclic wrap for the base joint
            diff[0] = min(diff[0], 2 * np.pi - diff[0])
            assert diff.max() <= 0.05 + 1e-5

    def test_reference_benchmark_engine(self, small_roadmap):
        """The device-resident teleop benchmark engine runs all arms on
        short trajectories and yields reference-shaped summaries
        (trajectory_quality.py:147-285 semantics, ticks fused)."""
        from reconplan_tpu.grr.teleop_batch import run_reference_benchmark

        res = small_roadmap
        robot = res.robot
        # two short straight-line task trajectories between roadmap points
        trajs = []
        for a, b in ((0, 1), (1, 2)):
            pa, pb = res.points[a][:3], res.points[b][:3]
            u = np.linspace(0, 1, 12)[:, None]
            trajs.append((pa[None] * (1 - u) + pb[None] * u).astype(
                np.float64
            ))
        results, stats = run_reference_benchmark(
            res, {"line": trajs}, include_relaxed=True,
            converge_steps=10, verbose=False,
        )
        row = results["line"]
        assert set(row) >= {"grr", "newton", "relaxed"}
        for arm, summary in row.items():
            assert summary["n"] == 2, (arm, summary)
            assert 0.0 <= summary["success_rate"] <= 1.0
        # the GRR config paths obey the per-tick max_change clamp
        assert stats["line"]["grr"]["ticks"] > 0

    def test_grr_engine_tick_clamp(self, small_roadmap):
        """Every consecutive pair in the GRR arm's config history obeys
        the 0.04 max joint change (cyclic-aware) — the device-resident
        auto-step and host fallback surgery must both respect it."""
        from reconplan_tpu.grr.teleop_batch import (
            cold_starts,
            grr_teleop_batch,
        )

        res = small_roadmap
        pa, pb = res.points[0][:3], res.points[2][:3]
        u = np.linspace(0, 1, 15)[:, None]
        trajs = np.stack([pa[None] * (1 - u) + pb[None] * u]).astype(
            np.float64
        )
        q0s, alive = cold_starts(res, trajs)
        if not alive.any():
            pytest.skip("no resolution solution for the fixture roadmap")
        c_trajs, _stats = grr_teleop_batch(
            res, trajs, q0s, alive, max_change=0.04, converge_steps=5,
        )
        c = c_trajs[0]
        assert len(c) == 15 + 5 + 1
        diff = np.abs(np.diff(c, axis=0))
        cyc = np.asarray(res.robot._cyclic_mask)
        diff = np.where(cyc, np.minimum(diff, 2 * np.pi - diff), diff)
        assert diff.max() <= 0.04 + 1e-4, diff.max()

    def test_solve_batch_matches_targets(self, small_roadmap):
        res = small_roadmap
        arc = scan_arc([0.75, 0.75, 0.0], num_points=12)
        qs, ok = res.solve_batch(arc)
        assert qs.shape == (12, 6)
        ok = np.asarray(ok)
        if ok.any():
            ee = np.asarray(res.robot.fk_point_batch(qs[ok]))
            err = np.linalg.norm(ee[:, :3] - arc[ok][:, :3], axis=-1)
            assert err.max() < 5e-3


class TestScanArcAzimuth:
    def test_azimuth_rotates_arc_plane(self):
        obj = [0.75, 0.75, 0.0]
        base = scan_arc(obj, num_points=16)
        rot = scan_arc(obj, num_points=16, azimuth=3 * np.pi / 4 + np.pi / 2)
        # same center offset and heights, different sweep plane
        np.testing.assert_allclose(base[:, 2], rot[:, 2], atol=1e-6)
        # 135 deg -> 225 deg: cos(az) coincides, sin(az) flips
        assert not np.allclose(base[:, 1], rot[:, 1])
        # every pose still looks at the object
        for p in rot[::5]:
            v = np.asarray(obj) - p[:3]
            d = np.linalg.norm(v)
            assert 0.05 < d < 0.6

    def test_default_azimuth_matches_reference_formula(self):
        """azimuth default must keep main.py:68-136 parity exactly."""
        obj = [0.75, 0.75, 0.0]
        arc = scan_arc(obj, radius=0.3, height=0.15, num_points=8)
        t = np.linspace(0, np.pi, 8)
        x = obj[0] - 0.15 * np.cos(np.pi / 4) + 0.3 * np.cos(t) * np.cos(3 * np.pi / 4)
        np.testing.assert_allclose(arc[:, 0], x, atol=1e-6)


@pytest.mark.slow
class TestGrrPlanFallback:
    def test_ik_fallback_rescues_unreachable_waypoints(self, small_roadmap):
        from reconplan_tpu.apps.scan import grr_plan

        res = small_roadmap
        # waypoints far from the roadmap's arc: roadmap solve fails, the
        # seeded-IK fallback must still produce configurations
        pts = np.asarray(
            [[0.45, 0.45, 0.35, 0.0, 0.0, 0.0, 1.0],
             [0.5, 0.4, 0.3, 0.0, 0.0, 0.0, 1.0]] * 4,
            dtype=np.float32,
        )
        with_fb = grr_plan(res, pts, ik_fallback=True)
        without_fb = grr_plan(res, pts, ik_fallback=False)
        n_with = sum(1 for q in with_fb if q is not None)
        n_without = sum(1 for q in without_fb if q is not None)
        assert n_with >= n_without
        assert n_with > 0
        # rescued configs must actually reach the waypoint positions
        robot = res.robot
        for q, p in zip(with_fb, pts):
            if q is None:
                continue
            ee = np.asarray(robot.fk_point_batch(np.asarray(q)[None]))[0][:3]
            assert np.linalg.norm(ee - p[:3]) < 5e-3
