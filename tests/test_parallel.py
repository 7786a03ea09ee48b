"""Parity tests for the multi-chip sharding layer (8-device CPU mesh).

Round-1 covered only the brick-sharded path in pytest; the z-sharded dense
grid and batch-sharded IK were exercised solely by the driver dryrun.
These tests pin all three: sharded results must equal their single-device
formulations bit-for-bit (dense/IK) or exactly (brick, separately in
test_tsdf_marching.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconplan_tpu.ops import tsdf as tsdf_ops
from reconplan_tpu.parallel.fusion import (
    gather_grid,
    make_sharded_grid,
    sharded_integrate_frames,
)
from reconplan_tpu.parallel.ik import sharded_ik_solve
from reconplan_tpu.parallel.mesh import make_mesh


def _sphere_frames(n_views=2, H=64, W=256, fx=80.0, fy=80.0, r=0.1):
    cx, cy = W / 2.0, H / 2.0
    depths, poses = [], []
    for k in range(n_views):
        ang = 2 * np.pi * k / max(n_views, 1)
        eye = np.array([0.45 * np.cos(ang), 0.45 * np.sin(ang), 0.1])
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T = np.eye(4)
        T[:3, :3] = np.stack([x, y, z], 1)
        T[:3, 3] = eye
        poses.append(T.astype(np.float32))
        u = (np.arange(W) - cx) / fx
        v = (np.arange(H) - cy) / fy
        uu, vv = np.meshgrid(u, v)
        dirs = np.stack([uu, vv, np.ones_like(uu)], -1) @ T[:3, :3].T
        a = np.sum(dirs * dirs, -1)
        b = 2 * np.sum(dirs * eye, -1)
        c = float(np.dot(eye, eye) - r * r)
        disc = b * b - 4 * a * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
        depths.append((np.where(t > 0, t, 0.0) * 1000.0).astype(np.float32))
    return np.stack(depths), np.stack(poses), (fx, fy, cx, cy)


class TestZShardedFusion:
    def test_z_sharded_matches_single_device(self):
        """GSPMD z-sharding must not change a single bit of the result."""
        depths, poses, (fx, fy, cx, cy) = _sphere_frames()
        dims = (64, 64, 64)
        vox = 0.5 / 63
        origin = (-0.25, -0.25, -0.25)

        single = tsdf_ops.make_grid(dims, origin, vox)
        single = tsdf_ops.integrate_frames(
            single, jnp.asarray(depths), jnp.asarray(poses), fx, fy, cx, cy
        )

        mesh = make_mesh(8)
        sharded = make_sharded_grid(dims, origin, vox, mesh=mesh)
        sharded = sharded_integrate_frames(
            sharded, depths, poses, fx, fy, cx, cy, mesh=mesh
        )
        gathered = gather_grid(sharded)
        np.testing.assert_array_equal(
            np.asarray(gathered.sdf), np.asarray(single.sdf)
        )
        np.testing.assert_array_equal(
            np.asarray(gathered.weight), np.asarray(single.weight)
        )
        assert (np.asarray(gathered.weight) > 0).sum() > 100

    def test_z_sharded_color_matches_single(self):
        depths, poses, (fx, fy, cx, cy) = _sphere_frames()
        F, H, W = depths.shape
        colors = np.zeros((F, H, W, 3), np.float32)
        colors[..., 0] = np.linspace(0, 1, W)[None, None, :]
        colors[..., 2] = 0.5
        dims = (32, 32, 32)
        vox = 0.5 / 31
        origin = (-0.25, -0.25, -0.25)

        single = tsdf_ops.make_grid(dims, origin, vox, with_color=True)
        single = tsdf_ops.integrate_frames(
            single, jnp.asarray(depths), jnp.asarray(poses), fx, fy, cx, cy,
            colors=jnp.asarray(colors),
        )
        mesh = make_mesh(8)
        sharded = make_sharded_grid(dims, origin, vox, mesh=mesh,
                                    with_color=True)
        sharded = sharded_integrate_frames(
            sharded, depths, poses, fx, fy, cx, cy, mesh=mesh, colors=colors
        )
        gathered = gather_grid(sharded)
        np.testing.assert_array_equal(
            np.asarray(gathered.color), np.asarray(single.color)
        )


class TestShardedIK:
    def test_sharded_ik_matches_unsharded(self):
        from reconplan_tpu.io.config import load_problem
        from reconplan_tpu.kin import UR10

        opts = load_problem("ur10", "rot_free")
        robot = UR10(
            opts["robot_name"], opts["domain"], opts["rotation_domain"],
            opts["fixed_rotation"],
        )
        from reconplan_tpu.kin.ik import dls_ik_batch

        rng = np.random.default_rng(3)
        robot._rng = rng
        B = 16  # divisible by the 8-device mesh
        seeds = np.asarray(robot.sample(B), dtype=np.float32)
        targets = np.asarray(robot.fk_point_batch(seeds))[:, :3]

        # unsharded reference: the same raw DLS solver sharded_ik_solve
        # dispatches (robot.solve_ik_batch adds joint-limit vetting on top)
        pos, rotm, use_rot = robot._ik_targets(targets)
        ref = dls_ik_batch(
            robot.model, robot._active_tuple, robot.ee_link, pos, rotm,
            jnp.asarray(seeds), robot._q_rest, max_iters=100,
            tolerance=1e-3, use_rotation=use_rot,
        )

        mesh = make_mesh(8)
        q_sh, ok_sh = sharded_ik_solve(robot, targets, seeds, mesh=mesh)
        np.testing.assert_array_equal(
            np.asarray(ok_sh), np.asarray(ref.success)
        )
        np.testing.assert_array_equal(
            np.asarray(q_sh), np.asarray(ref.config)
        )
        assert np.asarray(ok_sh).mean() > 0.8

    def test_sharded_ik_rejects_bad_batch(self):
        from reconplan_tpu.io.config import load_problem
        from reconplan_tpu.kin import UR10

        opts = load_problem("ur10", "rot_free")
        robot = UR10(
            opts["robot_name"], opts["domain"], opts["rotation_domain"],
            opts["fixed_rotation"],
        )
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="not divisible"):
            sharded_ik_solve(
                robot, np.zeros((7, 3), np.float32),
                np.zeros((7, robot.num_joints), np.float32), mesh=mesh,
            )
