"""Data-parallel IK over a device mesh.

Roadmap expansion waves and arc solves are batches of independent DLS-IK
problems; sharding the batch axis over the mesh is plain data parallelism
(the kinematic model is tiny and replicates). One annotation line — XLA
partitions the vmapped solver with no code changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reconplan_tpu.kin.ik import dls_ik_batch
from reconplan_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def sharded_ik_solve(robot, points, seeds, mesh=None, max_iters=100,
                     tolerance=1e-3):
    """Solve a batch of IK problems sharded over the mesh.

    ``points`` (B, 3|7) and ``seeds`` (B, A) shard along B (B must divide
    by the mesh size). Returns (configs (B, A), converged (B,)).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    B = points.shape[0]
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")
    sb = shard_batch(mesh)
    pos, rotm, use_rot = robot._ik_targets(points)
    pos = jax.device_put(pos, sb)
    rotm = jax.device_put(rotm, sb)
    seeds = jax.device_put(jnp.asarray(seeds, dtype=jnp.float32), sb)
    res = dls_ik_batch(
        robot.model,
        robot._active_tuple,
        robot.ee_link,
        pos,
        rotm,
        seeds,
        robot._q_rest,
        max_iters=max_iters,
        tolerance=tolerance,
        use_rotation=use_rot,
    )
    return res.config, res.success
