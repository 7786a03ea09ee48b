"""Relaxed-IK style multi-objective teleop solver (C26 parity).

The reference benchmarked against a Rust ``relaxed_ik`` cdylib via ctypes
(``experiment/relaxed_ik_core/relaxed_ik.py``; the binary is a missing blob
there, so that baseline cannot even run from the reference checkout). This
is a JAX reimplementation of the idea behind RelaxedIK (Rakita et al., RSS
2018): per-tick pose tracking as a WEIGHTED SOFT OBJECTIVE rather than a
hard constraint, trading end-effector accuracy for joint-motion smoothness
and limit avoidance.

Objective terms (Groove-loss-free simplified weighting):
  * position error       ||p(q) - p*||^2
  * rotation error       ||rotvec(R* R(q)^T)||^2
  * joint velocity       ||q - q_prev||^2     (smoothness)
  * joint-limit margin   softplus barrier near qmin/qmax

Optimized with damped Gauss-Newton steps (geometric Jacobian; the
velocity/smoothness weight enters as Levenberg damping, which is exactly
the "relaxed" tradeoff) plus a softplus joint-limit barrier handled by a
gradient term — one jit dispatch per tick, vmappable over batches.
API mirrors the reference wrapper: ``solve(pos, quat)`` -> next q,
``reset(q)`` (``relaxed_ik.py:59-134``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from reconplan_tpu.core import maths
from reconplan_tpu.kin.chain import fk_all


@partial(
    jax.jit,
    static_argnames=("active", "ee_link", "n_steps"),
)
def _relaxed_step(
    model, active, ee_link, q_prev, target_pos, target_quat, q_rest,
    weights, lr=0.02, n_steps=10,
):
    active_idx = jnp.array(active)
    qmin = model.qmin[active_idx]
    qmax = model.qmax[active_idx]
    R_target = maths.quat_to_matrix(target_quat)
    w_pos, w_rot, w_vel, w_lim = weights

    def objective(q):
        full = q_rest.at[active_idx].set(q)
        R, t = fk_all(model, full)
        e_pos = jnp.sum((t[ee_link] - target_pos) ** 2)
        R_err = jnp.matmul(
            R_target, R[ee_link].T, precision=jax.lax.Precision.HIGHEST
        )
        e_rot = jnp.sum(maths.quat_to_rotvec(maths.matrix_to_quat(R_err)) ** 2)
        e_vel = jnp.sum((q - q_prev) ** 2)
        margin = 0.1
        e_lim = jnp.sum(
            jax.nn.softplus((qmin + margin - q) / margin)
            + jax.nn.softplus((q - qmax + margin) / margin)
        )
        return w_pos * e_pos + w_rot * e_rot + w_vel * e_vel + w_lim * e_lim

    from reconplan_tpu.kin.chain import geometric_jacobian

    def limit_grad(q):
        margin = 0.1
        return w_lim * (
            -jax.nn.sigmoid((qmin + margin - q) / margin) / margin
            + jax.nn.sigmoid((q - qmax + margin) / margin) / margin
        )

    # damping from the smoothness/pose weight ratio: large w_vel relaxes
    # tracking into smoother, smaller steps (the RelaxedIK tradeoff)
    lam2 = (w_vel + 1e-3) / (w_pos + 1e-3)

    def body(i, q):
        full = q_rest.at[active_idx].set(q)
        R, t = fk_all(model, full)
        e_pos = target_pos - t[ee_link]
        R_err = jnp.matmul(
            R_target, R[ee_link].T, precision=jax.lax.Precision.HIGHEST
        )
        e_rot = maths.quat_to_rotvec(maths.matrix_to_quat(R_err)) * jnp.sqrt(
            w_rot / w_pos
        )
        e = jnp.concatenate([e_pos, e_rot])
        J = geometric_jacobian(model, full, ee_link, active)
        JJt = jnp.matmul(J, J.T, precision=jax.lax.Precision.HIGHEST)
        A = JJt + lam2 * jnp.eye(6, dtype=q.dtype)
        dq = jnp.matmul(
            J.T, jnp.linalg.solve(A, e), precision=jax.lax.Precision.HIGHEST
        )
        dq = dq - 0.01 * limit_grad(q)
        dq = jnp.clip(dq, -0.1, 0.1)  # per-tick trust region
        return jnp.clip(q + dq, qmin, qmax)

    q = jax.lax.fori_loop(0, n_steps, body, q_prev)
    return q


class RelaxedIK:
    """Stateful per-tick solver mirroring the reference's ctypes wrapper
    surface (``RelaxedIKRust.solve / solve_precise / reset``)."""

    def __init__(self, robot, w_pos=50.0, w_rot=10.0, w_vel=5.0, w_lim=1.0):
        self.robot = robot
        self.weights = jnp.asarray([w_pos, w_rot, w_vel, w_lim], dtype=jnp.float32)
        self.q = jnp.zeros(robot.num_joints, dtype=jnp.float32)

    def reset(self, q):
        self.q = jnp.asarray(q, dtype=jnp.float32)

    def solve(self, positions, orientations):
        """One soft-objective tick toward (pos (3,), quat xyzw (4,))."""
        robot = self.robot
        self.q = _relaxed_step(
            robot.model,
            robot._active_tuple,
            robot.ee_link,
            self.q,
            jnp.asarray(positions, dtype=jnp.float32),
            maths.quat_normalize(jnp.asarray(orientations, dtype=jnp.float32)),
            robot._q_rest,
            self.weights,
        )
        return np.asarray(self.q)

    def solve_precise(self, positions, orientations, n_rounds=10):
        """Iterate ticks until the pose converges (reference's
        solve_precise analog)."""
        out = None
        for _ in range(n_rounds):
            out = self.solve(positions, orientations)
        return out


def relaxed_teleop_solver(robot, trajectory, q0, max_change=0.04,
                          converge_steps=100):
    """Trajectory-tracking driver matching the experiment harness
    (``trajectory_quality.py:110-144``): RelaxedIK ticks with the same
    per-step clamp as the other solvers."""
    from reconplan_tpu.grr.experiment import _step_toward

    solver = RelaxedIK(robot)
    solver.reset(np.asarray(q0, dtype=np.float32))
    q = np.asarray(q0, dtype=np.float64)
    c_traj = [q]
    for point in trajectory:
        pos, quat = point[:3], point[3:7] if len(point) > 3 else [0, 0, 0, 1]
        target = solver.solve(pos, quat)
        q = _step_toward(robot, q, target, max_change)
        solver.reset(q)
        c_traj.append(q)
    for _ in range(converge_steps):
        pos = trajectory[-1][:3]
        quat = trajectory[-1][3:7] if len(trajectory[-1]) > 3 else [0, 0, 0, 1]
        target = solver.solve(pos, quat)
        q_new = _step_toward(robot, q, target, max_change)
        if np.allclose(q_new, q, atol=1e-6):
            break
        q = q_new
        solver.reset(q)
        c_traj.append(q)
    return np.asarray(c_traj)
