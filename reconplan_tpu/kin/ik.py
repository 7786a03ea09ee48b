"""Batched damped-least-squares inverse kinematics.

Replaces Klampt's Newton-Raphson ``ik.solver`` (``grr/robot.py:245-312``) and
PyBullet's ``calculateInverseKinematics`` (``bullet_api/robot.py:389-430``).
Where the reference paid one Python->C++ FFI round trip per solve, this
kernel solves B problems per dispatch: ``vmap`` over the batch, a
``lax.while_loop`` with convergence early-exit inside, 6x6 normal equations
solved in closed form on device.

Semantics kept from the reference:
  * ``max_iters``/``tolerance`` knobs with the same defaults (100, 1e-3).
  * joint limits clamped every step; cyclic joints are unbounded and the
    caller wraps them to [-pi, pi) afterwards (``grr/robot.py:308-309``).
  * pose targets are position + full rotation; a rotation weight of 0
    reproduces the position-only ("free") objective.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from reconplan_tpu.core import maths
from reconplan_tpu.kin.chain import KinematicModel, fk_all, geometric_jacobian


class IKResult(NamedTuple):
    config: jnp.ndarray  # (..., A) solution in active-joint coordinates
    success: jnp.ndarray  # (...,) bool
    pos_err: jnp.ndarray  # (...,) final position error norm
    rot_err: jnp.ndarray  # (...,) final rotation error (rotvec norm, rad)
    iters: jnp.ndarray  # (...,) iterations used


def _rotation_error(R_target, R_current):
    """Rotation error as a world-frame rotation vector (R_t @ R_c^T)."""
    R_err = jnp.matmul(
        R_target, R_current.T, precision=jax.lax.Precision.HIGHEST
    )
    return maths.quat_to_rotvec(maths.matrix_to_quat(R_err))


@partial(
    jax.jit,
    static_argnames=("active", "ee_link", "max_iters", "use_rotation"),
)
def dls_ik(
    model: KinematicModel,
    active: tuple,
    ee_link: int,
    target_pos: jnp.ndarray,
    target_rot: jnp.ndarray,
    init_config: jnp.ndarray,
    q_rest: jnp.ndarray,
    max_iters: int = 100,
    tolerance: float = 1e-3,
    use_rotation: bool = True,
    damping: float = 0.1,
):
    """Solve one IK problem with Levenberg-Marquardt damped least squares.

    Klampt's ``ik.solver`` (the reference's IK engine,
    ``grr/robot.py:245-312``) is a Newton-Raphson with a robust line
    search; a fixed-damping DLS without step control converges far less
    often from distant seeds (measured 13% vs Klampt-class ~80% single
    shot on a ur10 rot_fixed workspace grid). This uses the standard LM
    accept/reject scheme for equivalent robustness in a fixed-shape
    ``lax.while_loop``: try a step at the current damping; accept and
    soften the damping if the error norm drops, otherwise keep the old
    iterate and stiffen. Rejected steps cost one FK (no Jacobian reuse is
    attempted — FK is cheap relative to the 6x6 solve).

    Args:
        model: kinematic chain.
        active: static tuple of active joint indices.
        ee_link: end-effector link index.
        target_pos: (3,) target position.
        target_rot: (3, 3) target rotation matrix (ignored when
            ``use_rotation=False``).
        init_config: (A,) initial active-joint configuration.
        q_rest: (L,) full joint vector holding inactive joints' values.
        max_iters / tolerance: Klampt-compatible stop criteria — success
            when the stacked error norm falls below ``tolerance``.
        use_rotation: include the rotation rows of the Jacobian.
        damping: initial Levenberg damping (adapted per step in
            [1e-4, 1e3]).

    Returns: IKResult of scalars/vectors.
    """
    active_idx = jnp.array(active)
    qmin = model.qmin[active_idx]
    qmax = model.qmax[active_idx]

    def error_of(q_active):
        q = q_rest.at[active_idx].set(q_active)
        R, t = fk_all(model, q)
        e_pos = target_pos - t[ee_link]
        if use_rotation:
            e_rot = _rotation_error(target_rot, R[ee_link])
            return jnp.concatenate([e_pos, e_rot])
        return e_pos

    def jac_of(q_active):
        q = q_rest.at[active_idx].set(q_active)
        J = geometric_jacobian(model, q, ee_link, active)
        return J if use_rotation else J[:3]

    err_dim = 6 if use_rotation else 3

    def cond(state):
        q, lam, err_norm, it = state
        return jnp.logical_and(it < max_iters, err_norm >= tolerance)

    def body(state):
        q, lam, err_norm, it = state
        e = error_of(q)
        J = jac_of(q)
        # LM step: dq = J^T (J J^T + lambda^2 I)^{-1} e
        JJt = jnp.matmul(J, J.T, precision=jax.lax.Precision.HIGHEST)
        A = JJt + (lam**2) * jnp.eye(err_dim, dtype=q.dtype)
        y = jnp.linalg.solve(A, e)
        dq = jnp.matmul(J.T, y, precision=jax.lax.Precision.HIGHEST)
        q_try = jnp.clip(q + dq, qmin, qmax)
        e_try = jnp.linalg.norm(error_of(q_try))
        accept = e_try < err_norm
        q_new = jnp.where(accept, q_try, q)
        lam_new = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-4), jnp.minimum(lam * 4.0, 1e3)
        )
        return q_new, lam_new, jnp.where(accept, e_try, err_norm), it + 1

    e0 = error_of(init_config)
    state0 = (
        init_config,
        jnp.asarray(damping, dtype=init_config.dtype),
        jnp.linalg.norm(e0),
        jnp.array(0, dtype=jnp.int32),
    )
    q_final, _lam, err_norm, iters = jax.lax.while_loop(cond, body, state0)

    e_final = error_of(q_final)
    pos_err = jnp.linalg.norm(e_final[:3])
    rot_err = (
        jnp.linalg.norm(e_final[3:6]) if use_rotation else jnp.zeros_like(pos_err)
    )
    success = err_norm < tolerance
    return IKResult(q_final, success, pos_err, rot_err, iters)


@partial(
    jax.jit,
    static_argnames=("active", "ee_link", "max_iters", "use_rotation"),
)
def dls_ik_batch(
    model: KinematicModel,
    active: tuple,
    ee_link: int,
    target_pos: jnp.ndarray,  # (B, 3)
    target_rot: jnp.ndarray,  # (B, 3, 3)
    init_config: jnp.ndarray,  # (B, A)
    q_rest: jnp.ndarray,  # (L,)
    max_iters: int = 100,
    tolerance: float = 1e-3,
    use_rotation: bool = True,
    damping: float = 0.1,
) -> IKResult:
    """vmapped :func:`dls_ik` — the workhorse of roadmap construction.

    The reference's hottest loops (``solver.py:98-149`` BFS expansion and
    ``solver.py:321-363`` bisection continuity checks) each issue one C++ IK
    call per node/midpoint; here the whole frontier solves in one dispatch.
    """
    solver = lambda p, r, q0: dls_ik(
        model,
        active,
        ee_link,
        p,
        r,
        q0,
        q_rest,
        max_iters=max_iters,
        tolerance=tolerance,
        use_rotation=use_rotation,
        damping=damping,
    )
    return jax.vmap(solver)(target_pos, target_rot, init_config)
