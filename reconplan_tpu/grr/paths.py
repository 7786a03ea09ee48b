"""Geometric Cartesian path generators (``grr/workspace_path.py`` parity).

Arc and linear paths with SLERP rotation; used by demos and the trajectory
generator. Vectorized: each returns all waypoints in one shot.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from reconplan_tpu.core import maths


def arc_interpolate(start, axis, u):
    """Rotate ``start`` (pos [+quat]) about an axis line by u * angle
    (``workspace_path.py:64-82``). ``axis`` = [px, py, pz, rx, ry, rz]
    (point on axis + rotation vector)."""
    start = np.asarray(start, dtype=np.float64)
    axis = np.asarray(axis, dtype=np.float64)
    rot_quat = np.asarray(maths.rotvec_to_quat(jnp.asarray(axis[3:] * u)))
    R = np.asarray(maths.quat_to_matrix(jnp.asarray(rot_quat)))
    point = R @ (start[:3] - axis[:3]) + axis[:3]
    if len(start) > 3:
        Rs = np.asarray(maths.quat_to_matrix(jnp.asarray(start[3:7])))
        quat = np.asarray(maths.matrix_to_quat(jnp.asarray(R @ Rs)))
        return np.concatenate([point, quat])
    return point


def linear_interpolate(start, goal, u):
    """Lerp position + slerp rotation (``workspace_path.py:85-97``)."""
    start = np.asarray(start, dtype=np.float64)
    goal = np.asarray(goal, dtype=np.float64)
    point = start[:3] + u * (goal[:3] - start[:3])
    if len(start) > 3:
        quat = np.asarray(
            maths.slerp(jnp.asarray(start[3:7]), jnp.asarray(goal[3:7]), u)
        )
        return np.concatenate([point, quat])
    return point


def get_arc_path(start, axis, path_duration, num_points):
    """Timestamped arc path (``workspace_path.py:9-34``)."""
    assert path_duration > 0, "Path duration must be greater than 0."
    assert num_points > 2, "Number of points must be greater than 2."
    return [
        (path_duration * (i / (num_points - 1)),
         arc_interpolate(start, axis, i / (num_points - 1)))
        for i in range(num_points)
    ]


def get_linear_path(start, goal, path_duration, num_points):
    """Timestamped linear path (``workspace_path.py:37-61``)."""
    assert path_duration > 0, "Path duration must be greater than 0."
    assert num_points > 2, "Number of points must be greater than 2."
    return [
        (path_duration * (i / (num_points - 1)),
         linear_interpolate(start, goal, i / (num_points - 1)))
        for i in range(num_points)
    ]


def scan_arc(obj_pos, radius=0.3, height=0.15, num_points=500,
             azimuth=3 * np.pi / 4, max_horiz=None):
    """The flagship scan arc of ``main.py:68-136``: a tilted half-circle of
    look-at poses over the object. Returns (num_points, 7) poses.

    ``azimuth`` orients the vertical plane the arc sweeps through
    (reference value 3*pi/4). A single arc only observes the object's top
    and two ends; sweeping additional rotated arcs (see
    ``apps/scan.py --arcs``) covers the flanks the reference's one-arc
    demo never sees.

    ``max_horiz``, when set, clamps each eye's horizontal distance from
    the robot base (origin) by sliding it radially inward — coverage
    planning that respects the arm's reach envelope: the far side of an
    arc around an off-center object otherwise sweeps outside the UR10's
    ~1.1 m comfortable look-at reach and no solver can configure it.
    """
    obj = np.asarray(obj_pos, dtype=np.float64)
    t = np.linspace(0, np.pi, num_points)
    x = obj[0] - 0.15 * np.cos(np.pi / 4) + radius * np.cos(t) * np.cos(azimuth)
    y = obj[1] - 0.15 * np.cos(np.pi / 4) + radius * np.cos(t) * np.sin(azimuth)
    z = height + obj[2] + radius * np.sin(t)
    if max_horiz is not None:
        h = np.hypot(x, y)
        s = np.minimum(1.0, max_horiz / np.maximum(h, 1e-9))
        x, y = x * s, y * s
    eyes = np.stack([x, y, z], axis=-1).astype(np.float32)
    quats = np.asarray(
        maths.look_at_quat(
            jnp.asarray(eyes), jnp.asarray(obj, dtype=jnp.float32)
        )
    )
    return np.concatenate([eyes, quats], axis=-1)
