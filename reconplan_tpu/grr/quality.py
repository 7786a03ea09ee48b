"""Roadmap quality metrics (``experiment/roadmap_quality.py`` parity).

The de-facto test suite of the reference (SURVEY.md §4): disconnection
ratio and rad/m distance ratio over the solver graph, printed after every
build (``redundancy.py:148``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from reconplan_tpu.core import maths


def evaluate_roadmap(resolution, verbose=True):
    """Evaluate solver-graph quality (``roadmap_quality.py:12-54``).

    Returns dict(disconnection_ratio [%], distance_ratio [rad/m],
    n_nodes, n_edges, n_configured).
    """
    solver = resolution.solver
    ws = solver.workspace
    robot = resolution.robot

    both = solver.has_config[ws.edges[:, 0]] & solver.has_config[ws.edges[:, 1]]
    num_edges = int(both.sum())
    num_disconnected = int((both & ~solver.edge_connected).sum())
    disconnection_ratio = (
        100.0 * num_disconnected / num_edges if num_edges else float("nan")
    )

    if num_edges:
        sel = np.flatnonzero(both)
        i, j = ws.edges[sel, 0], ws.edges[sel, 1]
        c_dist = np.asarray(
            robot.distance_batch(
                jnp.asarray(solver.configs[i]), jnp.asarray(solver.configs[j])
            )
        )
        w_dist = np.asarray(
            maths.se3_distance(jnp.asarray(ws.points[i]), jnp.asarray(ws.points[j]))
        )
        distance_ratio = float(np.mean(c_dist / np.maximum(w_dist, 1e-12)))
    else:
        distance_ratio = float("nan")

    out = {
        "n_nodes": ws.num_nodes,
        "n_edges": len(ws.edges),
        "n_configured": int(solver.has_config.sum()),
        "disconnection_ratio": disconnection_ratio,
        "distance_ratio": distance_ratio,
    }
    if verbose:
        print("\nRoadmap quality:")
        print("Number of nodes:", out["n_nodes"])
        print("Number of edges:", out["n_edges"])
        print("Configured nodes:", out["n_configured"])
        print(f"Disconnection Ratio: {disconnection_ratio} %")
        print(f"Distance Ratio: {distance_ratio} rad/m")
    return out
