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


def census_reachability(resolution, restarts=8, seed=0, verbose=True):
    """Reachability census of the workspace graph (round-3 ad-hoc tool,
    promoted: VERDICT r4 weak #5 'census tooling exists' should be a
    real API).

    For every workspace node, batched IK decides whether ANY valid
    configuration reaches it: one restart seeded from the nearest
    CONFIGURED node's config (keeps witnesses basin-aligned with the
    existing field), then ``restarts`` random restarts. A node is
    *reachable* if any round converges to a valid config; the witness
    kept is from the earliest round (nearest-seed preferred).

    Returns dict(reachable (N,) bool, witness (N, A) f32, and the
    counts: n_nodes, n_reachable, n_configured,
    coverage_of_reachable [%]).
    """
    solver = resolution.solver
    ws = solver.workspace
    robot = resolution.robot
    n = ws.num_nodes
    pts = ws.points

    reachable = solver.has_config.copy()
    witness = solver.configs.copy()

    # round 0: seed from the nearest configured node's config
    cfg_nodes = np.flatnonzero(solver.has_config)
    todo = np.flatnonzero(~reachable)
    if len(cfg_nodes) and len(todo):
        d = np.linalg.norm(
            pts[todo, None, :3] - pts[None, cfg_nodes, :3], axis=-1
        )
        seeds = solver.configs[cfg_nodes[np.argmin(d, axis=1)]]
        q, ok = robot.solve_ik_batch(pts[todo], seeds)
        q, ok = np.asarray(q), np.asarray(ok)
        witness[todo[ok]] = q[ok]
        reachable[todo[ok]] = True

    rng = np.random.default_rng(seed)
    for r in range(restarts):
        todo = np.flatnonzero(~reachable)
        if not len(todo):
            break
        inits = robot.sample(len(todo), rng=rng)
        q, ok = robot.solve_ik_batch(pts[todo], inits)
        q, ok = np.asarray(q), np.asarray(ok)
        witness[todo[ok]] = q[ok]
        reachable[todo[ok]] = True
        if verbose:
            print(f"census restart {r + 1}/{restarts}: "
                  f"{int(reachable.sum())}/{n} reachable")

    n_reach = int(reachable.sum())
    n_cfg = int(solver.has_config.sum())
    out = {
        "reachable": reachable,
        "witness": witness,
        "n_nodes": n,
        "n_reachable": n_reach,
        "n_configured": n_cfg,
        "coverage_of_reachable": 100.0 * n_cfg / max(n_reach, 1),
    }
    if verbose:
        print(f"census: {n_reach}/{n} reachable "
              f"({100.0 * n_reach / n:.1f}% of domain); "
              f"{n_cfg} configured = "
              f"{out['coverage_of_reachable']:.1f}% of reachable")
    return out
