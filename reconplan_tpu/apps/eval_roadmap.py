"""Roadmap quality evaluation CLI (``experiment/roadmap_quality.py`` parity).

Usage: python -m reconplan_tpu.apps.eval_roadmap <robot> <rotation_type>
           [--dir graph/<robot>/<type>]
"""

from __future__ import annotations

import argparse
import os

from reconplan_tpu.grr import RedundancyResolution, evaluate_roadmap
from reconplan_tpu.io.config import load_problem
from reconplan_tpu.kin.robot import make_robot


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("robot", nargs="?", default="ur10")
    ap.add_argument("rotation_type", nargs="?", default="rot_variable_yaw")
    ap.add_argument("--dir", default=None)
    args = ap.parse_args(argv)

    opts = load_problem(args.robot, args.rotation_type)
    robot = make_robot(opts)
    res = RedundancyResolution(robot)
    d = args.dir or os.path.join("graph", args.robot, args.rotation_type)
    res.load_workspace_graph(os.path.join(d, "workspace.npz"))
    res.load_resolution_graph(os.path.join(d, "resolution.npz"))

    # rebuild solver state from the resolution for the metric pass: mark
    # resolution nodes as configured on the workspace graph
    import numpy as np

    ws_pts = res.workspace.points
    from reconplan_tpu.ops.nn import nearest_neighbor
    import jax.numpy as jnp

    d_, idx = nearest_neighbor(jnp.asarray(res.points), jnp.asarray(ws_pts))
    idx = np.asarray(idx)
    res.solver.configs[idx] = res.configs
    res.solver.has_config[idx] = True
    for e, (i, j) in enumerate(res.workspace.edges):
        res.solver.edge_connected[e] = bool(
            res.solver.has_config[i] and res.solver.has_config[j]
        )
    evaluate_roadmap(res)


if __name__ == "__main__":
    main()
