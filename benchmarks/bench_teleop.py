"""Benchmark: teleop trajectory-quality comparison (the reference's
headline experiment, ``experiment/trajectory_quality.py:288-420``).

Protocol (reference parity): N trajectories per kind x 4 kinds
(line_random, line_self, circle_random, circle_out; 4 s @ 50 Hz,
``trajectory_generator.py:156-249``), tracked by four methods:

  * Expansion-GRR teleop on the built roadmap
  * Random-GRR teleop (same workspace graph, random per-node IK —
    the continuity ablation, ``trajectory_quality.py:336-355``)
  * Newton/DLS IK
  * RelaxedIK (JAX damped-GN soft-objective port)

Metrics per method: success rate (goal < 0.1, valid path), mean DTW
deviation between workspace trajectories, and config/workspace length
ratio (lower = less joint motion per task motion).

Runs on the CPU backend by default: the solvers are host-orchestrated
per-tick loops (teleop semantics), and per-tick dispatch over the
tunneled TPU would measure RPC latency, not algorithm quality.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ["line_random", "line_self", "circle_random", "circle_out"]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--robot", default="ur10")
    ap.add_argument("--rotation-type", default="rot_free")
    ap.add_argument("--nodes", type=int, default=1000)
    ap.add_argument("--per-kind", type=int, default=100,
                    help="trajectories per kind (reference protocol: 100)")
    ap.add_argument("--graph-dir", default=None,
                    help="load a prebuilt roadmap instead of building")
    ap.add_argument("--no-relaxed", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from reconplan_tpu.apps.redundancy import build_roadmap, discover_seed_configs  # noqa: F401
    from reconplan_tpu.grr import RedundancyResolution
    from reconplan_tpu.grr.experiment import (
        generate_trajectories,
        make_random_resolution,
        run_teleop_benchmark,
    )
    from reconplan_tpu.io.config import load_problem
    from reconplan_tpu.kin.robot import make_robot

    if args.graph_dir:
        opts = load_problem(args.robot, args.rotation_type)
        robot = make_robot(opts)
        res = RedundancyResolution(robot)
        res.load_workspace_graph(os.path.join(args.graph_dir, "workspace.npz"))
        res.load_resolution_graph(os.path.join(args.graph_dir, "resolution.npz"))
        sv = os.path.join(args.graph_dir, "solver.npz")
        if os.path.exists(sv):
            res.load_solver_graph(sv)
    else:
        t0 = time.time()
        res, _metrics = build_roadmap(
            args.robot, args.rotation_type, n_pos_points=args.nodes,
            out_dir=os.path.join("/tmp", "bench_teleop_graph"),
            verbose=True,
        )
        print(f"roadmap build: {time.time()-t0:.1f}s")

    robot = res.robot
    t0 = time.time()
    random_res = make_random_resolution(res)
    print(f"random-GRR roadmap: {time.time()-t0:.1f}s")

    all_results = {}
    for kind in KINDS:
        trajs = generate_trajectories(
            robot, kind=kind, n_trajectories=args.per_kind, seed=7
        )
        t0 = time.time()
        summary = run_teleop_benchmark(
            res, trajs,
            include_relaxed=not args.no_relaxed,
            random_resolution=random_res,
        )
        all_results[kind] = summary
        print(f"\n== {kind} ({len(trajs)} trajectories, "
              f"{time.time()-t0:.1f}s) ==")
        for method, row in summary.items():
            if row:
                print(
                    f"  {method:<11} success {row['success_rate']:.2f}  "
                    f"DTW {row['mean_dtw']:.3f}  ratio {row['mean_ratio']:.2f}"
                    f"  (n={row['n']})"
                )

    # aggregate over kinds (methods with no valid rows anywhere -> None,
    # so a fully-failed arm can't ZeroDivisionError the whole run)
    agg = {}
    for method in next(iter(all_results.values())):
        rows = [r[method] for r in all_results.values() if r.get(method)]
        if not rows:
            agg[method] = None
            continue
        agg[method] = {
            "success_rate": sum(r["success_rate"] for r in rows) / len(rows),
            "mean_dtw": sum(r["mean_dtw"] for r in rows) / len(rows),
            "mean_ratio": sum(r["mean_ratio"] for r in rows) / len(rows),
        }
    print("\n== aggregate ==")
    for method, row in agg.items():
        if row is None:
            print(f"  {method:<11} (no valid rows)")
            continue
        print(
            f"  {method:<11} success {row['success_rate']:.2f}  "
            f"DTW {row['mean_dtw']:.3f}  ratio {row['mean_ratio']:.2f}"
        )
    out = {"per_kind": all_results, "aggregate": agg,
           "config": {"robot": args.robot, "nodes": args.nodes,
                      "per_kind": args.per_kind}}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    grr_row = agg.get("grr")
    print(json.dumps({"metric": "teleop success rate (GRR aggregate)",
                      "value": round(grr_row["success_rate"], 3)
                      if grr_row else None,
                      "unit": "fraction"}))


if __name__ == "__main__":
    main()
