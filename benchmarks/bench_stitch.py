"""Benchmark: ICP stitching fidelity on the scan-arc capture fixture.

Covers BASELINE config 3 semantics — a multi-frame RGBD sweep stitched
WITHOUT robot-FK poses (the reference's real-capture route has no FK:
``stitcher.py:114-166`` always starts registration from identity). Two
arms:

  * pose-seeded: FK camera poses seed each registration (the
    scan-plan-capture loop's route);
  * pose-free: ``poses=None`` — registration chains from the previous
    frame's solved transform (sequential odometry). The stitched model
    lives in camera-0 coordinates; the ground-truth pose of frame 0 is
    used ONLY to align the result for Chamfer evaluation.

Prints per-arm Chamfer (vs the YCB banana mesh) and wall time.

Usage: python benchmarks/bench_stitch.py [--frames 32] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--arcs", type=int, default=4)
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        # session env presets JAX_PLATFORMS=axon; force the override
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        lock = None
    else:
        from reconplan_tpu.utils.tpu_lock import tpu_lock

        lock = tpu_lock(name="bench_stitch", wait_secs=600)
        lock.__enter__()
        import atexit

        atexit.register(lock.__exit__, None, None, None)

    import jax.numpy as jnp  # noqa: F401

    from reconplan_tpu.apps.scan import BANANA_MESH, D435, OBJECT_POINT
    from reconplan_tpu.grr.paths import scan_arc
    from reconplan_tpu.io.meshio import load_mesh
    from reconplan_tpu.io.render import SplatCamera
    from reconplan_tpu.recon.metrics import chamfer_to_mesh
    from reconplan_tpu.recon.stitcher import PinholeIntrinsic, RGBDStitcher

    # ---- capture a multi-arc orbit (the flank-covering scan protocol) ----
    cam = SplatCamera(**D435)
    cam.add_mesh_file(BANANA_MESH, translate=OBJECT_POINT)
    per_arc = args.frames // args.arcs
    offsets = [0, 45, -45, -90]
    eyes = np.concatenate(
        [
            scan_arc(
                OBJECT_POINT, radius=0.25, height=0.10, num_points=per_arc,
                azimuth=3 * np.pi / 4 + np.deg2rad(offsets[a % 4]),
                max_horiz=1.03,
            )[:, :3]
            for a in range(args.arcs)
        ]
    )
    depths, colors, poses = [], [], []
    for eye in eyes:
        d, c, T = cam.take_picture(eye, OBJECT_POINT)
        depths.append(d)
        colors.append(c)
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)
    print(f"captured {len(eyes)} frames "
          f"(coverage {np.mean([float((d > 0).mean()) for d in depths]):.2%})")

    gt_v, gt_f = load_mesh(BANANA_MESH)
    gt_v = gt_v + np.asarray(OBJECT_POINT)

    def run(tag, use_poses):
        st = RGBDStitcher(PinholeIntrinsic(640, 480, **D435))
        st.voxel_size = 0.004
        st.distance_threshold = 0.02
        st.model_capacity = 8192
        t0 = time.time()
        cloud = st.stitch_sequence(
            colors, depths, poses=poses if use_poses else None
        )
        pts, _, _ = cloud.compact()
        dt = time.time() - t0
        if not use_poses:
            # model is in camera-0 coordinates; align with the TRUE pose
            # of frame 0 (evaluation only)
            T0 = poses[0]
            pts = pts @ T0[:3, :3].T + T0[:3, 3]
        ch, ab, ba = chamfer_to_mesh(pts, gt_v, gt_f)
        print(
            f"{tag:<12} chamfer {ch*1000:.3f} mm "
            f"(cloud->gt {ab*1000:.3f}, gt->cloud {ba*1000:.3f})  "
            f"{len(pts)} pts  {dt:.1f}s"
        )
        return ch

    run("pose-seeded", True)
    run("pose-free", False)


if __name__ == "__main__":
    main()
