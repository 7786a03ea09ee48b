"""Flagship scan-plan-capture-reconstruct app — rebuild of ``main.py``.

Pipeline (reference ``main.py:18-254``):
  1. load (or build) the UR10 GRR roadmap;
  2. construct the 500-pose tilted look-at arc around the object
     (``main.py:68-136``) -> wtraj_input.txt;
  3. solve it sequentially with GRR threading curr_config
     (``grr_plan``, ``main.py:257-307``) -> ctraj.txt, trackarr.txt;
  4. FK the joint trajectory -> wtraj.txt (``main.py:153-165``);
  5. "execute": sample n_images camera poses evenly along the trajectory
     and render RGBD from the wrist D435 frame (the reference stepped
     PyBullet at 240 Hz and grabbed 12 frames; here the synthetic splat
     camera renders the same look-at views on device);
  6. reconstruct: ICP stitching (stitcher path) AND/OR direct TSDF fusion
     with the FK camera poses + marching cubes; report Chamfer vs the YCB
     ground truth.

Where the reference needed a GUI, two PyBullet clients, and Open3D, this
runs end-to-end on one TPU with numpy glue.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax.numpy as jnp

from reconplan_tpu.core import maths
from reconplan_tpu.grr.paths import scan_arc
from reconplan_tpu.io.frames import FrameSet
from reconplan_tpu.io.meshio import load_mesh, save_ply
from reconplan_tpu.io.render import SplatCamera, camera_look_at
from reconplan_tpu.recon.fusion import FusionPipeline
from reconplan_tpu.recon.metrics import chamfer_to_mesh
from reconplan_tpu.recon.stitcher import PinholeIntrinsic, RGBDStitcher

OBJECT_POINT = [0.75, 0.75, 0.0]  # main.py:45
BANANA_MESH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "objects", "011_banana", "poisson", "nontextured.ply",
)
# D435 intrinsics hardcoded at main.py:241-244
D435 = dict(fx=615.6707153320312, fy=615.962158203125,
            cx=326.0557861328125, cy=240.55592346191406)


def grr_plan(grr, workspace_path, track_array=None, batched=True,
             ik_fallback=True):
    """GRR solve threading curr_config (``main.py:257-307``).

    ``batched=True`` runs the whole path as one on-device ``lax.scan``
    (RedundancyResolution.solve_batch — ~80x faster than the per-waypoint
    host loop on a tunneled TPU); ``batched=False`` replays the reference's
    python loop with TrackArray diagnostics.

    ``ik_fallback`` retries waypoints the roadmap solve could not reach
    with plain seeded IK (the reference solve() falls back to regular IK
    when the roadmap has nothing to offer): on multi-arc scans the small
    scan roadmap only spans the original arc's region, and capture poses
    — not roadmap continuity — are what the closed loop needs.
    """
    if track_array is None:
        track_array = []
    if batched:
        qs, ok, track = grr.solve_batch(
            np.asarray(workspace_path), return_track=True
        )
        ok = list(np.asarray(ok))
        config_path = [q if o else None for q, o in zip(qs, ok)]
        # same tracking-mode diagnostic solve() appends (min joint distance
        # to the roadmap seed, resolution.py:322) so trackarr.txt stays
        # comparable to the reference's golden file.
        track_array.extend(float(t) for t in track)
        if ik_fallback and not all(ok):
            robot = grr.robot
            bad = [i for i, o in enumerate(ok) if not o]
            # bucket the batch to a power of two: per-size recompiles of
            # the IK solver cost minutes each on the tunneled runtime
            B = max(8, 1 << int(np.ceil(np.log2(len(bad)))))
            R = 16  # random restarts per waypoint (reach-boundary poses
            # are seed-sensitive; one batched dispatch covers them all)
            pts = np.asarray(workspace_path)[
                np.pad(bad, (0, B - len(bad)), mode="edge")
            ]
            # local Generator: deterministic fallback seeds without
            # mutating the robot's shared RNG stream (all later
            # robot.sample() callers would otherwise become correlated)
            seeds = np.asarray(
                robot.sample(B * R, rng=np.random.default_rng(0)),
                dtype=np.float32,
            )
            qf, okf = robot.solve_ik_batch(
                np.repeat(pts[:, :3], R, axis=0), seeds
            )
            qf = np.asarray(qf).reshape(B, R, -1)
            okf = np.asarray(okf).reshape(B, R)
            n_rescued = 0
            for j, i in enumerate(bad):
                hit = np.flatnonzero(okf[j])
                if len(hit):
                    config_path[i] = qf[j, hit[0]]
                    n_rescued += 1
            if n_rescued:
                print(f"ik fallback rescued {n_rescued}/{len(bad)} waypoints")
    else:
        config_path = []
        curr = None
        for waypoint in workspace_path:
            q = grr.solve(
                list(waypoint), curr_config=curr, none_on_fail=True,
                TrackArray=track_array,
            )
            config_path.append(q)
            if q is not None:
                curr = q
    n_bad = sum(1 for q in config_path if q is None)
    if n_bad:
        print(f"\n{n_bad} invalid configurations found\n")
    return config_path


def make_arc_schedule(n_arcs, per_arc, base_az=3 * np.pi / 4):
    """The scan's viewpoint schedule (``main.py:68-136`` arc, widened).

    1 arc = the reference demo's single overhead arc. >1 arcs = the
    measured round-4 coverage schedule: alternating MID (r=0.25, h=0.10)
    and LOW grazing (r=0.22, h=0.035) arcs spread over 360 deg azimuth
    (halves the near-table observation misses vs a 45-deg fan).
    """
    if n_arcs <= 1:
        return [scan_arc(OBJECT_POINT, radius=0.3, height=0.15,
                         num_points=per_arc)]
    return [
        scan_arc(
            OBJECT_POINT,
            radius=0.25 if a % 2 == 0 else 0.22,
            height=0.10 if a % 2 == 0 else 0.035,
            num_points=per_arc,
            azimuth=base_az + a * 2 * np.pi / n_arcs,
            max_horiz=1.03,  # stay inside the UR10 look-at reach
        )
        for a in range(n_arcs)
    ]


def build_observation_cloud(frames, max_points=80_000, seed=0):
    """Backproject every captured frame into one world-frame observation
    cloud (points + their camera centers). 80k samples keep the O(N^2)
    normal-estimation kNN tractable on every backend while staying in
    the ~0.4 mm Poisson class (eval_poisson_fidelity uses 60k)."""
    from reconplan_tpu.ops.pointcloud import backproject_depth

    obs_pts, obs_cam = [], []
    for i in range(len(frames.depth)):
        cl = backproject_depth(
            jnp.asarray(frames.depth[i]),
            D435["fx"], D435["fy"], D435["cx"], D435["cy"],
            depth_scale=frames.depth_scale or 1000.0,
        )
        p = np.asarray(cl.points)[np.asarray(cl.valid).astype(bool)]
        T = np.asarray(frames.poses[i])
        obs_pts.append((p @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        obs_cam.append(np.broadcast_to(T[:3, 3].astype(np.float32), p.shape))
    obs = np.concatenate(obs_pts)
    cams = np.concatenate(obs_cam)
    if len(obs) > max_points:
        pick = np.random.default_rng(seed).choice(
            len(obs), max_points, replace=False)
        obs, cams = obs[pick], cams[pick]
    return obs, cams


def poisson_close_mesh(obs, cams, depth=192):
    """Screened-Poisson watertight closure from the observation cloud.

    Input = raw BACKPROJECTED observations with camera-oriented
    covariance normals, NOT the MC mesh vertices: MC staircase normals
    at voxel scale are noisy enough to swell the solve (measured
    2.17 mm vs GT from MC input at 256^3; observation input
    reconstructs the banana at the ~0.4 mm class of
    eval_poisson_fidelity.py). Returns (T, 3, 3) triangles.
    """
    from reconplan_tpu.ops.pointcloud import estimate_normals, make_cloud
    from reconplan_tpu.recon.poisson import poisson_reconstruct

    ncl = estimate_normals(make_cloud(jnp.asarray(obs)), k=16)
    nrm = np.array(ncl.normals)  # writable copy (asarray of a jax
    # buffer is read-only)
    # orient toward each point's OWN camera (estimate_normals orients
    # toward the origin, which is the robot base here)
    flip = np.sum(nrm * (cams - obs), axis=-1) < 0
    nrm[flip] = -nrm[flip]
    return np.asarray(
        poisson_reconstruct(obs, nrm.astype(np.float32), depth=depth)
    )


def free_space_refuted(samples, frames, margin=0.004, miss_is_free=True):
    """True where some camera verifiably saw THROUGH a world point.

    A point is refuted when it projects into a frame and its camera-space
    depth is shorter than the observed depth at that pixel by > ``margin``
    (the ray passed through it to reach a surface behind). With
    ``miss_is_free`` (valid for the sim splat camera, whose only scene
    content is the object — no floor/background), a no-return pixel also
    refutes: the ray hit nothing at all. Real sensors should pass
    ``miss_is_free=False`` (no-return pixels are unreliable there).
    """
    fx, fy, cx, cy = frames.intrinsics
    scale = frames.depth_scale or 1000.0
    samples = np.asarray(samples, np.float32)
    refuted = np.zeros(len(samples), bool)
    for i in range(len(frames.depth)):
        T = np.asarray(frames.poses[i])
        pc = (samples - T[:3, 3]) @ T[:3, :3]  # world -> camera
        z = pc[:, 2]
        front = z > 1e-3
        zs = np.where(front, z, 1.0)
        u = np.round(fx * pc[:, 0] / zs + cx).astype(np.int64)
        v = np.round(fy * pc[:, 1] / zs + cy).astype(np.int64)
        H, W = frames.depth[i].shape
        ok = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        d = np.zeros(len(samples), np.float32)
        d[ok] = np.asarray(frames.depth[i], np.float32)[v[ok], u[ok]] / scale
        seen_through = ok & (d > 0) & (z < d - margin)
        if miss_is_free:
            seen_through |= ok & (d <= 0)
        refuted |= seen_through
    return refuted


def close_gate_signals(open_tris, closed_tris, obs,
                       n_samples=15_000, hole_tau=0.006, seed=0,
                       frames=None, volume_bounds=None, margin=0.004,
                       miss_is_free=True):
    """GT-free evidence for choosing the open TSDF mesh vs its
    Poisson-closed variant (the auto `close_mesh="auto"` gate).

    The gate scores both meshes against the observation cloud, then
    splits the closed mesh's closure area (surface >hole_tau from any
    observation) by the capture's own free-space evidence:

      * fit_open / fit_closed — mean exact point-to-triangle distance
        observations -> mesh: how well each mesh tracks real data.
      * REFUTED closure — samples some camera verifiably saw through
        (``free_space_refuted``) or that fall outside the scan volume:
        hallucinated surface. Charged to the CLOSED mesh at its
        distance from the observations (a lower bound on its error).
      * UNOBSERVED closure — the rest (e.g. the underside no
        above-floor camera can see): plausibly-true surface the open
        mesh is missing. Charged to the OPEN mesh at the samples'
        distance to it.

    Without evidence (``frames``/``volume_bounds`` both None) every
    closure sample counts as unobserved — the round-4 behavior, which
    measured the failure this split exists for: a dense 72-frame capture
    whose Poisson closure ballooned 3 cm below the object (3.600 mm vs
    the open mesh's 0.733 mm true Chamfer) still won the gate, because
    hallucinated closure in verifiably-empty space was priced as
    truth the open mesh lacked.
    """
    from reconplan_tpu.ops.nn import nearest_neighbor
    from reconplan_tpu.recon.metrics import points_to_mesh_distance

    rng = np.random.default_rng(seed)
    sub = obs[rng.choice(len(obs), min(n_samples, len(obs)),
                         replace=False)]
    fit_open = float(np.mean(points_to_mesh_distance(
        jnp.asarray(sub), jnp.asarray(open_tris))))
    fit_closed = float(np.mean(points_to_mesh_distance(
        jnp.asarray(sub), jnp.asarray(closed_tris))))

    # area-weighted samples of the closed surface
    tri = np.asarray(closed_tris, np.float32)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
    p_tri = area / max(area.sum(), 1e-12)
    pick = rng.choice(len(tri), n_samples, p=p_tri)
    u, v = rng.uniform(size=(2, n_samples)).astype(np.float32)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    t = tri[pick]
    csamp = (t[:, 0] + u[:, None] * (t[:, 1] - t[:, 0])
             + v[:, None] * (t[:, 2] - t[:, 0]))
    d_obs = np.asarray(
        nearest_neighbor(jnp.asarray(csamp), jnp.asarray(obs))[0])
    in_hole = d_obs > hole_tau
    hole_frac = float(in_hole.mean())

    refuted = np.zeros(n_samples, bool)
    if frames is not None:
        refuted = free_space_refuted(
            csamp, frames, margin=margin, miss_is_free=miss_is_free)
    if volume_bounds is not None:
        lo, hi = (np.asarray(b, np.float32) for b in volume_bounds)
        refuted |= np.any((csamp < lo - margin) | (csamp > hi + margin),
                          axis=-1)
    refuted &= in_hole  # fit_* already prices the observed area
    unobs = in_hole & ~refuted

    refuted_frac = float(refuted.mean())
    unobs_frac = float(unobs.mean())
    hole_mean_open = (
        float(np.mean(np.asarray(points_to_mesh_distance(
            jnp.asarray(csamp[unobs]), jnp.asarray(open_tris)))))
        if unobs.any() else 0.0
    )
    refuted_mean = float(d_obs[refuted].mean()) if refuted.any() else 0.0
    proxy_open = fit_open + unobs_frac * hole_mean_open
    proxy_closed = fit_closed + refuted_frac * refuted_mean
    return {
        "fit_open_mm": fit_open * 1000,
        "fit_closed_mm": fit_closed * 1000,
        "hole_frac": hole_frac,
        "refuted_frac": refuted_frac,
        "unobserved_frac": unobs_frac,
        "hole_mean_open_mm": hole_mean_open * 1000,
        "refuted_mean_mm": refuted_mean * 1000,
        "proxy_open_mm": proxy_open * 1000,
        "proxy_closed_mm": proxy_closed * 1000,
        "best": "closed" if proxy_closed < proxy_open else "open",
    }


def run_scan(
    roadmap_dir=None,
    n_waypoints=500,
    n_images=12,
    out_dir="scan_output",
    reconstruct="fuse",  # "fuse" | "stitch" | "both"
    grid_dim=256,
    n_roadmap_nodes=500,
    n_arcs=1,
    rotation_type=None,
    engine=None,  # "brick" | "dense" | None = brick on TPU, dense on CPU
    close_mesh="auto",  # "auto" | True | False — Poisson closing pass
    close_depth=192,  # Poisson grid resolution for the closing pass
    verbose=True,
):
    """Closed-loop scan-plan-capture-reconstruct (``main.py`` parity).

    ``n_arcs`` > 1 plans additional scan arcs at rotated azimuths (the
    reference demo's single overhead arc only observes the object's top
    and two ends — its flanks get no observations, which dominates the
    closed-loop Chamfer: measured 0.44 mm mesh->gt but 3.0 mm gt->mesh at
    512^3 with one arc). Waypoints and captures split evenly across arcs.
    """
    os.makedirs(out_dir, exist_ok=True)
    from reconplan_tpu.grr import RedundancyResolution
    from reconplan_tpu.io.config import load_problem
    from reconplan_tpu.kin.robot import make_robot
    from reconplan_tpu.utils.profiling import StageTimer

    timer = StageTimer()

    if rotation_type is None:
        # infer the GRR problem from the roadmap path so shipped variants
        # (rot_free scan arc, rot_fixed, rot_variable_yaw) all Just Work
        rotation_type = "rot_free"
        for rt in ("rot_variable_yaw", "rot_fixed"):
            if roadmap_dir and rt in str(roadmap_dir):
                rotation_type = rt
    opts = load_problem("ur10", rotation_type)
    robot = make_robot(opts)
    grr = RedundancyResolution(robot)
    if roadmap_dir and os.path.exists(os.path.join(roadmap_dir, "resolution.npz")):
        grr.load_resolution_graph(os.path.join(roadmap_dir, "resolution.npz"))
        grr.load_workspace_graph(os.path.join(roadmap_dir, "workspace.npz"))
    else:
        if verbose:
            print("No roadmap found - building one")
        from reconplan_tpu.apps.redundancy import build_roadmap

        grr, _ = build_roadmap(
            "ur10", "rot_free", n_pos_points=n_roadmap_nodes,
            sampling_method="random", out_dir=roadmap_dir, verbose=verbose,
        )

    # ---- arc construction (main.py:68-136) ----
    per_arc = max(n_waypoints // max(n_arcs, 1), 2)
    arcs = make_arc_schedule(n_arcs, per_arc)
    arc = np.concatenate(arcs, axis=0)
    with open(os.path.join(out_dir, "wtraj_input.txt"), "w") as f:
        for p in arc:
            f.write(",".join(map(str, [list(p[:3]), list(p[3:7])])) + "\n")

    # ---- GRR plan (main.py:142-151) ----
    track = []
    t0 = time.time()
    config_path = []
    with timer.stage("plan"):
        for a in arcs:
            config_path.extend(grr_plan(grr, a, track))
    if verbose:
        ok = sum(1 for q in config_path if q is not None)
        print(f"grr_plan: {ok}/{len(arc)} waypoints solved in {time.time()-t0:.1f}s")
    maneuver_time = 10.0  # main.py:145
    times = np.linspace(0, maneuver_time, len(config_path))
    with open(os.path.join(out_dir, "ctraj.txt"), "w") as f:
        for t, q in zip(times, config_path):
            f.write(f"{t},{np.array2string(np.asarray(q), separator=' ') if q is not None else None}\n")
    with open(os.path.join(out_dir, "trackarr.txt"), "w") as f:
        for entry in track:
            f.write(f"{entry}\n")

    # ---- FK workspace trajectory (main.py:153-165) ----
    valid = [q for q in config_path if q is not None]
    if not valid:
        raise RuntimeError("no valid configurations solved")
    qs = np.asarray(valid, dtype=np.float32)
    ee = np.asarray(robot.fk_point_batch(qs))
    with open(os.path.join(out_dir, "wtraj.txt"), "w") as f:
        for t, p in zip(times, ee):
            f.write(f"{t},[array({list(p[:3])}), array({list(p[3:7])})]\n")

    # ---- capture (main.py:213-234; bullet_camera.py) ----
    cam = SplatCamera(**D435)
    cam.add_mesh_file(BANANA_MESH, translate=OBJECT_POINT)
    cam_link = robot.camera_link
    # camera positions: FK of the d435 color frame along the trajectory
    full_pos, _ = robot.solve_fk_batch(qs)
    # fk_links doesn't include the camera link; do a direct FK for it
    from reconplan_tpu.kin.chain import fk_all
    import jax

    def cam_pos_of(q):
        full = robot._q_rest.at[robot._active_idx].set(q)
        _, t = fk_all(robot.model, full)
        return t[cam_link]

    cam_positions = np.asarray(
        jax.jit(jax.vmap(cam_pos_of))(jnp.asarray(qs))
    )
    pick = np.linspace(0, len(qs) - 1, n_images).astype(int)
    depths, colors, poses = [], [], []
    with timer.stage("capture"):
        for i in pick:
            d, c, T = cam.take_picture(cam_positions[i], OBJECT_POINT)
            depths.append(d)
            colors.append(c)
            poses.append(T)
    frames = FrameSet(
        depth=np.stack(depths),
        color=np.stack(colors),
        poses=np.stack(poses).astype(np.float32),
        depth_scale=1000.0,
        intrinsics=(D435["fx"], D435["fy"], D435["cx"], D435["cy"]),
    )
    if verbose:
        cover = (frames.depth > 0).mean(axis=(1, 2))
        print(f"captured {n_images} frames, mean coverage {cover.mean():.3%}")

    # ---- reconstruction ----
    results = {}
    gt_v, gt_f = load_mesh(BANANA_MESH)
    gt_v = gt_v + np.asarray(OBJECT_POINT)

    if reconstruct in ("fuse", "both"):
        t0 = time.time()
        if engine is None:
            # the Pallas brick kernel needs a real TPU (CPU would run the
            # Mosaic interpreter); the dense XLA path is the CPU fallback
            import jax as _jax

            engine = "brick" if _jax.default_backend() != "cpu" else "dense"
        pipe = FusionPipeline(
            dims=(grid_dim,) * 3,
            origin=(OBJECT_POINT[0] - 0.15, OBJECT_POINT[1] - 0.15, -0.05),
            voxel_size=0.3 / (grid_dim - 1),
            with_color=True,
            engine=engine,
        )
        with timer.stage("fuse"):
            pipe.integrate(frames)
            mesh, mesh_colors = pipe.extract_mesh(with_colors=True)
        if verbose:
            print(f"TSDF fusion + MC: {time.time()-t0:.1f}s, {len(mesh)} triangles")
        save_ply(
            os.path.join(out_dir, "fused_mesh.ply"),
            triangles=mesh,
            colors=mesh_colors.reshape(-1, 3) if len(mesh) else None,
        )
        if len(mesh):
            ch, ab, ba = chamfer_to_mesh(mesh.reshape(-1, 3), gt_v, gt_f)
            results["fuse_chamfer_mm"] = ch * 1000
            results["fuse_chamfer_ab_mm"] = ab * 1000
            results["fuse_chamfer_ba_mm"] = ba * 1000
            if verbose:
                print(
                    f"fused mesh Chamfer vs GT: {ch*1000:.3f} mm "
                    f"(mesh->gt {ab*1000:.3f}, gt->mesh {ba*1000:.3f})"
                )
    if close_mesh:
        # Poisson-closed watertight mesh: the TSDF marching-cubes mesh
        # only emits surface where voxels were OBSERVED (weight >= 1),
        # so the object's underside — unobservable from any above-floor
        # camera — is an open hole that gt->mesh Chamfer pays several mm
        # for. Screened-Poisson reconstruction (recon/poisson.py)
        # extrapolates a smooth closure. At DENSE capture the smooth
        # closure instead fights real observations (measured @512³:
        # 72 frames 0.734 → 3.600 mm, 24 frames 2.787 → 1.121 mm), so
        # the default close_mesh="auto" scores both meshes against the
        # observation cloud (close_gate_signals — GT-free) and keeps the
        # winner; True/False force the round-3/round-4 manual behaviors.
        t0 = time.time()
        obs, cams = build_observation_cloud(frames)
        with timer.stage("poisson_close"):
            closed = poisson_close_mesh(obs, cams, depth=close_depth)
        save_ply(os.path.join(out_dir, "closed_mesh.ply"), triangles=closed)
        ch, ab, ba = chamfer_to_mesh(closed.reshape(-1, 3), gt_v, gt_f)
        results["closed_chamfer_mm"] = ch * 1000
        results["closed_chamfer_ab_mm"] = ab * 1000
        results["closed_chamfer_ba_mm"] = ba * 1000
        if verbose:
            print(
                f"Poisson-closed mesh ({time.time()-t0:.1f}s, "
                f"{len(closed)} triangles, {len(obs)} obs points) "
                f"Chamfer vs GT: {ch*1000:.3f} mm "
                f"(mesh->gt {ab*1000:.3f}, gt->mesh {ba*1000:.3f})"
            )
        open_mesh = results.get("fuse_chamfer_mm") is not None and len(mesh)
        if close_mesh == "auto" and open_mesh:
            with timer.stage("close_gate"):
                vol_lo = np.asarray(pipe.origin, np.float32)
                vol_hi = vol_lo + (np.asarray(pipe.dims) - 1) * pipe.voxel_size
                gate = close_gate_signals(
                    np.asarray(mesh, np.float32), closed, obs,
                    frames=frames, volume_bounds=(vol_lo, vol_hi),
                )
            results["close_gate"] = gate
            best_tris = closed if gate["best"] == "closed" else mesh
            best_key = ("closed_chamfer_mm" if gate["best"] == "closed"
                        else "fuse_chamfer_mm")
            results["best_mesh"] = gate["best"]
            results["best_chamfer_mm"] = results[best_key]
            save_ply(os.path.join(out_dir, "best_mesh.ply"),
                     triangles=np.asarray(best_tris))
            if verbose:
                print(
                    f"auto close gate: kept {gate['best']} mesh "
                    f"(proxy open {gate['proxy_open_mm']:.3f} mm vs "
                    f"closed {gate['proxy_closed_mm']:.3f} mm; "
                    f"hole {gate['hole_frac']:.3%} = "
                    f"refuted {gate['refuted_frac']:.3%} + "
                    f"unobserved {gate['unobserved_frac']:.3%})"
                )
        elif close_mesh == "auto":
            results["best_mesh"] = "closed"
            results["best_chamfer_mm"] = results["closed_chamfer_mm"]
    elif results.get("fuse_chamfer_mm") is not None:
        results["best_mesh"] = "open"
        results["best_chamfer_mm"] = results["fuse_chamfer_mm"]

    if reconstruct in ("stitch", "both"):
        t0 = time.time()
        stitcher = RGBDStitcher(PinholeIntrinsic(640, 480, **D435))
        # the reference's 2 cm default voxel targets room-scale scenes;
        # a 20 cm tabletop object needs scene-scale resolution (the model
        # cloud otherwise collapses to ~80 voxel centroids, ~4 mm Chamfer)
        stitcher.voxel_size = 0.004
        stitcher.distance_threshold = 0.02
        # capacity sized to the object (~2-4k occupied 4 mm voxels): every
        # kNN / ICP-correspondence stage is O(cap^2), so the 32k default
        # would spend 95% of its FLOPs on empty slots
        stitcher.model_capacity = 8192
        with timer.stage("stitch"):
            cloud = stitcher.stitch_sequence(
                list(frames.color), list(frames.depth), poses=frames.poses
            )
        pts, cols, _ = cloud.compact()
        if verbose:
            print(f"ICP stitch: {time.time()-t0:.1f}s, {len(pts)} points")
        save_ply(os.path.join(out_dir, "stitched_cloud.ply"), vertices=pts,
                 colors=cols if len(cols) else None)
        if len(pts):
            ch, ab, ba = chamfer_to_mesh(pts, gt_v, gt_f)
            results["stitch_chamfer_mm"] = ch * 1000
            if verbose:
                print(f"stitched cloud Chamfer vs GT: {ch*1000:.3f} mm")

    results["stage_timings"] = timer.as_dict()
    if verbose:
        print(timer.report())
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--roadmap", default="graph/ur10/rot_free")
    ap.add_argument("--waypoints", type=int, default=500)
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--out", default="scan_output")
    ap.add_argument("--reconstruct", default="both",
                    choices=["fuse", "stitch", "both"])
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--arcs", type=int, default=1,
                    help="scan arcs at rotated azimuths (1 = reference demo)")
    ap.add_argument("--rotation-type", default=None,
                    help="GRR problem variant (default: infer from roadmap)")
    ap.add_argument("--engine", default=None, choices=["brick", "dense"],
                    help="TSDF engine (default: brick on TPU, dense on CPU)")
    ap.add_argument("--close-mode", default="auto",
                    choices=["auto", "always", "never"],
                    help="Poisson closing pass: auto (default) scores the "
                    "open TSDF mesh vs its closure against the observation "
                    "cloud and keeps the winner; always/never force it")
    ap.add_argument("--no-close", action="store_true",
                    help="alias for --close-mode never")
    ap.add_argument("--close-depth", type=int, default=192,
                    help="Poisson grid resolution of the closing pass")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force a JAX backend (cpu enables host-only runs)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace to DIR "
                    "(view with tensorboard --logdir DIR)")
    args = ap.parse_args(argv)
    from reconplan_tpu.utils.profiling import maybe_trace
    from reconplan_tpu.utils.tpu_lock import tpu_lock

    if args.platform == "cpu":
        # session env presets JAX_PLATFORMS=axon; force the override
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # one-tunnel-client-at-a-time discipline: hold the pidfile for the
    # whole scan when this process will dial the TPU (the tunnel
    # serializes clients — a scan running during a bench capture would
    # stall both; see utils/tpu_lock.py). Decide from the configured
    # platform STRING — jax.default_backend() would initialize the
    # backend, which blocks ~25 min against a downed tunnel.
    plat = (jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS") or "")
    if not plat.startswith("cpu"):
        lock = tpu_lock(name="apps.scan", wait_secs=600)
    else:
        import contextlib

        lock = contextlib.nullcontext()

    with lock, maybe_trace(args.profile):
        run_scan(
            roadmap_dir=args.roadmap,
            n_waypoints=args.waypoints,
            n_images=args.images,
            out_dir=args.out,
            reconstruct=args.reconstruct,
            grid_dim=args.grid,
            n_arcs=args.arcs,
            rotation_type=args.rotation_type,
            engine=args.engine,
            close_mesh=(False if (args.no_close or args.close_mode == "never")
                        else True if args.close_mode == "always" else "auto"),
            close_depth=args.close_depth,
        )


if __name__ == "__main__":
    main()
