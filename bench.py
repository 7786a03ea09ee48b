"""Benchmark: TSDF fusion throughput at 512^3 (the BASELINE.json metric).

Measures steady-state RGBD frames/second integrated into a 512^3 voxel TSDF
grid on the available TPU, using 640x480 synthetic depth frames (the
D435's resolution) in batches. Prints ONE JSON line:

    {"metric": ..., "value": fps, "unit": "frames/sec",
     "vs_baseline": fps / 1000}

vs_baseline is against the north-star target (>= 1000 fps @ 512^3,
BASELINE.json) — the reference publishes no numbers of its own
(BASELINE.md): its capture path is bounded by the 30 fps RealSense stream.
"""

import json
import time

import numpy as np


def make_frames(n_frames, H=480, W=640, fx=615.67, fy=615.96):
    cx, cy = W / 2.0, H / 2.0
    depths, poses = [], []
    for k in range(n_frames):
        ang = 2 * np.pi * k / n_frames
        eye = np.array([0.5 * np.cos(ang), 0.5 * np.sin(ang), 0.1])
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T = np.eye(4); T[:3, :3] = np.stack([x, y, z], 1); T[:3, 3] = eye
        poses.append(T)
        u = (np.arange(W) - cx) / fx
        v = (np.arange(H) - cy) / fy
        uu, vv = np.meshgrid(u, v)
        dirs = np.stack([uu, vv, np.ones_like(uu)], -1) @ T[:3, :3].T
        a = np.sum(dirs * dirs, -1)
        b = 2 * np.sum(dirs * eye, -1)
        c = np.dot(eye, eye) - 0.12**2
        disc = b * b - 4 * a * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
        depths.append(np.where(t > 0, t, 0.0).astype(np.float32) * 1000.0)
    return np.stack(depths), np.stack(poses).astype(np.float32), (fx, fy, cx, cy)


def main():
    import jax
    import jax.numpy as jnp

    from reconplan_tpu.ops import tsdf_brick as tb

    N = 512
    F = 32  # frames per measured batch (2 dispatches of 8 inside... 32/8=4)
    depths, poses, (fx, fy, cx, cy) = make_frames(F)
    depths_d = jnp.asarray(depths)  # device-staged once (real pipelines keep
    poses_d = jnp.asarray(poses)    # frames on device via the splat renderer)

    grid = tb.make_brick_grid((N, N, N), (-0.4, -0.4, -0.3), 0.8 / (N - 1))

    # warmup/compile. NOTE: a pre-compiled scalar readback is the only
    # reliable completion fence on the tunneled axon platform —
    # block_until_ready returns at enqueue time, and eager ops pay a
    # remote-compile round trip.
    fence = jax.jit(lambda x: jnp.sum(x))
    grid, n_active = tb.integrate_frames_bricked_device(
        grid, depths_d, poses_d, fx, fy, cx, cy, max_active=8192
    )
    _ = float(fence(grid.weight))

    # RPC baseline (the readback itself costs ~30 ms over the tunnel)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(fence(grid.weight))
    rpc = (time.perf_counter() - t0) / 3

    # measure: repeated integration of F-frame batches into a live grid.
    # REPS batches amortize per fence: a single 32-frame batch now runs at
    # the ~30 ms scale of the RPC readback itself, so per-batch fencing
    # would measure tunnel noise (+-8%), not the kernel.
    from reconplan_tpu.utils.profiling import maybe_trace

    REPS = 5
    times = []
    with maybe_trace():  # RECONPLAN_TRACE_DIR=<dir> captures an XLA trace
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                grid, n_active = tb.integrate_frames_bricked_device(
                    grid, depths_d, poses_d, fx, fy, cx, cy, max_active=8192
                )
            _ = float(fence(grid.weight))  # completion fence
            times.append((time.perf_counter() - t0 - rpc) / REPS)
    dt = max(min(times), 1e-9)
    fps = F / dt

    # cold-grid honesty number: ONE batch into a FRESH grid, single fence
    # (includes the per-call fence/RPC cost the amortized number factors
    # out — the floor a one-shot 32-frame capture would see)
    cold_grid = tb.make_brick_grid((N, N, N), (-0.4, -0.4, -0.3), 0.8 / (N - 1))
    t0 = time.perf_counter()
    cold_grid, _ = tb.integrate_frames_bricked_device(
        cold_grid, depths_d, poses_d, fx, fy, cx, cy, max_active=8192
    )
    _ = float(fence(cold_grid.weight))
    cold_fps = F / max(time.perf_counter() - t0 - rpc, 1e-9)

    print(
        json.dumps(
            {
                "metric": f"TSDF integration throughput @ {N}^3 voxels, 640x480 depth",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 1000.0, 3),
                "cold_grid_fps": round(cold_fps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
