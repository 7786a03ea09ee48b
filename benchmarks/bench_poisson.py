"""Benchmark: Poisson reconstruction of the banana (BASELINE config 2).

Samples the YCB banana surface (standing in for a stitched cloud), runs the
spectral Poisson solve, and reports Chamfer vs the reference ``poisson/``
mesh + solve time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANANA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data/objects/011_banana/poisson/nontextured.ply",
)


def main(n_points=60_000, depth=128):
    import jax
    import jax.numpy as jnp

    from reconplan_tpu.io.meshio import load_mesh, sample_mesh_surface
    from reconplan_tpu.recon.metrics import chamfer_to_mesh
    from reconplan_tpu.recon.poisson import poisson_reconstruct

    v, f = load_mesh(BANANA)
    pts, nrm = sample_mesh_surface(v, f, n_points, seed=0)
    pts = pts.astype(np.float32)
    nrm = nrm.astype(np.float32)

    # warm
    tris = poisson_reconstruct(pts, nrm, depth=depth)
    t0 = time.perf_counter()
    tris = poisson_reconstruct(pts, nrm, depth=depth)
    dt = time.perf_counter() - t0

    ch, p_mesh2gt, p_gt2mesh = chamfer_to_mesh(tris.reshape(-1, 3), v, f)
    print(json.dumps({
        "config": "banana poisson reconstruction",
        "depth": depth,
        "input_points": n_points,
        "solve_seconds": round(dt, 2),
        "triangles": int(len(tris)),
        "chamfer_mm": round(ch * 1000, 3),
        "mesh_to_gt_mm": round(p_mesh2gt * 1000, 3),
        "gt_to_mesh_mm": round(p_gt2mesh * 1000, 3),
    }))


if __name__ == "__main__":
    main()
