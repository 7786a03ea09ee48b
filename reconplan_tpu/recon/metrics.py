"""Reconstruction accuracy metrics (Chamfer distance & friends).

The accuracy half of the BASELINE.json north star: "<= 1 mm Chamfer error vs
011_banana reference meshes". The reference has no metric code for this —
its QA was visual (SURVEY.md §4); here it's a first-class benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reconplan_tpu.ops.nn import nearest_neighbor


def chamfer_distance(points_a, points_b, valid_a=None, valid_b=None):
    """Symmetric Chamfer distance between two point sets (meters).

    mean_a min_b ||a-b|| + mean_b min_a ||a-b||, halved — i.e. the average
    of the two directed mean distances. Returns (chamfer, directed_ab,
    directed_ba) as scalars.
    """
    points_a = jnp.asarray(points_a, dtype=jnp.float32)
    points_b = jnp.asarray(points_b, dtype=jnp.float32)
    d_ab, _ = nearest_neighbor(points_a, points_b, valid=valid_b)
    d_ba, _ = nearest_neighbor(points_b, points_a, valid=valid_a)
    if valid_a is not None:
        wa = jnp.asarray(valid_a, dtype=jnp.float32)
        mean_ab = jnp.sum(d_ab * wa) / jnp.maximum(jnp.sum(wa), 1.0)
    else:
        mean_ab = jnp.mean(d_ab)
    if valid_b is not None:
        wb = jnp.asarray(valid_b, dtype=jnp.float32)
        mean_ba = jnp.sum(d_ba * wb) / jnp.maximum(jnp.sum(wb), 1.0)
    else:
        mean_ba = jnp.mean(d_ba)
    return 0.5 * (mean_ab + mean_ba), mean_ab, mean_ba


def chamfer_to_mesh(points, mesh_vertices, mesh_faces, n_surface_samples=200_000, seed=0):
    """Chamfer between a reconstructed point set and a ground-truth mesh,
    via dense area-weighted surface sampling of the mesh (e.g. the YCB
    ``011_banana`` references in data/objects)."""
    from reconplan_tpu.io.meshio import sample_mesh_surface

    surf, _ = sample_mesh_surface(mesh_vertices, mesh_faces, n_surface_samples, seed=seed)
    ch, ab, ba = chamfer_distance(points, surf.astype(np.float32))
    return float(ch), float(ab), float(ba)


def _closest_point_on_triangles(p, tri):
    """Exact closest point on each of k triangles to one query point.

    ``p``: (3,), ``tri``: (k, 3, 3). Returns squared distances (k,).
    Ericson, *Real-Time Collision Detection* §5.1.5 (branchless via
    nested ``jnp.where`` — all 7 Voronoi regions)."""
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    ab, ac, ap = b - a, c - a, p[None] - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p[None] - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p[None] - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v_face = vb / denom
    w_face = vc / denom
    # interior (face) candidate
    q = a + v_face[:, None] * ab + w_face[:, None] * ac
    # edge AB
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    q = jnp.where(
        (vc <= 0)[:, None] & (d1 >= 0)[:, None] & (d3 <= 0)[:, None],
        a + t_ab[:, None] * ab, q)
    # edge AC
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    q = jnp.where(
        (vb <= 0)[:, None] & (d2 >= 0)[:, None] & (d6 <= 0)[:, None],
        a + t_ac[:, None] * ac, q)
    # edge BC
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30),
                    0.0, 1.0)
    q = jnp.where(
        (va <= 0)[:, None] & ((d4 - d3) >= 0)[:, None]
        & ((d5 - d6) >= 0)[:, None],
        b + t_bc[:, None] * (c - b), q)
    # vertex regions
    q = jnp.where((d1 <= 0)[:, None] & (d2 <= 0)[:, None], a, q)
    q = jnp.where((d3 >= 0)[:, None] & (d4 <= d3)[:, None], b, q)
    q = jnp.where((d6 >= 0)[:, None] & (d5 <= d6)[:, None], c, q)
    return jnp.sum((p[None] - q) ** 2, -1)


def points_to_mesh_distance(points, triangles, k=16, row_chunk=2048):
    """EXACT distance from each query point to a triangle soup — no
    sampling floor in this direction (the mesh is evaluated as a
    continuous surface, not a point cloud).

    Candidate triangles are pruned by k-NN on centroids (k covers the
    nearest-centroid != nearest-triangle gap; holes — the thing this
    measures — show up as large distances regardless of k). Returns a
    (Q,) numpy array of distances (meters).

    This is the coverage direction the round-3 exact-residual metric
    lost: |G|/|grad G| on mesh VERTICES cannot see MISSING surface;
    dense analytic-surface samples -> mesh can (VERDICT r3 weak #6).
    """
    from reconplan_tpu.ops.nn import knn

    points = jnp.asarray(points, dtype=jnp.float32)
    triangles = jnp.asarray(triangles, dtype=jnp.float32)  # (T, 3, 3)
    cent = triangles.mean(axis=1)
    k = min(k, cent.shape[0])
    out = []
    _, idx = knn(points, cent, k, row_chunk=row_chunk)  # (Q, k)

    @jax.jit
    def exact_chunk(p_chunk, tri_chunk):
        return jax.vmap(
            lambda p, tri: jnp.sqrt(
                jnp.min(_closest_point_on_triangles(p, tri)))
        )(p_chunk, tri_chunk)

    Q = points.shape[0]
    for s in range(0, Q, row_chunk):
        p_chunk = points[s:s + row_chunk]
        tri_chunk = triangles[idx[s:s + row_chunk]]
        pad = (-p_chunk.shape[0]) % row_chunk
        if pad:
            p_chunk = jnp.pad(p_chunk, ((0, pad), (0, 0)))
            tri_chunk = jnp.pad(tri_chunk, ((0, pad), (0, 0), (0, 0), (0, 0)))
        d = exact_chunk(p_chunk, tri_chunk)
        out.append(np.asarray(d[: min(row_chunk, Q - s)]))
    return np.concatenate(out)
