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
