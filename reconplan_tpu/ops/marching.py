"""Iso-surface extraction from TSDF grids (marching cubes family).

NEW capability of the rebuild (north star: "TSDF volumetric integration with
marching-cubes extraction", BASELINE.json) — the reference ships YCB
``tsdf/nontextured.ply`` meshes but contains no extraction code.

Implementation: marching *tetrahedra* — each cube splits into 6 tets, each
tet emits 0-2 triangles from a 16-case table. Chosen over classic table-MC
deliberately for a TPU-first codebase: the per-tet case logic is a tiny
static gather (derivable and verified by construction, no 256x16 magic
table), every cube emits a fixed maximum of 12 triangles (static shapes +
masks), and the whole pass is one vectorized gather/interpolate kernel.

Two-phase extraction keeps memory bounded:
  1. :func:`active_cubes` — one cheap device pass marking cubes whose
     corners straddle the iso-level;
  2. host-side compaction of active indices (usually <<1% of the grid);
  3. :func:`triangulate_cubes` — device pass over the padded active set.
:func:`marching_cubes` wires the phases together.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from reconplan_tpu.ops.tsdf import TSDFGrid

# cube corners in (dx, dy, dz) offsets, index = bit order
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int32,
)

# 6-tet decomposition of the cube around the 0-6 diagonal; all share
# corners 0 and 6 so neighboring cubes tessellate consistently.
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    dtype=np.int32,
)

# tet edges as (corner, corner) local indices
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)

# triangle table for the 16 sign cases (bit i set = corner i inside/below
# iso). Each case lists up to 2 triangles of tet-edge ids; -1 pads.
# Orientation: consistent winding so normals point toward the positive
# (outside) side; complements are mirrored.
_TET_TRIS = np.array(
    [
        [[-1, -1, -1], [-1, -1, -1]],  # 0000
        [[0, 2, 1], [-1, -1, -1]],     # 0001: corner 0 in
        [[0, 3, 4], [-1, -1, -1]],     # 0010: corner 1
        [[1, 3, 4], [1, 4, 2]],        # 0011: corners 0,1
        [[1, 5, 3], [-1, -1, -1]],     # 0100: corner 2
        [[0, 5, 3], [0, 2, 5]],        # 0101: corners 0,2
        [[0, 1, 5], [0, 5, 4]],        # 0110: corners 1,2
        [[2, 5, 4], [-1, -1, -1]],     # 0111: corners 0,1,2
        [[2, 4, 5], [-1, -1, -1]],     # 1000: corner 3
        [[0, 4, 5], [0, 5, 1]],        # 1001: corners 0,3
        [[0, 3, 5], [0, 5, 2]],        # 1010: corners 1,3
        [[1, 5, 3], [-1, -1, -1]],     # 1011: corners 0,1,3 -> complement of 0100
        [[1, 4, 3], [1, 2, 4]],        # 1100: corners 2,3
        [[0, 4, 3], [-1, -1, -1]],     # 1101: complement of 0010
        [[0, 1, 2], [-1, -1, -1]],     # 1110: complement of 0001
        [[-1, -1, -1], [-1, -1, -1]],  # 1111
    ],
    dtype=np.int32,
)

MAX_TRIS_PER_CUBE = 12  # 6 tets x 2 triangles


@jax.jit
def active_cubes(grid: TSDFGrid, weight_min: float = 1.0):
    """(D-1, H-1, W-1) bool mask of cubes straddling the zero level with
    all 8 corners observed."""
    s = grid.sdf
    w = grid.weight
    # windowed min/max over the 2x2x2 corners
    neg = s < 0
    obs = w >= weight_min

    def all8(x, op):
        x = op(x[:-1], x[1:])
        x = op(x[:, :-1], x[:, 1:])
        return op(x[:, :, :-1], x[:, :, 1:])

    any_neg = all8(neg, jnp.logical_or)
    all_neg = all8(neg, jnp.logical_and)
    all_obs = all8(obs, jnp.logical_and)
    return any_neg & (~all_neg) & all_obs


@partial(jax.jit, static_argnames=())
def triangulate_cubes(grid: TSDFGrid, cube_idx: jnp.ndarray, cube_valid: jnp.ndarray):
    """Emit triangles for the given cube linear indices (padded).

    Args:
        cube_idx: (M,) linear indices into the (D-1, H-1, W-1) cube grid.
        cube_valid: (M,) mask for padding.

    Returns:
        verts: (M, MAX_TRIS_PER_CUBE, 3, 3) world-space triangle vertices.
        tri_valid: (M, MAX_TRIS_PER_CUBE) mask.
    """
    D, H, W = grid.sdf.shape
    cd, ch, cw = D - 1, H - 1, W - 1
    zi = cube_idx // (ch * cw)
    yi = (cube_idx // cw) % ch
    xi = cube_idx % cw

    corners = jnp.asarray(_CORNERS)
    # corner grid indices (M, 8)
    cz = zi[:, None] + corners[None, :, 2]
    cy = yi[:, None] + corners[None, :, 1]
    cx = xi[:, None] + corners[None, :, 0]
    vals = grid.sdf[cz, cy, cx]  # (M, 8)
    pos = (
        grid.origin
        + jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * grid.voxel_size
    )  # (M, 8, 3)

    tets = jnp.asarray(_TETS)  # (6, 4)
    tet_edges = jnp.asarray(_TET_EDGES)  # (6, 2)
    tet_tris = jnp.asarray(_TET_TRIS)  # (16, 2, 3)

    tv = vals[:, tets]  # (M, 6 tets, 4)
    tp = pos[:, tets]  # (M, 6, 4, 3)

    inside = (tv < 0).astype(jnp.int32)
    case = (
        inside[..., 0]
        + 2 * inside[..., 1]
        + 4 * inside[..., 2]
        + 8 * inside[..., 3]
    )  # (M, 6)

    # all 6 tet-edge interpolated points per tet (static edge index arrays):
    ea, eb = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
    va = tv[:, :, ea]  # (M, 6 tets, 6 edges)
    vb = tv[:, :, eb]
    pa = tp[:, :, ea, :]  # (M, 6, 6, 3)
    pb = tp[:, :, eb, :]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    epts = pa + t[..., None] * (pb - pa)  # (M, 6, 6, 3)

    tris_edges = tet_tris[case]  # (M, 6, 2, 3) edge ids or -1
    tri_ok = tris_edges[..., 0] >= 0  # (M, 6, 2)
    safe_edges = jnp.maximum(tris_edges, 0).reshape(case.shape[0], 6, 6)
    # gather vertex positions from the 6 edge points of each tet
    tri_verts = jnp.take_along_axis(
        epts, safe_edges[..., None].astype(jnp.int32), axis=2
    )  # (M, 6, 6, 3) -> 2 tris x 3 verts flattened in axis 2
    M = cube_idx.shape[0]
    verts = tri_verts.reshape(M, MAX_TRIS_PER_CUBE, 3, 3)
    valid = (tri_ok & cube_valid[:, None, None]).reshape(M, MAX_TRIS_PER_CUBE)

    # consistent outward winding: orient each triangle so its normal points
    # along the local SDF gradient (toward positive/outside). The raw tet
    # table's winding is orientation-inconsistent across complement cases.
    gx = (
        vals[:, [1, 2, 5, 6]].mean(axis=1) - vals[:, [0, 3, 4, 7]].mean(axis=1)
    )
    gy = (
        vals[:, [2, 3, 6, 7]].mean(axis=1) - vals[:, [0, 1, 4, 5]].mean(axis=1)
    )
    gz = (
        vals[:, [4, 5, 6, 7]].mean(axis=1) - vals[:, [0, 1, 2, 3]].mean(axis=1)
    )
    grad = jnp.stack([gx, gy, gz], axis=-1)[:, None, :]  # (M, 1, 3)
    n = jnp.cross(
        verts[:, :, 1] - verts[:, :, 0], verts[:, :, 2] - verts[:, :, 0]
    )  # (M, T, 3)
    flip = jnp.sum(n * grad, axis=-1) < 0  # (M, T)
    v1 = jnp.where(flip[..., None], verts[:, :, 2], verts[:, :, 1])
    v2 = jnp.where(flip[..., None], verts[:, :, 1], verts[:, :, 2])
    verts = jnp.stack([verts[:, :, 0], v1, v2], axis=2)
    return verts, valid


def marching_cubes(grid: TSDFGrid, weight_min: float = 1.0, max_cubes: int | None = None):
    """Extract the zero iso-surface triangle mesh (host-orchestrated).

    Returns (vertices (T, 3, 3) np.ndarray of world-space triangles).
    The compaction step runs on host (dynamic shapes); both device phases
    are jitted and fixed-shape.
    """
    mask = np.asarray(active_cubes(grid, weight_min))
    idx = np.flatnonzero(mask.reshape(-1)).astype(np.int32)
    if len(idx) == 0:
        return np.zeros((0, 3, 3), dtype=np.float32)
    if max_cubes is not None and len(idx) > max_cubes:
        idx = idx[:max_cubes]
    # pad to a multiple of 4096 to bound recompilation across calls
    pad = (-len(idx)) % 4096
    valid = np.ones(len(idx) + pad, dtype=bool)
    valid[len(idx):] = False
    idx = np.pad(idx, (0, pad))
    verts, tri_valid = triangulate_cubes(
        grid, jnp.asarray(idx), jnp.asarray(valid)
    )
    verts = np.asarray(verts).reshape(-1, 3, 3)
    tri_valid = np.asarray(tri_valid).reshape(-1)
    return verts[tri_valid]
