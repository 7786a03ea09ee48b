"""Iso-surface extraction from TSDF grids (marching cubes family).

NEW capability of the rebuild (north star: "TSDF volumetric integration with
marching-cubes extraction", BASELINE.json) — the reference ships YCB
``tsdf/nontextured.ply`` meshes but contains no extraction code.

Two variants share the same two-phase driver:

  * ``variant="table"`` (default) — classic 256-case table marching cubes:
    one case-table gather per cube, up to :data:`MAX_TRIS_TABLE` triangles
    emitted through masks. The 256-entry triangle table is GENERATED at
    import (:func:`_build_mc_tables`), not transcribed: per sign case, each
    cube face is linked by marching squares (each maximal run of
    consecutive inside corners links its entering crossing edge to its
    leaving one — a sign-only rule, so the shared face of two neighboring
    cubes always links identically), the per-face segments chain into
    closed polygons, and polygons fan-triangulate. Every crossing edge
    receives exactly two links, which makes the generated table WATERTIGHT
    by construction — including the diagonal-ambiguous faces that produce
    holes under the classic fixed Lorensen/Bourke table.
  * ``variant="tetra"`` — marching tetrahedra (6 tets/cube, 16-case table):
    derivably correct, kept as the cross-check twin; emits ~2x the
    triangles of the table variant.

Two-phase extraction keeps memory bounded:
  1. :func:`active_cubes` — one cheap device pass marking cubes whose
     corners straddle the iso-level;
  2. host-side compaction of active indices (usually <<1% of the grid);
  3. :func:`triangulate_cubes_table` / :func:`triangulate_cubes` — device
     pass over the padded active set.
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


# ---------------------------------------------------------------------------
# classic 256-case tables, generated (see module docstring)
# ---------------------------------------------------------------------------

# cube edges as (corner, corner); standard MC numbering
_CUBE_EDGES = np.array(
    [
        [0, 1], [1, 2], [2, 3], [3, 0],  # bottom ring (z=0)
        [4, 5], [5, 6], [6, 7], [7, 4],  # top ring (z=1)
        [0, 4], [1, 5], [2, 6], [3, 7],  # verticals
    ],
    dtype=np.int32,
)

# faces as cyclic corner quads; consecutive pairs are cube edges
_FACES = np.array(
    [
        [0, 1, 2, 3],  # z = 0
        [4, 5, 6, 7],  # z = 1
        [0, 1, 5, 4],  # y = 0
        [1, 2, 6, 5],  # x = 1
        [2, 3, 7, 6],  # y = 1
        [3, 0, 4, 7],  # x = 0
    ],
    dtype=np.int32,
)


def _edge_id(a, b):
    for e, (x, y) in enumerate(_CUBE_EDGES):
        if (a, b) == (x, y) or (a, b) == (y, x):
            return e
    raise ValueError((a, b))


def _build_mc_tables():
    """Generate (tri_table (256, MAX_TRIS_TABLE, 3), n_tris (256,)).

    Per case: marching-squares linking on each face (sign-only ambiguity
    rule: each maximal cyclic run of INSIDE corners links the crossing
    edge entering the run to the one leaving it), chain the per-face
    segments into closed polygons, fan-triangulate. Winding is normalized
    at runtime against the SDF gradient, as in the tetra variant."""
    face_edges = [
        [_edge_id(int(f[i]), int(f[(i + 1) % 4])) for i in range(4)]
        for f in _FACES
    ]
    all_tris = []
    for case in range(256):
        inside = [(case >> c) & 1 for c in range(8)]
        # per-face segments between crossing cube edges
        links = {}  # edge id -> list of linked edge ids

        def add_link(e1, e2):
            links.setdefault(e1, []).append(e2)
            links.setdefault(e2, []).append(e1)

        for f, fe in zip(_FACES, face_edges):
            s = [inside[c] for c in f]
            if sum(s) in (0, 4):
                continue
            # maximal cyclic runs of inside corners
            for i in range(4):
                if s[i] and not s[i - 1]:  # run starts at i
                    j = i
                    while s[(j + 1) % 4]:
                        j = (j + 1) % 4
                    # entering crossing: edge between corner i-1 and i is
                    # fe[(i-1) % 4]; leaving: between j and j+1 is fe[j]
                    add_link(fe[(i - 1) % 4], fe[j % 4])
        # chain into cycles
        tris = []
        visited = set()
        for start in sorted(links):
            if start in visited:
                continue
            cycle = [start]
            visited.add(start)
            prev, cur = None, start
            while True:
                nxt = [e for e in links[cur] if e != prev]
                # each crossing edge has exactly 2 links; pick the one
                # not just walked
                nxt = nxt[0] if nxt else links[cur][0]
                if nxt == start:
                    break
                cycle.append(nxt)
                visited.add(nxt)
                prev, cur = cur, nxt
            for i in range(1, len(cycle) - 1):
                tris.append((cycle[0], cycle[i], cycle[i + 1]))
        all_tris.append(tris)

    max_t = max(len(t) for t in all_tris)
    table = -np.ones((256, max_t, 3), dtype=np.int32)
    for c, tris in enumerate(all_tris):
        for i, t in enumerate(tris):
            table[c, i] = t
    return table, np.array([len(t) for t in all_tris], dtype=np.int32)


_MC_TRI_TABLE, _MC_NTRIS = _build_mc_tables()
MAX_TRIS_TABLE = _MC_TRI_TABLE.shape[1]


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


@jax.jit
def triangulate_cubes_table(grid: TSDFGrid, cube_idx: jnp.ndarray,
                            cube_valid: jnp.ndarray):
    """Classic table-MC triangle emission for the given cubes (padded).

    One 256-case table gather per cube; vertices interpolated on the 12
    cube edges; winding normalized against the SDF gradient.

    Returns:
        verts: (M, MAX_TRIS_TABLE, 3, 3) world-space triangle vertices.
        tri_valid: (M, MAX_TRIS_TABLE) mask.
    """
    D, H, W = grid.sdf.shape
    cd, ch, cw = D - 1, H - 1, W - 1
    zi = cube_idx // (ch * cw)
    yi = (cube_idx // cw) % ch
    xi = cube_idx % cw

    corners = jnp.asarray(_CORNERS)
    cz = zi[:, None] + corners[None, :, 2]
    cy = yi[:, None] + corners[None, :, 1]
    cx = xi[:, None] + corners[None, :, 0]
    vals = grid.sdf[cz, cy, cx]  # (M, 8)
    pos = (
        grid.origin
        + jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * grid.voxel_size
    )  # (M, 8, 3)

    inside = (vals < 0).astype(jnp.int32)
    case = jnp.sum(inside << jnp.arange(8), axis=-1)  # (M,)

    # interpolated crossing point on each of the 12 cube edges.
    # Canonicalize the interpolation direction by GLOBAL corner index: the
    # same geometric edge appears with opposite local orientation in the
    # two cubes sharing it (e.g. e1=(1,2) vs e3=(3,0)), and t vs 1-t round
    # differently in f32 — canonical ordering makes shared vertices
    # bitwise identical, so the emitted mesh dedups watertight at any
    # tolerance.
    gid = (cz * H + cy) * W + cx  # (M, 8) global corner ids
    ea = jnp.asarray(_CUBE_EDGES[:, 0])
    eb = jnp.asarray(_CUBE_EDGES[:, 1])
    swap = gid[:, ea] > gid[:, eb]  # (M, 12)
    va = jnp.where(swap, vals[:, eb], vals[:, ea])  # (M, 12)
    vb = jnp.where(swap, vals[:, ea], vals[:, eb])
    pa = jnp.where(swap[..., None], pos[:, eb], pos[:, ea])  # (M, 12, 3)
    pb = jnp.where(swap[..., None], pos[:, ea], pos[:, eb])
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    epts = pa + t[..., None] * (pb - pa)  # (M, 12, 3)

    tri_edges = jnp.asarray(_MC_TRI_TABLE)[case]  # (M, Tmax, 3)
    tri_ok = tri_edges[..., 0] >= 0
    safe = jnp.maximum(tri_edges, 0)  # (M, Tmax, 3)
    M = cube_idx.shape[0]
    verts = jnp.take_along_axis(
        epts, safe.reshape(M, -1)[..., None], axis=1
    ).reshape(M, MAX_TRIS_TABLE, 3, 3)
    valid = tri_ok & cube_valid[:, None]

    # winding: normal along the SDF gradient (outside = positive sdf)
    gx = vals[:, [1, 2, 5, 6]].mean(axis=1) - vals[:, [0, 3, 4, 7]].mean(axis=1)
    gy = vals[:, [2, 3, 6, 7]].mean(axis=1) - vals[:, [0, 1, 4, 5]].mean(axis=1)
    gz = vals[:, [4, 5, 6, 7]].mean(axis=1) - vals[:, [0, 1, 2, 3]].mean(axis=1)
    grad = jnp.stack([gx, gy, gz], axis=-1)[:, None, :]
    n = jnp.cross(
        verts[:, :, 1] - verts[:, :, 0], verts[:, :, 2] - verts[:, :, 0]
    )
    flip = jnp.sum(n * grad, axis=-1) < 0
    v1 = jnp.where(flip[..., None], verts[:, :, 2], verts[:, :, 1])
    v2 = jnp.where(flip[..., None], verts[:, :, 1], verts[:, :, 2])
    verts = jnp.stack([verts[:, :, 0], v1, v2], axis=2)
    return verts, valid


def marching_cubes(grid: TSDFGrid, weight_min: float = 1.0,
                   max_cubes: int | None = None, variant: str = "table"):
    """Extract the zero iso-surface triangle mesh (host-orchestrated).

    Returns (vertices (T, 3, 3) np.ndarray of world-space triangles).
    The compaction step runs on host (dynamic shapes); both device phases
    are jitted and fixed-shape. ``variant``: "table" (classic 256-case,
    ~2x fewer triangles) or "tetra" (marching tetrahedra cross-check).
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
    fn = triangulate_cubes_table if variant == "table" else triangulate_cubes
    verts, tri_valid = fn(grid, jnp.asarray(idx), jnp.asarray(valid))
    verts = np.asarray(verts).reshape(-1, 3, 3)
    tri_valid = np.asarray(tri_valid).reshape(-1)
    return verts[tri_valid]
