"""Brick-sparse TSDF fusion — the Pallas fast path.

Why this kernel exists: XLA's per-element gather on TPU runs at ~0.14 G
elem/s (measured on this chip; HBM streams at 640 GB/s and the MXU at 174
TFLOPs), and dense voxel-centric TSDF integration is one depth-image gather
per voxel per frame. The dense XLA path (`ops.tsdf.integrate_frames`) is
therefore gather-bound ~1000x below the hardware. This kernel removes both
the waste and the gather:

  * **brick sparsity**: only bricks intersecting a frame's truncation shell
    update (surface-proportional work: ~5-20k bricks instead of 131k for
    a 512^3 scan of a tabletop object);
  * **resident-VMEM sampling**: each dispatch pins its whole frame batch
    (<= 8 depth frames, ~10 MB) in VMEM; the per-voxel depth lookup is a
    dynamic-slice window load plus 128-lane `tpu.dynamic_gather`s and a
    row select — VPU-vectorized, no HBM gather and no per-brick DMA (a
    DMA-per-(brick,frame) variant measured ~12 us/brick-frame of pure
    DMA latency; resident frames removed it).

Memory layout: the volume lives as BRICKED arrays ``(NB + 1, 8, 128)``
(one row per 8x8x16-voxel brick: sublane = local z, lane = local y*16 + x;
the final row is a scratch brick that absorbs padding writes). Dense
(D, H, W) views are produced on demand for marching cubes / raycasting.

Scheduling: ``PrefetchScalarGridSpec`` prefetches the active brick list;
each grid step processes one brick against all F frames, with the brick's
sdf/weight blocks resident in VMEM via input-output aliasing and dynamic
index maps (the paged-attention pattern). Padding entries all map to the
scratch brick consecutively, which Pallas treats as legal block revisits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BRICK_Z, BRICK_Y, BRICK_X = 8, 8, 16  # 8x8x16 voxels = one (8,128) tile
# Depth window per (brick, frame). Origins are aligned to the HBM tile
# grid (8 sublanes, 128 lanes) because Mosaic requires provably-tiled DMA
# slices; the extra size buys guaranteed coverage margins of +-28 rows and
# +-64 lanes around the brick-center projection (enough for an 8x8x16-voxel
# brick at >= 0.25 m range with the D435 intrinsics).
WIN_H, WIN_W = 64, 256


class BrickGrid(NamedTuple):
    """Bricked TSDF volume. Logical voxel (z, y, x) lives at brick
    (z//8, y//8, x//16), sublane z%8, lane (y%8)*16 + x%16."""

    sdf: jnp.ndarray  # (NB + 1, 8, 128) f32
    weight: jnp.ndarray  # (NB + 1, 8, 128) f32
    dims: tuple  # (D, H, W) logical voxels
    origin: jnp.ndarray  # (3,)
    voxel_size: float
    trunc: float

    @property
    def brick_dims(self):
        D, H, W = self.dims
        return (D // BRICK_Z, H // BRICK_Y, W // BRICK_X)


def make_brick_grid(dims, origin, voxel_size, trunc=None) -> BrickGrid:
    D, H, W = dims
    if D % BRICK_Z or H % BRICK_Y or W % BRICK_X:
        raise ValueError(f"dims {dims} must be multiples of (8, 8, 16)")
    nb = (D // BRICK_Z) * (H // BRICK_Y) * (W // BRICK_X)
    if trunc is None:
        trunc = 5.0 * voxel_size
    return BrickGrid(
        sdf=jnp.ones((nb + 1, BRICK_Z, BRICK_Y * BRICK_X), dtype=jnp.float32),
        weight=jnp.zeros((nb + 1, BRICK_Z, BRICK_Y * BRICK_X), dtype=jnp.float32),
        dims=tuple(dims),
        origin=jnp.asarray(origin, dtype=jnp.float32),
        voxel_size=float(voxel_size),
        trunc=float(trunc),
    )


def to_dense(grid: BrickGrid):
    """Bricked -> dense (D, H, W) sdf/weight (for extraction)."""
    D, H, W = grid.dims
    bd, bh, bw = grid.brick_dims

    def debrick(a):
        a = a[:-1].reshape(bd, bh, bw, BRICK_Z, BRICK_Y, BRICK_X)
        return a.transpose(0, 3, 1, 4, 2, 5).reshape(D, H, W)

    return debrick(grid.sdf), debrick(grid.weight)


def from_dense(sdf, weight, origin, voxel_size, trunc) -> BrickGrid:
    D, H, W = sdf.shape
    bd, bh, bw = D // BRICK_Z, H // BRICK_Y, W // BRICK_X

    def brick(a, pad_value):
        a = a.reshape(bd, BRICK_Z, bh, BRICK_Y, bw, BRICK_X)
        a = a.transpose(0, 2, 4, 1, 3, 5).reshape(-1, BRICK_Z, BRICK_Y * BRICK_X)
        pad = jnp.full((1, BRICK_Z, BRICK_Y * BRICK_X), pad_value, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    return BrickGrid(
        brick(sdf, 1.0), brick(weight, 0.0), (D, H, W),
        jnp.asarray(origin, dtype=jnp.float32), float(voxel_size), float(trunc),
    )


# ---------------------------------------------------------------------------
# active brick selection (dense, cheap — runs in XLA)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("brick_dims", "depth_scale", "depth_max"))
def active_brick_mask(
    brick_dims, origin, voxel_size, trunc,
    depths, T_w2c, fx, fy, cx, cy,
    depth_scale=1000.0, depth_max=3.0,
):
    """(NB,) bool: bricks whose center lies within trunc + brick radius of
    the observed surface in any frame (single depth sample at the center —
    conservative via the expanded band)."""
    bd, bh, bw = brick_dims
    zi = jax.lax.broadcasted_iota(jnp.float32, (bd, bh, bw), 0)
    yi = jax.lax.broadcasted_iota(jnp.float32, (bd, bh, bw), 1)
    xi = jax.lax.broadcasted_iota(jnp.float32, (bd, bh, bw), 2)
    cx_w = origin[0] + (xi * BRICK_X + BRICK_X / 2) * voxel_size
    cy_w = origin[1] + (yi * BRICK_Y + BRICK_Y / 2) * voxel_size
    cz_w = origin[2] + (zi * BRICK_Z + BRICK_Z / 2) * voxel_size
    radius = 0.5 * voxel_size * np.sqrt(BRICK_X**2 + BRICK_Y**2 + BRICK_Z**2)
    band = trunc + radius

    Hd, Wd = depths.shape[1:]
    active = jnp.zeros((bd, bh, bw), dtype=bool)
    for f in range(depths.shape[0]):
        R, t = T_w2c[f, :3, :3], T_w2c[f, :3, 3]
        x = R[0, 0] * cx_w + R[0, 1] * cy_w + R[0, 2] * cz_w + t[0]
        y = R[1, 0] * cx_w + R[1, 1] * cy_w + R[1, 2] * cz_w + t[1]
        z = R[2, 0] * cx_w + R[2, 1] * cy_w + R[2, 2] * cz_w + t[2]
        zs = jnp.maximum(z, 1e-6)
        ui = jnp.clip(jnp.round(x / zs * fx + cx).astype(jnp.int32), 0, Wd - 1)
        vi = jnp.clip(jnp.round(y / zs * fy + cy).astype(jnp.int32), 0, Hd - 1)
        inside = (z > 1e-4) & (x / zs * fx + cx >= 0) & (x / zs * fx + cx < Wd) \
            & (y / zs * fy + cy >= 0) & (y / zs * fy + cy < Hd)
        d = depths[f].reshape(-1)[(vi * Wd + ui).reshape(-1)].reshape(vi.shape)
        d = d.astype(jnp.float32) / depth_scale
        ok = inside & (d > 0) & (d < depth_max)
        active |= ok & (jnp.abs(d - z) < band)
    return active.reshape(-1)


# ---------------------------------------------------------------------------
# the pallas kernel
# ---------------------------------------------------------------------------


def _integrate_kernel(
    # scalar prefetch
    brick_ids_ref,  # (M,) int32 in SMEM
    # inputs
    meta_ref,  # (8,) f32 in SMEM: origin xyz, voxel, trunc, max_weight, id_base, n_real_local
    poses_ref,  # (F, 16) f32 in SMEM (row-major w2c 4x4)
    intr_ref,  # (4,) f32 in SMEM: fx fy cx cy
    depths_ref,  # (F, Hd, Wd) f32 resident in VMEM for the whole dispatch
    sdf_ref,  # (1, 8, 128) VMEM block (aliased output)
    w_ref,  # (1, 8, 128) VMEM block (aliased output)
    # outputs (aliased)
    sdf_out_ref,
    w_out_ref,
    *,
    F: int,
    Hd: int,
    Wd: int,
    brick_dims: tuple,
    depth_scale: float,
    depth_max: float,
):
    i = pl.program_id(0)
    bid_local = brick_ids_ref[i]
    # meta[6] = global brick-id base of this shard (0 single-chip);
    # meta[7] = local scratch threshold (= number of real local bricks)
    bid = bid_local + meta_ref[6].astype(jnp.int32)
    bd, bh, bw = brick_dims
    bz = bid // (bh * bw)
    by = (bid // bw) % bh
    bx = bid % bw

    ox = meta_ref[0]
    oy = meta_ref[1]
    oz = meta_ref[2]
    voxel = meta_ref[3]
    trunc = meta_ref[4]
    max_weight = meta_ref[5]

    # voxel world coords for this brick (vectors over the (8, 128) tile)
    lz = jax.lax.broadcasted_iota(
        jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 0
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 1)
    ly = (lane // BRICK_X).astype(jnp.float32)
    lx = (lane % BRICK_X).astype(jnp.float32)
    wx = ox + (bx.astype(jnp.float32) * BRICK_X + lx) * voxel
    wy = oy + (by.astype(jnp.float32) * BRICK_Y + ly) * voxel
    wz = oz + (bz.astype(jnp.float32) * BRICK_Z + lz) * voxel

    # brick center (scalars) for window placement
    cxw = ox + (bx.astype(jnp.float32) * BRICK_X + BRICK_X / 2) * voxel
    cyw = oy + (by.astype(jnp.float32) * BRICK_Y + BRICK_Y / 2) * voxel
    czw = oz + (bz.astype(jnp.float32) * BRICK_Z + BRICK_Z / 2) * voxel

    fx = intr_ref[0]
    fy = intr_ref[1]
    cx = intr_ref[2]
    cy = intr_ref[3]

    sdf = sdf_ref[0]
    w = w_ref[0]

    # padding entries map to the (per-shard) scratch brick; their compute
    # is skipped entirely via lax.cond (at max_active >> n_active the dummy
    # programs dominated runtime: 32768-brick dispatches ran 5.7x slower
    # than the active 5.6k bricks warranted)
    is_real = bid_local.astype(jnp.float32) < meta_ref[7]

    def _integrate_all_frames(args):
        sdf, w = args
        for f in range(F):  # static unroll over frames
            r00 = poses_ref[f, 0]; r01 = poses_ref[f, 1]; r02 = poses_ref[f, 2]; t0 = poses_ref[f, 3]
            r10 = poses_ref[f, 4]; r11 = poses_ref[f, 5]; r12 = poses_ref[f, 6]; t1 = poses_ref[f, 7]
            r20 = poses_ref[f, 8]; r21 = poses_ref[f, 9]; r22 = poses_ref[f, 10]; t2 = poses_ref[f, 11]

            # window origin from the brick-center projection (scalar math)
            ccx = r00 * cxw + r01 * cyw + r02 * czw + t0
            ccy = r10 * cxw + r11 * cyw + r12 * czw + t1
            ccz = r20 * cxw + r21 * cyw + r22 * czw + t2
            ccz = jnp.maximum(ccz, 1e-3)
            uc = ccx / ccz * fx + cx
            vc = ccy / ccz * fy + cy
            # tile-aligned window origins with guaranteed +-64 / +-28 coverage;
            # pl.multiple_of tells the Mosaic prover the DMA slice is tiled
            u0 = jnp.clip(
                ((jnp.round(uc).astype(jnp.int32) - 64) // 128) * 128, 0, Wd - WIN_W
            )
            v0 = jnp.clip(
                ((jnp.round(vc).astype(jnp.int32) - 28) // 8) * 8, 0, Hd - WIN_H
            )
            u0 = pl.multiple_of(u0, 128)
            v0 = pl.multiple_of(v0, 8)

            # voxel projections (vectors)
            x = r00 * wx + r01 * wy + r02 * wz + t0
            y = r10 * wx + r11 * wy + r12 * wz + t1
            z = r20 * wx + r21 * wy + r22 * wz + t2
            zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
            u = x / zs * fx + cx
            v = y / zs * fy + cy
            ui = jnp.round(u).astype(jnp.int32)
            vi = jnp.round(v).astype(jnp.int32)
            ul = ui - u0
            vl = vi - v0
            in_win = (ul >= 0) & (ul < WIN_W) & (vl >= 0) & (vl < WIN_H)
            in_img = (ui >= 0) & (ui < Wd) & (vi >= 0) & (vi < Hd) & (z > 1e-4)
            ok = in_win & in_img
            ul = jnp.clip(ul, 0, WIN_W - 1)

            # dynamic-slice load of the window straight out of the resident
            # VMEM frame (no DMA in the brick loop — the per-(brick, frame)
            # async-copy variant was DMA-latency bound at ~12 us/brick-frame)
            win = depths_ref[f, pl.ds(v0, WIN_H), pl.ds(u0, WIN_W)]

            # depth sample: per-row lane gathers (two 128-lane chunks) + row
            # select. tpu.dynamic_gather only spans one vreg (128 lanes) along
            # the gather dim, hence the lo/hi chunk split. (A predicated
            # row-skip variant using a VMEM accumulator measured 2.5x SLOWER
            # than this register-accumulating unrolled loop — pl.when regions
            # forced memory round-trips per row.)
            ul_lo = jnp.clip(ul, 0, 127)
            ul_hi = jnp.clip(ul - 128, 0, 127)
            use_hi = ul >= 128
            d = jnp.zeros_like(sdf)
            for r in range(WIN_H):
                row_lo = jnp.broadcast_to(win[r, :128], (BRICK_Z, BRICK_Y * BRICK_X))
                row_hi = jnp.broadcast_to(win[r, 128:], (BRICK_Z, BRICK_Y * BRICK_X))
                g = jnp.where(
                    use_hi,
                    jnp.take_along_axis(row_hi, ul_hi, axis=1),
                    jnp.take_along_axis(row_lo, ul_lo, axis=1),
                )
                d = jnp.where(vl == r, g, d)

            d = d / depth_scale
            ok = ok & (d > 0.0) & (d < depth_max) & is_real
            sdf_obs = d - z
            ok = ok & (sdf_obs > -trunc)
            tsdf_obs = jnp.clip(sdf_obs / trunc, -1.0, 1.0)
            w_obs = ok.astype(jnp.float32)
            w_new = w + w_obs
            sdf = (sdf * w + tsdf_obs * w_obs) / jnp.maximum(w_new, 1.0)
            sdf = jnp.where(w_new > 0, sdf, 1.0)
            w = jnp.minimum(w_new, max_weight)


        return sdf, w

    sdf, w = jax.lax.cond(
        is_real, _integrate_all_frames, lambda a: a, (sdf, w)
    )

    sdf_out_ref[0] = sdf
    w_out_ref[0] = w


@partial(
    jax.jit,
    static_argnames=("brick_dims", "depth_scale", "depth_max", "max_weight", "interpret"),
    donate_argnums=(0, 1),
)
def _integrate_bricks(
    sdf_b, weight_b, brick_ids, meta, poses_flat, intr, depths,
    brick_dims, depth_scale, depth_max, max_weight, interpret=False,
):
    M = brick_ids.shape[0]
    F, Hd, Wd = depths.shape
    kernel = partial(
        _integrate_kernel,
        F=F, Hd=Hd, Wd=Wd, brick_dims=brick_dims,
        depth_scale=depth_scale, depth_max=depth_max,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # poses
            pl.BlockSpec(memory_space=pltpu.SMEM),  # intr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # depths (resident)
            pl.BlockSpec(
                (1, BRICK_Z, BRICK_Y * BRICK_X),
                lambda i, ids: (ids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BRICK_Z, BRICK_Y * BRICK_X),
                lambda i, ids: (ids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, BRICK_Z, BRICK_Y * BRICK_X),
                lambda i, ids: (ids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BRICK_Z, BRICK_Y * BRICK_X),
                lambda i, ids: (ids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    out_sdf, out_w = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(sdf_b.shape, sdf_b.dtype),
            jax.ShapeDtypeStruct(weight_b.shape, weight_b.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={5: 0, 6: 1},  # sdf/weight blocks update in place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(brick_ids, meta, poses_flat, intr, depths, sdf_b, weight_b)
    # meta[5] is max_weight; clamp handled in kernel
    return out_sdf, out_w


@partial(
    jax.jit,
    static_argnames=(
        "brick_dims", "max_active", "voxel_size", "trunc", "depth_scale",
        "depth_max", "max_weight", "dilate_active", "frames_per_dispatch",
    ),
    donate_argnums=(0, 1),
)
def _integrate_device_all(
    sdf_b, weight_b, poses, intr, depths, origin,
    brick_dims, max_active, voxel_size, trunc,
    depth_scale, depth_max, max_weight, dilate_active, frames_per_dispatch,
):
    """Fully-on-device integration of the whole frame batch: per chunk of
    <= frames_per_dispatch frames: active mask -> nonzero compaction ->
    kernel. ONE jit dispatch total — zero host synchronization and zero
    eager ops (each eager dispatch over the tunneled runtime costs ~10-30
    ms; the host-compacted path was spending ~0.2 s/call on that)."""
    T_w2c_all = jnp.linalg.inv(poses)
    bd, bh, bw = brick_dims
    meta = jnp.concatenate(
        [
            origin.astype(jnp.float32),
            jnp.asarray(
                [voxel_size, trunc, max_weight, 0.0, float(bd * bh * bw)],
                dtype=jnp.float32,
            ),
        ]
    )
    nb_scratch = sdf_b.shape[0] - 1
    n_active = jnp.array(0, dtype=jnp.int32)
    F_all = depths.shape[0]
    for f0 in range(0, F_all, frames_per_dispatch):
        d_chunk = depths[f0 : f0 + frames_per_dispatch]
        T_chunk = T_w2c_all[f0 : f0 + frames_per_dispatch]
        mask = active_brick_mask(
            brick_dims, origin, voxel_size, trunc,
            d_chunk, T_chunk, intr[0], intr[1], intr[2], intr[3],
            depth_scale, depth_max,
        )
        if dilate_active:
            m = mask.reshape(bd, bh, bw)
            for ax in range(3):
                m = m | jnp.roll(m, 1, ax) | jnp.roll(m, -1, ax)
            mask = m.reshape(-1)
        (ids,) = jnp.nonzero(mask, size=max_active, fill_value=nb_scratch)
        n_active = n_active + jnp.sum(mask).astype(jnp.int32)
        sdf_b, weight_b = _integrate_bricks(
            sdf_b, weight_b, ids.astype(jnp.int32), meta,
            T_chunk.reshape(-1, 16), intr, d_chunk,
            brick_dims, depth_scale, depth_max, max_weight,
        )
    return sdf_b, weight_b, n_active


def integrate_frames_bricked_device(
    grid: BrickGrid,
    depths,
    poses_cam_to_world,
    fx, fy, cx, cy,
    depth_scale=1000.0,
    depth_max=3.0,
    max_weight=64.0,
    max_active=8192,
    frames_per_dispatch=8,
    dilate_active=True,
):
    """Zero-host-sync brick integration (the production/bench path).

    ``max_active`` is a static cap on bricks updated per dispatch; overflow
    drops the highest-index bricks (check the returned ``n_active`` device
    scalar against it when in doubt). Returns (grid, n_active_array).
    """
    depths = jnp.asarray(depths, dtype=jnp.float32)
    poses = jnp.asarray(poses_cam_to_world, dtype=jnp.float32)
    intr = jnp.asarray([fx, fy, cx, cy], dtype=jnp.float32)
    sdf_b, w_b, n_active = _integrate_device_all(
        grid.sdf, grid.weight, poses, intr, depths, grid.origin,
        grid.brick_dims, max_active, grid.voxel_size, grid.trunc,
        depth_scale, depth_max, max_weight, dilate_active,
        frames_per_dispatch,
    )
    return grid._replace(sdf=sdf_b, weight=w_b), n_active


def integrate_frames_bricked(
    grid: BrickGrid,
    depths,  # (F, H, W) raw depth
    poses_cam_to_world,  # (F, 4, 4)
    fx, fy, cx, cy,
    depth_scale=1000.0,
    depth_max=3.0,
    max_weight=64.0,
    pad_multiple=512,
    frames_per_dispatch=8,
    dilate_active=True,
    interpret=False,
):
    """Integrate F frames into the brick grid (host-orchestrated).

    Per dispatch of <= ``frames_per_dispatch`` frames (VMEM residency cap):
      1. dense active-brick test (XLA), optionally dilated one brick in
         each axis direction (the center-sample test is conservative but
         can clip the band at silhouettes);
      2. host compaction of active brick ids (padded to ``pad_multiple``;
         padding maps to the scratch brick);
      3. one pallas dispatch over the active bricks.

    Returns (grid, n_active_total).
    """
    if depths.shape[1] < WIN_H or depths.shape[2] < WIN_W:
        raise ValueError(
            f"depth frames {depths.shape[1:]} smaller than the kernel window "
            f"({WIN_H}, {WIN_W})"
        )
    depths = jnp.asarray(depths, dtype=jnp.float32)
    poses = jnp.asarray(poses_cam_to_world, dtype=jnp.float32)
    T_w2c_all = jnp.linalg.inv(poses)
    intr = jnp.asarray([fx, fy, cx, cy], dtype=jnp.float32)
    bd, bh, bw = grid.brick_dims
    meta = jnp.asarray(
        [
            float(grid.origin[0]), float(grid.origin[1]), float(grid.origin[2]),
            grid.voxel_size, grid.trunc, max_weight, 0.0, float(bd * bh * bw),
        ],
        dtype=jnp.float32,
    )
    nb_scratch = grid.sdf.shape[0] - 1  # scratch brick index

    n_active_total = 0
    F_all = depths.shape[0]
    for f0 in range(0, F_all, frames_per_dispatch):
        d_chunk = depths[f0 : f0 + frames_per_dispatch]
        T_chunk = T_w2c_all[f0 : f0 + frames_per_dispatch]
        mask = active_brick_mask(
            grid.brick_dims, grid.origin, grid.voxel_size, grid.trunc,
            d_chunk, T_chunk, fx, fy, cx, cy, depth_scale, depth_max,
        )
        m = np.asarray(mask).reshape(bd, bh, bw)
        if dilate_active:
            dm = m.copy()
            dm[1:] |= m[:-1]; dm[:-1] |= m[1:]
            dm[:, 1:] |= m[:, :-1]; dm[:, :-1] |= m[:, 1:]
            dm[:, :, 1:] |= m[:, :, :-1]; dm[:, :, :-1] |= m[:, :, 1:]
            m = dm
        ids = np.flatnonzero(m.reshape(-1)).astype(np.int32)
        n_active = len(ids)
        n_active_total += n_active
        if n_active == 0:
            continue
        pad = (-n_active) % pad_multiple
        ids = np.concatenate([ids, np.full(pad, nb_scratch, np.int32)])
        sdf_b, w_b = _integrate_bricks(
            grid.sdf, grid.weight, jnp.asarray(ids), meta,
            T_chunk.reshape(-1, 16), intr, d_chunk,
            grid.brick_dims, depth_scale, depth_max, max_weight,
            interpret=interpret,
        )
        grid = grid._replace(sdf=sdf_b, weight=w_b)
    return grid, n_active_total
