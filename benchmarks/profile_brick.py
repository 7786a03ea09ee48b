"""On-chip decomposition of the brick-TSDF bench time (ROADMAP round-5:
"the next lever needs a fresh on-chip profile").

Round-5 finding to explain: exact-footprint sampling cut the row-loop
iteration count ~41% but moved the headline only +0.3%, so the sampling
loop's ITERATION count is not the binding cost at 512^3. Suspects named
in ROADMAP: the window load + lane/sublane rolls themselves, the
per-(brick, frame) scalar prologue (8 corner projections on the SPU),
the brick HBM<->VMEM read-modify-write, or the XLA mask/compaction
stages outside the kernel.

Two measurements on the bench scene (bench.py make_frames, 512^3, 32
frames = 4 chunks of 8):

  1. STAGE SPLIT — time (a) the full `_integrate_device_all`, (b) the
     mask pipeline alone (occupancy -> pallas bits -> exact refine ->
     argsort compaction, no kernel), (c) the dyn kernel alone on
     precomputed ids/fbits. (b) + (c) ~= (a) validates the split.

  2. KERNEL ABLATION — a probe-local copy of `_integrate_kernel_dyn`
     (depth-only) with pieces removed, timed on the same precomputed
     ids/fbits:
       full        — parity with production (sanity: fps matches (c))
       no_rowloop  — window load + rolls kept, row-select loop replaced
                     by one row broadcast (isolates the gather loop)
       no_window   — d = z everywhere (drops load+rolls+loop; what's
                     left is prologue + TSDF math + DMA)
       no_rolls    — window load + row loop kept, BOTH alignment rolls
                     dropped (timing-only, wrong results): isolates the
                     pltpu.roll cost from the dynamic-slice load
       no_roll_u / no_roll_v — drop only the lane / only the sublane
                     roll (which axis is the expensive one?)
       no_prologue — footprint bbox from the (8,128) voxel projections
                     via vector reductions instead of 8 scalar corner
                     projections (the round-4 shape; isolates SPU
                     prologue vs VPU reductions)
       no_fbits    — per-frame skip disabled, every frame sampled
                     (measures what the per-frame bits save)
       dma_only    — frame loop skipped entirely: pure brick
                     HBM<->VMEM double-buffer cost

Usage (holds the TPU lock):  python benchmarks/profile_brick.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_frames
from reconplan_tpu.ops import tsdf_brick as tb
from reconplan_tpu.ops.tsdf_brick import (
    BRICK_X, BRICK_Y, BRICK_Z, SAMPLE_BRANCHES, WIN_W, _branch_sample,
)

N = 512
F_ALL = 32
CHUNK = 8
MAX_ACTIVE = 8192


# ---------------------------------------------------------------------------
# ablation kernel (probe-local copy of _integrate_kernel_dyn, depth-only)
# ---------------------------------------------------------------------------
def _ablate_kernel(
    brick_ids_ref, meta_ref, poses_ref, intr_ref, fbits_ref, depths_ref,
    _sdf_hbm, _w_hbm, sdf_out_ref, w_out_ref,
    sdf_bufs, w_bufs, in_s_sem, in_w_sem, out_s_sem, out_w_sem,
    *, F, Hd, Wd, brick_dims, depth_scale, depth_max, mode,
):
    NSLOT = 4
    n = meta_ref[7].astype(jnp.int32)
    bd, bh, bw = brick_dims
    ox, oy, oz = meta_ref[0], meta_ref[1], meta_ref[2]
    voxel = meta_ref[3]
    trunc = meta_ref[4]
    max_weight = meta_ref[5]
    fx, fy, cx, cy = intr_ref[0], intr_ref[1], intr_ref[2], intr_ref[3]

    lz = jax.lax.broadcasted_iota(
        jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 0
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 1)
    ly = (lane // BRICK_X).astype(jnp.float32)
    lx = (lane % BRICK_X).astype(jnp.float32)

    planes = [(sdf_bufs, sdf_out_ref, in_s_sem, out_s_sem),
              (w_bufs, w_out_ref, in_w_sem, out_w_sem)]

    def cp_in(k):
        s = jax.lax.rem(k, NSLOT)
        return [
            pltpu.make_async_copy(out.at[brick_ids_ref[k]], buf.at[s], sem.at[s])
            for buf, out, sem, _ in planes
        ]

    def cp_out(k):
        s = jax.lax.rem(k, NSLOT)
        return [
            pltpu.make_async_copy(buf.at[s], out.at[brick_ids_ref[k]], sem.at[s])
            for buf, out, _, sem in planes
        ]

    @pl.when(n > 0)
    def _():
        for c in cp_in(0):
            c.start()

    @pl.when(n > 1)
    def _():
        for c in cp_in(1):
            c.start()

    def body(k, carry):
        s = jax.lax.rem(k, NSLOT)

        @pl.when(k + 2 < n)
        def _():
            @pl.when(k - 2 >= 0)
            def _():
                for c in cp_out(k - 2):
                    c.wait()

            for c in cp_in(k + 2):
                c.start()

        for c in cp_in(k):
            c.wait()

        bid = brick_ids_ref[k] + meta_ref[6].astype(jnp.int32)
        fb = fbits_ref[k]
        bz = bid // (bh * bw)
        by = (bid // bw) % bh
        bx = bid % bw
        wx = ox + (bx.astype(jnp.float32) * BRICK_X + lx) * voxel
        wy = oy + (by.astype(jnp.float32) * BRICK_Y + ly) * voxel
        wz = oz + (bz.astype(jnp.float32) * BRICK_Z + lz) * voxel

        state = (sdf_bufs[s], w_bufs[s])
        if mode != "dma_only":
            for f in range(F):
                r00 = poses_ref[f, 0]; r01 = poses_ref[f, 1]; r02 = poses_ref[f, 2]; t0 = poses_ref[f, 3]
                r10 = poses_ref[f, 4]; r11 = poses_ref[f, 5]; r12 = poses_ref[f, 6]; t1 = poses_ref[f, 7]
                r20 = poses_ref[f, 8]; r21 = poses_ref[f, 9]; r22 = poses_ref[f, 10]; t2 = poses_ref[f, 11]
                hit = ((fb >> f) & 1) > 0
                if mode == "no_fbits":
                    hit = jnp.bool_(True)

                def _frame(args):
                    sdf, w = args
                    x = r00 * wx + r01 * wy + r02 * wz + t0
                    y = r10 * wx + r11 * wy + r12 * wz + t1
                    z = r20 * wx + r21 * wy + r22 * wz + t2
                    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
                    u = x / zs * fx + cx
                    v = y / zs * fy + cy
                    ui = jnp.round(u).astype(jnp.int32)
                    vi = jnp.round(v).astype(jnp.int32)
                    in_img = (ui >= 0) & (ui < Wd) & (vi >= 0) & (vi < Hd) & (z > 1e-4)

                    if mode == "no_prologue":
                        BIG = jnp.int32(1 << 20)
                        umin = jnp.min(jnp.where(in_img, ui, BIG))
                        vmin = jnp.min(jnp.where(in_img, vi, BIG))
                        vmax = jnp.max(jnp.where(in_img, vi, -BIG))
                        umin = jnp.clip(umin, 0, Wd - 1)
                        vmin = jnp.clip(vmin, 0, Hd - 1)
                        vmax = jnp.clip(vmax, 0, Hd - 1)
                    else:
                        c_us, c_vs = [], []
                        for dx_ in (0.0, float(BRICK_X - 1)):
                            for dy_ in (0.0, float(BRICK_Y - 1)):
                                for dz_ in (0.0, float(BRICK_Z - 1)):
                                    px = ox + (bx.astype(jnp.float32) * BRICK_X + dx_) * voxel
                                    py = oy + (by.astype(jnp.float32) * BRICK_Y + dy_) * voxel
                                    pz = oz + (bz.astype(jnp.float32) * BRICK_Z + dz_) * voxel
                                    xc = r00 * px + r01 * py + r02 * pz + t0
                                    yc = r10 * px + r11 * py + r12 * pz + t1
                                    zc = jnp.maximum(
                                        r20 * px + r21 * py + r22 * pz + t2, 1e-3
                                    )
                                    c_us.append(xc / zc * fx + cx)
                                    c_vs.append(yc / zc * fy + cy)

                        def _mins(vals):
                            m = vals[0]
                            for v_ in vals[1:]:
                                m = jnp.minimum(m, v_)
                            return m

                        def _maxs(vals):
                            m = vals[0]
                            for v_ in vals[1:]:
                                m = jnp.maximum(m, v_)
                            return m

                        umin = jnp.clip(
                            jnp.floor(_mins(c_us)).astype(jnp.int32) - 1, 0, Wd - 1
                        )
                        vmin = jnp.clip(
                            jnp.floor(_mins(c_vs)).astype(jnp.int32) - 1, 0, Hd - 1
                        )
                        vmax = jnp.clip(
                            jnp.ceil(_maxs(c_vs)).astype(jnp.int32) + 1, 0, Hd - 1
                        )

                    u0 = jnp.clip((umin // 128) * 128, 0, Wd - WIN_W)
                    u0 = pl.multiple_of(u0, 128)
                    shift = jnp.clip(umin - u0, 0, 128)
                    ul = ui - (u0 + shift)
                    vext = vmax - vmin + 1
                    fits = [vext <= L for _, L in SAMPLE_BRANCHES[:-1]]
                    loop_eff = jnp.int32(SAMPLE_BRANCHES[-1][1])
                    for (_, L), ft in zip(SAMPLE_BRANCHES[-2::-1], fits[::-1]):
                        loop_eff = jnp.where(ft, jnp.int32(L), loop_eff)
                    vl = vi - vmin
                    in_win = (ul >= 0) & (ul < 128) & (vl >= 0) & (vl < loop_eff)
                    ulc = jnp.clip(ul, 0, 127)

                    if mode == "no_window":
                        d = z * depth_scale
                        ok = in_img
                    else:
                        def _sample(Hwin, LOOP):
                            v0 = jnp.clip((vmin // 8) * 8, 0, Hd - Hwin)
                            v0 = pl.multiple_of(v0, 8)
                            s0 = jnp.clip(vmin - v0, 0, Hwin - 1)
                            roll_u = jnp.where(shift == 0, 0, WIN_W - shift)
                            roll_v = jnp.where(s0 == 0, 0, Hwin - s0)
                            win = depths_ref[f, pl.ds(v0, Hwin), pl.ds(u0, WIN_W)]
                            if mode == "no_rolls":
                                wl = win[:, :128]
                            elif mode == "no_roll_u":
                                wl = pltpu.roll(win[:, :128], roll_v, axis=0)
                            elif mode == "no_roll_v":
                                wl = pltpu.roll(win, roll_u, axis=1)[:, :128]
                            else:
                                wl = pltpu.roll(win, roll_u, axis=1)[:, :128]
                                wl = pltpu.roll(wl, roll_v, axis=0)
                            d = jnp.zeros_like(sdf)
                            if mode == "no_rowloop":
                                row = jnp.broadcast_to(
                                    wl[0], (BRICK_Z, BRICK_Y * BRICK_X)
                                )
                                return jnp.take_along_axis(row, ulc, axis=1)
                            for r in range(LOOP):
                                row = jnp.broadcast_to(
                                    wl[r], (BRICK_Z, BRICK_Y * BRICK_X)
                                )
                                d = jnp.where(
                                    vl == r,
                                    jnp.take_along_axis(row, ulc, axis=1), d,
                                )
                            return d

                        d = _branch_sample(
                            lambda hw, lp: _sample(hw, lp), fits
                        )
                        ok = in_win & in_img

                    d = d / depth_scale
                    ok = ok & (d > 0.0) & (d < depth_max)
                    sdf_obs = d - z
                    ok = ok & (sdf_obs > -trunc)
                    tsdf_obs = jnp.clip(sdf_obs / trunc, -1.0, 1.0)
                    w_obs = ok.astype(jnp.float32)
                    w_new = w + w_obs
                    inv = 1.0 / jnp.maximum(w_new, 1.0)
                    sdf_n = (sdf * w + tsdf_obs * w_obs) * inv
                    sdf_n = jnp.where(w_new > 0, sdf_n, 1.0)
                    return sdf_n, jnp.minimum(w_new, max_weight)

                state = jax.lax.cond(hit, _frame, lambda a: a, state)

        sdf_bufs[s] = state[0]
        w_bufs[s] = state[1]
        for c in cp_out(k):
            c.start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)
    for i in range(4):
        @pl.when((n - 4 + i >= 0) & (n - 4 + i < n))
        def _():
            for c in cp_out(n - 4 + i):
                c.wait()


# ---------------------------------------------------------------------------
# ablation kernel 2: probe-local copy of the PRODUCTION fit/straddle
# sampling (round-5 kernel), with the dynamic-control-flow pieces
# individually removable. The old-design ablations above can't attribute
# the new kernel's cost (they still carry the 256-lane load + lane roll).
#   full2       — parity with production (sanity: ms matches production)
#   noladder2   — SAMPLE_BRANCHES ladder removed: one unconditional
#                 (WIN_H, 57) branch; straddle cond kept (isolates the
#                 nested lax.cond ladder cost)
#   nostraddle2 — ladder kept; always ONE 128-lane window (timing-only:
#                 straddling footprints sample wrong lanes)
#   noroll2     — dynamic sublane roll dropped; row loop walks s0+vext
#                 rows (ladder keyed on s0+vext instead of vext) — exact
#                 away from the image bottom edge
#   flat2       — noladder + nostraddle + noroll (minimal dynamic
#                 control flow; timing-only)
#   dmahbm2     — window loads via async DMA from an HBM-resident depth
#                 stack into a VMEM scratch (copy+wait per (brick,frame)
#                 hit, latency exposed; measures DMA-engine windows as an
#                 alternative to the dynamic VMEM slice)
# ---------------------------------------------------------------------------
def _ablate_kernel2(
    brick_ids_ref, meta_ref, poses_ref, intr_ref, fbits_ref, depths_ref,
    _sdf_hbm, _w_hbm, sdf_out_ref, w_out_ref,
    sdf_bufs, w_bufs, win_buf, in_s_sem, in_w_sem, out_s_sem, out_w_sem,
    win_sem,
    *, F, Hd, Wd, brick_dims, depth_scale, depth_max, mode,
):
    NSLOT = 4
    n = meta_ref[7].astype(jnp.int32)
    bd, bh, bw = brick_dims
    ox, oy, oz = meta_ref[0], meta_ref[1], meta_ref[2]
    voxel = meta_ref[3]
    trunc = meta_ref[4]
    max_weight = meta_ref[5]
    fx, fy, cx, cy = intr_ref[0], intr_ref[1], intr_ref[2], intr_ref[3]

    lz = jax.lax.broadcasted_iota(
        jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 0
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BRICK_Z, BRICK_Y * BRICK_X), 1)
    ly = (lane // BRICK_X).astype(jnp.float32)
    lx = (lane % BRICK_X).astype(jnp.float32)

    planes = [(sdf_bufs, sdf_out_ref, in_s_sem, out_s_sem),
              (w_bufs, w_out_ref, in_w_sem, out_w_sem)]

    def cp_in(k):
        s = jax.lax.rem(k, NSLOT)
        return [
            pltpu.make_async_copy(out.at[brick_ids_ref[k]], buf.at[s], sem.at[s])
            for buf, out, sem, _ in planes
        ]

    def cp_out(k):
        s = jax.lax.rem(k, NSLOT)
        return [
            pltpu.make_async_copy(buf.at[s], out.at[brick_ids_ref[k]], sem.at[s])
            for buf, out, _, sem in planes
        ]

    @pl.when(n > 0)
    def _():
        for c in cp_in(0):
            c.start()

    @pl.when(n > 1)
    def _():
        for c in cp_in(1):
            c.start()

    def body(k, carry):
        s = jax.lax.rem(k, NSLOT)

        @pl.when(k + 2 < n)
        def _():
            @pl.when(k - 2 >= 0)
            def _():
                for c in cp_out(k - 2):
                    c.wait()

            for c in cp_in(k + 2):
                c.start()

        for c in cp_in(k):
            c.wait()

        bid = brick_ids_ref[k] + meta_ref[6].astype(jnp.int32)
        fb = fbits_ref[k]
        bz = bid // (bh * bw)
        by = (bid // bw) % bh
        bx = bid % bw
        wx = ox + (bx.astype(jnp.float32) * BRICK_X + lx) * voxel
        wy = oy + (by.astype(jnp.float32) * BRICK_Y + ly) * voxel
        wz = oz + (bz.astype(jnp.float32) * BRICK_Z + lz) * voxel

        state = (sdf_bufs[s], w_bufs[s])
        for f in range(F):
            r00 = poses_ref[f, 0]; r01 = poses_ref[f, 1]; r02 = poses_ref[f, 2]; t0 = poses_ref[f, 3]
            r10 = poses_ref[f, 4]; r11 = poses_ref[f, 5]; r12 = poses_ref[f, 6]; t1 = poses_ref[f, 7]
            r20 = poses_ref[f, 8]; r21 = poses_ref[f, 9]; r22 = poses_ref[f, 10]; t2 = poses_ref[f, 11]
            hit = ((fb >> f) & 1) > 0

            def _frame(args):
                sdf, w = args
                x = r00 * wx + r01 * wy + r02 * wz + t0
                y = r10 * wx + r11 * wy + r12 * wz + t1
                z = r20 * wx + r21 * wy + r22 * wz + t2
                zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
                u = x / zs * fx + cx
                v = y / zs * fy + cy
                ui = jnp.round(u).astype(jnp.int32)
                vi = jnp.round(v).astype(jnp.int32)
                in_img = (ui >= 0) & (ui < Wd) & (vi >= 0) & (vi < Hd) & (z > 1e-4)

                c_us, c_vs = [], []
                for dx_ in (0.0, float(BRICK_X - 1)):
                    for dy_ in (0.0, float(BRICK_Y - 1)):
                        for dz_ in (0.0, float(BRICK_Z - 1)):
                            px = ox + (bx.astype(jnp.float32) * BRICK_X + dx_) * voxel
                            py = oy + (by.astype(jnp.float32) * BRICK_Y + dy_) * voxel
                            pz = oz + (bz.astype(jnp.float32) * BRICK_Z + dz_) * voxel
                            xc = r00 * px + r01 * py + r02 * pz + t0
                            yc = r10 * px + r11 * py + r12 * pz + t1
                            zc = jnp.maximum(r20 * px + r21 * py + r22 * pz + t2, 1e-3)
                            c_us.append(xc / zc * fx + cx)
                            c_vs.append(yc / zc * fy + cy)

                def _mins(vals):
                    m = vals[0]
                    for v_ in vals[1:]:
                        m = jnp.minimum(m, v_)
                    return m

                def _maxs(vals):
                    m = vals[0]
                    for v_ in vals[1:]:
                        m = jnp.maximum(m, v_)
                    return m

                umin = jnp.clip(jnp.floor(_mins(c_us)).astype(jnp.int32) - 1, 0, Wd - 1)
                umax = jnp.clip(jnp.ceil(_maxs(c_us)).astype(jnp.int32) + 1, 0, Wd - 1)
                vmin = jnp.clip(jnp.floor(_mins(c_vs)).astype(jnp.int32) - 1, 0, Hd - 1)
                vmax = jnp.clip(jnp.ceil(_maxs(c_vs)).astype(jnp.int32) + 1, 0, Hd - 1)

                u0 = jnp.clip((umin // 128) * 128, 0, Wd - 128)
                u0 = pl.multiple_of(u0, 128)
                u1 = jnp.clip(u0 + 128, 0, Wd - 128)
                u1 = pl.multiple_of(u1, 128)
                straddle = (umax // 128) > (umin // 128)
                ul = ui - u0

                vext = vmax - vmin + 1
                no_roll = mode in ("noroll2", "flat2")
                key = (vmin % 8) + vext if no_roll else vext
                fits = [key <= L for _, L in SAMPLE_BRANCHES[:-1]]
                loop_eff = jnp.int32(SAMPLE_BRANCHES[-1][1])
                for (_, L), ft in zip(SAMPLE_BRANCHES[-2::-1], fits[::-1]):
                    loop_eff = jnp.where(ft, jnp.int32(L), loop_eff)
                ulc = jnp.clip(ul, 0, 127)
                uhc = jnp.clip(ul - 128, 0, 127)
                TILE = (BRICK_Z, BRICK_Y * BRICK_X)

                def _sample(Hwin, LOOP):
                    v0 = jnp.clip((vmin // 8) * 8, 0, Hd - Hwin)
                    v0 = pl.multiple_of(v0, 8)
                    s0 = jnp.clip(vmin - v0, 0, Hwin - 1)
                    roll_v = jnp.where(s0 == 0, 0, Hwin - s0)
                    vl = vi - v0 if no_roll else vi - vmin
                    one_win = mode in ("nostraddle2", "flat2")
                    ulim = (jnp.int32(128) if one_win
                            else jnp.where(straddle, 256, 128))
                    in_win = (ul >= 0) & (ul < ulim) & (vl >= 0) & (vl < LOOP)

                    def _rows(wins):
                        d = jnp.zeros_like(sdf)
                        two = len(wins) == 2
                        for r in range(LOOP):
                            sel = vl == r
                            g = jnp.take_along_axis(
                                jnp.broadcast_to(wins[0][r], TILE), ulc, axis=1,
                            )
                            if two:
                                gh = jnp.take_along_axis(
                                    jnp.broadcast_to(wins[1][r], TILE), uhc, axis=1,
                                )
                                g = jnp.where(ul >= 128, gh, g)
                            d = jnp.where(sel, g, d)
                        # NOTE: lax.cond branches must yield f32/i32 tiles
                        # only — an i1 vector return crashes Mosaic
                        return d, in_win.astype(jnp.int32)

                    if mode == "dmahbm2":
                        def _arm(nwin):
                            wins = []
                            for i, ub in enumerate((u0, u1)[:nwin]):
                                cp = pltpu.make_async_copy(
                                    depths_ref.at[f, pl.ds(v0, Hwin), pl.ds(ub, 128)],
                                    win_buf.at[i, pl.ds(0, Hwin)],
                                    win_sem.at[i],
                                )
                                cp.start()
                                cp.wait()
                                w_ = win_buf[i, pl.ds(0, Hwin)]
                                wins.append(
                                    w_ if no_roll else pltpu.roll(w_, roll_v, axis=0)
                                )
                            return _rows(wins)
                    else:
                        def _arm(nwin):
                            wins = []
                            for ub in (u0, u1)[:nwin]:
                                w_ = depths_ref[f, pl.ds(v0, Hwin), pl.ds(ub, 128)]
                                wins.append(
                                    w_ if no_roll else pltpu.roll(w_, roll_v, axis=0)
                                )
                            return _rows(wins)

                    if mode in ("nostraddle2", "flat2"):
                        return _arm(1)
                    return jax.lax.cond(straddle, lambda: _arm(2), lambda: _arm(1))

                if mode in ("noladder2", "flat2", "dmahbm2"):
                    d, in_win = _sample(*SAMPLE_BRANCHES[-1])
                else:
                    d, in_win = _branch_sample(_sample, fits)
                ok = (in_win > 0) & in_img

                d = d / depth_scale
                ok = ok & (d > 0.0) & (d < depth_max)
                sdf_obs = d - z
                ok = ok & (sdf_obs > -trunc)
                tsdf_obs = jnp.clip(sdf_obs / trunc, -1.0, 1.0)
                w_obs = ok.astype(jnp.float32)
                w_new = w + w_obs
                inv = 1.0 / jnp.maximum(w_new, 1.0)
                sdf_n = (sdf * w + tsdf_obs * w_obs) * inv
                sdf_n = jnp.where(w_new > 0, sdf_n, 1.0)
                return sdf_n, jnp.minimum(w_new, max_weight)

            state = jax.lax.cond(hit, _frame, lambda a: a, state)

        sdf_bufs[s] = state[0]
        w_bufs[s] = state[1]
        for c in cp_out(k):
            c.start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)
    for i in range(4):
        @pl.when((n - 4 + i >= 0) & (n - 4 + i < n))
        def _():
            for c in cp_out(n - 4 + i):
                c.wait()


@partial(jax.jit, static_argnames=("brick_dims", "mode"), donate_argnums=(0, 1))
def _run_ablate2(sdf_b, weight_b, brick_ids, meta, poses_flat, intr, fbits,
                 depths, brick_dims, mode):
    F, Hd, Wd = depths.shape
    NSLOT = 4
    kernel = partial(
        _ablate_kernel2, F=F, Hd=Hd, Wd=Wd, brick_dims=brick_dims,
        depth_scale=1000.0, depth_max=3.0, mode=mode,
    )
    depths_space = pl.ANY if mode == "dmahbm2" else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=depths_space),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((NSLOT, BRICK_Z, BRICK_Y * BRICK_X), jnp.float32),
            pltpu.VMEM((NSLOT, BRICK_Z, BRICK_Y * BRICK_X), jnp.float32),
            pltpu.VMEM((2, SAMPLE_BRANCHES[-1][0], 128), jnp.float32),
        ] + [pltpu.SemaphoreType.DMA((NSLOT,))] * 4
        + [pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(sdf_b.shape, sdf_b.dtype),
            jax.ShapeDtypeStruct(weight_b.shape, weight_b.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(brick_ids, meta, poses_flat, intr, fbits.astype(jnp.int32), depths,
      sdf_b, weight_b)


@partial(jax.jit, static_argnames=("brick_dims", "mode"), donate_argnums=(0, 1))
def _run_ablate(sdf_b, weight_b, brick_ids, meta, poses_flat, intr, fbits,
                depths, brick_dims, mode):
    F, Hd, Wd = depths.shape
    NSLOT = 4
    kernel = partial(
        _ablate_kernel, F=F, Hd=Hd, Wd=Wd, brick_dims=brick_dims,
        depth_scale=1000.0, depth_max=3.0, mode=mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((NSLOT, BRICK_Z, BRICK_Y * BRICK_X), jnp.float32),
            pltpu.VMEM((NSLOT, BRICK_Z, BRICK_Y * BRICK_X), jnp.float32),
        ] + [pltpu.SemaphoreType.DMA((NSLOT,))] * 4,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(sdf_b.shape, sdf_b.dtype),
            jax.ShapeDtypeStruct(weight_b.shape, weight_b.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(brick_ids, meta, poses_flat, intr, fbits.astype(jnp.int32), depths,
      sdf_b, weight_b)


# ---------------------------------------------------------------------------
# mask pipeline alone (stages (b))
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("brick_dims",))
def _mask_pipeline(depths, T_chunk, origin, voxel, trunc, intr, brick_dims):
    occ0, occ1, binp = tb._build_depth_occupancy(depths, 1000.0, 3.0, 8)
    bits = tb.active_brick_bits_pallas(
        brick_dims, origin, voxel, trunc, occ0, occ1, binp, T_chunk,
        intr[0], intr[1], intr[2], intr[3], 3.0, 8,
    )
    bits = bits & tb._exact_frame_bits_dilated(
        bits, depths, T_chunk, origin, voxel, trunc, intr, brick_dims,
        4096, 1000.0, 3.0,
    )
    mask = bits != 0
    n = jnp.sum(mask).astype(jnp.int32)
    ids = jnp.argsort(
        jnp.where(mask, jnp.int32(0), jnp.int32(1)), stable=True
    )[:MAX_ACTIVE].astype(jnp.int32)
    return bits, ids, n


def main():
    from reconplan_tpu.utils.tpu_lock import probe_and_wait, tpu_lock

    with tpu_lock(name="profile_brick", wait_secs=600):
        ok, info = probe_and_wait()
        if not ok:
            print(json.dumps({"error": "tpu unhealthy", "info": str(info)}))
            return
        print(f"[probe] {info}", file=sys.stderr)

        depths, poses, (fx, fy, cx, cy) = make_frames(F_ALL)
        depths_d = jnp.asarray(depths)
        poses_d = jnp.asarray(poses)
        intr = jnp.asarray([fx, fy, cx, cy], jnp.float32)

        def fresh():
            return tb.make_brick_grid(
                (N, N, N), (-0.4, -0.4, -0.3), 0.8 / (N - 1)
            )

        grid0 = fresh()
        brick_dims = grid0.brick_dims
        nb_scratch = grid0.sdf.shape[0] - 1
        origin = np.asarray(grid0.origin)
        voxel_size, trunc = grid0.voxel_size, grid0.trunc

        fence = jax.jit(lambda x: jnp.sum(x))
        _ = float(fence(jnp.zeros(8)))
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(fence(jnp.zeros(8)))
        rpc = (time.perf_counter() - t0) / 3

        def timed(init_state, step, fence_arr, reps=5, inner=3):
            """Thread live state through ``step`` (donation-safe, like
            bench.py's live grid); fence via ``fence_arr(state)``."""
            state = step(init_state())  # warm/compile
            _ = float(fence(fence_arr(state)))
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                for _ in range(inner):
                    state = step(state)
                _ = float(fence(fence_arr(state)))
                best = min(best, (time.perf_counter() - t0 - rpc) / inner)
            return best

        out = {}

        # (a) full pipeline
        def full_step(g):
            g2, _ = tb.integrate_frames_bricked_device(
                g, depths_d, poses_d, fx, fy, cx, cy, max_active=MAX_ACTIVE,
            )
            return g2

        out["full_pipeline_ms"] = timed(
            fresh, full_step, lambda g: g.weight
        ) * 1e3

        # (b) mask pipeline alone, all 4 chunks
        T_all = jnp.linalg.inv(poses_d)
        chunks = [
            (depths_d[f0:f0 + CHUNK], T_all[f0:f0 + CHUNK])
            for f0 in range(0, F_ALL, CHUNK)
        ]

        def masks_step(_):
            outs = []
            for d, T in chunks:
                outs.append(_mask_pipeline(
                    d, T, grid0.origin, voxel_size, trunc, intr, brick_dims,
                ))
            return outs

        out["mask_pipeline_ms"] = timed(
            lambda: None, masks_step, lambda o: o[-1][0]
        ) * 1e3

        # (b2) mask sub-stages (occupancy build / pallas coarse bits /
        # exact refine / argsort compaction), timed separately
        @partial(jax.jit, static_argnames=("brick_dims", "stage"))
        def _mask_stage(depths, T_chunk, origin, voxel, trunc, intr,
                        brick_dims, stage):
            occ0, occ1, binp = tb._build_depth_occupancy(depths, 1000.0, 3.0, 8)
            if stage == "occ":
                return occ0
            bits = tb.active_brick_bits_pallas(
                brick_dims, origin, voxel, trunc, occ0, occ1, binp, T_chunk,
                intr[0], intr[1], intr[2], intr[3], 3.0, 8,
            )
            if stage == "bits":
                return bits
            bits = bits & tb._exact_frame_bits_dilated(
                bits, depths, T_chunk, origin, voxel, trunc, intr,
                brick_dims, 4096, 1000.0, 3.0,
            )
            if stage == "refine":
                return bits
            mask = bits != 0
            ids = jnp.argsort(
                jnp.where(mask, jnp.int32(0), jnp.int32(1)), stable=True
            )[:MAX_ACTIVE].astype(jnp.int32)
            return ids

        for stage in ("occ", "bits", "refine", "argsort"):
            def stage_step(_, stage=stage):
                outs = []
                for d, T in chunks:
                    outs.append(_mask_stage(
                        d, T, grid0.origin, voxel_size, trunc, intr,
                        brick_dims, stage,
                    ))
                return outs

            out[f"mask_{stage}_ms"] = timed(
                lambda: None, stage_step, lambda o: o[-1]
            ) * 1e3

        # (b3) compaction alternatives A/B on a fixed mask: full stable
        # argsort (production) vs lax.top_k partial sort (k = MAX_ACTIVE of
        # nbricks; keys crafted so actives come first in ascending index
        # order, matching the argsort contract)
        nb = int(np.prod(brick_dims))
        bits_fixed = _mask_pipeline(
            chunks[0][0], chunks[0][1], grid0.origin, voxel_size, trunc,
            intr, brick_dims,
        )[0]
        mask_fixed = jax.device_put(bits_fixed != 0)

        @jax.jit
        def _compact_argsort(mask):
            return jnp.argsort(
                jnp.where(mask, jnp.int32(0), jnp.int32(1)), stable=True
            )[:MAX_ACTIVE].astype(jnp.int32)

        @jax.jit
        def _compact_topk(mask):
            idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
            key = jnp.where(mask, 2 * mask.shape[0] - idx, mask.shape[0] - idx)
            _, ids = jax.lax.top_k(key, MAX_ACTIVE)
            return ids.astype(jnp.int32)

        for name, fn in (("argsort", _compact_argsort),
                         ("topk", _compact_topk)):
            def cstep(_, fn=fn):
                return [fn(mask_fixed) for _ in range(4)]

            out[f"compact_{name}_ms"] = timed(
                lambda: None, cstep, lambda o: o[-1]
            ) * 1e3

        # precompute ids/fbits per chunk (host) for kernel-only timings
        pre = []
        for (d, T) in chunks:
            bits, ids, n = _mask_pipeline(
                d, T, grid0.origin, voxel_size, trunc, intr, brick_dims,
            )
            bits, ids, n = np.asarray(bits), np.asarray(ids), int(n)
            n = min(n, MAX_ACTIVE)
            ids = ids.copy()
            ids[n:] = nb_scratch
            fb = np.concatenate([bits, np.zeros(1, np.int32)])[
                np.minimum(ids, bits.shape[0])
            ]
            meta = np.asarray(
                list(origin) + [voxel_size, trunc, 64.0, 0.0, float(n)],
                dtype=np.float32,
            )
            pre.append((jnp.asarray(ids), jnp.asarray(fb.astype(np.int32)),
                        jnp.asarray(meta), T.reshape(-1, 16), d, n))
        print(f"[chunks] n_active = {[p[5] for p in pre]}", file=sys.stderr)
        hits = [
            int(np.sum([bin(int(x)).count("1") for x in np.asarray(p[1])]))
            for p in pre
        ]
        print(
            f"[chunks] (brick,frame) hits = {hits} "
            f"(total {sum(hits)}; per-hit budget at the production ms "
            "= kernel_production_ms / total)",
            file=sys.stderr,
        )

        # (c) production dyn kernel alone + ablations
        def mk_step(mode):
            def step(state):
                sdf_b, w_b = state
                for ids, fb, meta, Tf, d, _n in pre:
                    if mode == "production":
                        sdf_b, w_b, _ = tb._integrate_bricks_dyn(
                            sdf_b, w_b, None, ids, meta, Tf, intr, fb, d,
                            None, brick_dims, 1000.0, 3.0, 64.0,
                        )
                    elif mode.endswith("2"):
                        sdf_b, w_b = _run_ablate2(
                            sdf_b, w_b, ids, meta, Tf, intr, fb, d,
                            brick_dims, mode,
                        )
                    else:
                        sdf_b, w_b = _run_ablate(
                            sdf_b, w_b, ids, meta, Tf, intr, fb, d,
                            brick_dims, mode,
                        )
                return sdf_b, w_b

            return step

        # parity gate: the new-design ablation copy must reproduce the
        # production kernel bit-for-bit before its timings mean anything
        ids0, fb0, meta0, Tf0, d0, _ = pre[0]
        g1, g2 = fresh(), fresh()
        s1, w1, _ = tb._integrate_bricks_dyn(
            g1.sdf, g1.weight, None, ids0, meta0, Tf0, intr, fb0, d0,
            None, brick_dims, 1000.0, 3.0, 64.0,
        )
        s2, w2 = _run_ablate2(
            g2.sdf, g2.weight, ids0, meta0, Tf0, intr, fb0, d0,
            brick_dims, "full2",
        )
        print(
            f"[parity] full2 vs production: max|dsdf|="
            f"{float(jnp.max(jnp.abs(s1 - s2))):.3g} "
            f"max|dw|={float(jnp.max(jnp.abs(w1 - w2))):.3g}",
            file=sys.stderr,
        )

        for mode in ("production", "full2", "noladder2", "nostraddle2",
                     "noroll2", "flat2", "dmahbm2",
                     "full", "no_rowloop", "no_window",
                     "no_rolls", "no_roll_u", "no_roll_v",
                     "no_prologue", "no_fbits", "dma_only"):
            g = fresh()
            out[f"kernel_{mode}_ms"] = timed(
                lambda g=g: (g.sdf, g.weight), mk_step(mode),
                lambda s: s[1],
            ) * 1e3

        out["note"] = (
            "times are per 32-frame batch (4 chunks of 8); "
            "fps = 32000 / ms"
        )
        for k, v in out.items():
            if isinstance(v, float):
                print(f"{k:>24}: {v:8.2f} ms   ({32e3 / v:7.0f} fps)")
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}))


if __name__ == "__main__":
    main()
