"""Microprobe: which dynamic sublane-alignment primitive does Mosaic
support/prefer on this chip, for the brick kernel's sampling window?

The sampling loop in ``ops/tsdf_brick.py`` walks every row of an aligned
depth window (24/32/64 rows) even though the brick's true footprint is
``vext = vmax - vmin + 1`` rows (measured on the bench scene: median 26,
p90 32 — and the 8-row alignment padding means the 24-row fast branch
NEVER fits, so 58% of brick-frames run the 64-row loop). If the window
can be shifted so the footprint starts at sublane 0, the loop only needs
``vext``-bounded iterations: measured ~41% fewer sampling iterations.

Three candidate primitives, each probed for compile + correctness + time:

  A. ``pltpu.roll(win, H - s0, axis=0)`` — dynamic sublane roll
  B. ``jax.lax.dynamic_slice`` of the loaded window value along rows
  C. per-row dynamic ref load ``ref[f, v0 + s0 + r, pl.ds(u0, W)]``

Usage: python benchmarks/probe_sublane_ops.py   (needs the real chip)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 32, 256
LOOP = 24


def _mk(kind):
    def kernel(s0_ref, x_ref, o_ref):
        s0 = s0_ref[0]
        win = x_ref[pl.ds(0, H), :]
        if kind == "roll":
            shift = jnp.where(s0 == 0, 0, H - s0)
            w = pltpu.roll(win, shift, axis=0)
            acc = jnp.zeros((8, 128), jnp.float32)
            for r in range(LOOP):
                acc = acc + jnp.broadcast_to(w[r, :128], (8, 128))
            o_ref[:] = acc
        elif kind == "dynslice":
            w = jax.lax.dynamic_slice(win, (s0, 0), (LOOP, W))
            acc = jnp.zeros((8, 128), jnp.float32)
            for r in range(LOOP):
                acc = acc + jnp.broadcast_to(w[r, :128], (8, 128))
            o_ref[:] = acc
        elif kind == "rowload":
            acc = jnp.zeros((8, 128), jnp.float32)
            for r in range(LOOP):
                row = x_ref[s0 + r, :]
                acc = acc + jnp.broadcast_to(row[:128], (8, 128))
            o_ref[:] = acc
        else:  # baseline: aligned full-H walk (current kernel shape)
            acc = jnp.zeros((8, 128), jnp.float32)
            for r in range(H):
                acc = acc + jnp.broadcast_to(win[r, :128], (8, 128))
            o_ref[:] = acc

    @jax.jit
    def run(s0, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(2048,),  # repeat to get above timer noise
        )(s0, x)

    return run


def main():
    print(jax.devices())
    x = jnp.asarray(np.random.rand(H, W).astype(np.float32))
    fence = jax.jit(lambda a: jnp.sum(a))
    results = {}
    for kind in ("baseline", "roll", "dynslice", "rowload"):
        run = _mk(kind)
        for s0v in (0, 5):
            s0 = jnp.asarray([s0v], jnp.int32)
            try:
                out = run(s0, x)
                _ = float(fence(out))
            except Exception as e:  # noqa: BLE001
                print(f"{kind} s0={s0v}: FAILED {type(e).__name__}: {e}")
                results[kind] = None
                break
            # correctness vs numpy
            xr = np.asarray(x)
            if kind == "baseline":
                ref = xr[:H, :128].sum(0)
            else:
                ref = np.roll(xr, -s0v, axis=0)[:LOOP, :128].sum(0)
            err = float(np.abs(np.asarray(out)[0] - ref).max())
            t0 = time.perf_counter()
            for _ in range(20):
                out = run(s0, x)
            _ = float(fence(out))
            dt = (time.perf_counter() - t0) / 20
            print(f"{kind} s0={s0v}: ok err={err:.2e} {dt*1e3:.3f} ms")
            results.setdefault(kind, []).append(dt)
    print({k: (None if v is None else round(np.mean(v) * 1e3, 3))
           for k, v in results.items()})


if __name__ == "__main__":
    main()
