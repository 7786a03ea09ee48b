"""Single-client TPU discipline: a pidfile lock + an out-of-process
health probe for the tunneled ``axon`` runtime.

The tunnel serializes ALL client processes — two concurrent TPU clients
both look hung, a client killed mid-RPC wedges the worker for ~2-3 min,
and a crashed worker can take 15-30 min to return (measured; see
``docs/ROADMAP.md`` platform gotchas). The reference never needs this
(its CUDA context is per-process), but every TPU entry point here
(``bench.py``, ``apps/scan.py``, the verify skill) must:

  1. hold :func:`tpu_lock` for the duration of device use, so a stray
     long-running benchmark can never share (and thereby stall) a
     capture window;
  2. gate first device use on :func:`probe_tpu` — a tiny jit run in a
     SUBPROCESS with a hard timeout, because an in-process
     ``jax.devices()`` against a downed tunnel blocks ~25 min before
     raising and poisons the caller's backend state for the rest of
     the process.
"""

from __future__ import annotations

import contextlib
import json
import os
import subprocess
import sys
import time

__all__ = ["tpu_lock", "probe_tpu", "probe_and_wait"]

LOCK_PATH = "/tmp/reconplan_tpu_client.lock"

_PROBE_SRC = """
import time, json
t0 = time.time()
import jax, jax.numpy as jnp
v = float(jax.jit(jnp.sum)(jnp.ones((64, 64))))
d = jax.devices()[0]
print(json.dumps({"ok": v == 4096.0, "secs": round(time.time() - t0, 1),
                  "device": str(d)}))
"""


def _holder(path=LOCK_PATH):
    """Return the live holder record, or None (missing/stale/dead pid)."""
    try:
        with open(path) as f:
            rec = json.load(f)
        os.kill(int(rec["pid"]), 0)  # raises if the pid is gone
        return rec
    except (FileNotFoundError, ValueError, KeyError,
            ProcessLookupError, PermissionError):
        return None


@contextlib.contextmanager
def tpu_lock(name="tpu-client", wait_secs=0, poll_secs=5, path=LOCK_PATH):
    """Hold the one-client-at-a-time pidfile for a TPU session.

    Stale locks (holder pid dead) are reaped automatically. If a LIVE
    holder exists, waits up to ``wait_secs`` then raises RuntimeError
    naming the holder — callers surface that in their failure JSON
    rather than silently queueing behind an unknown job.
    """
    deadline = time.time() + wait_secs
    while True:
        holder = _holder(path)
        if holder is None:
            break
        if time.time() >= deadline:
            raise RuntimeError(
                f"TPU lock held by pid {holder['pid']} "
                f"({holder.get('name', '?')} since {holder.get('at', '?')}); "
                f"one tunnel client at a time — stop it or wait"
            )
        time.sleep(poll_secs)
    tmp = f"{path}.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "name": name,
                   "at": time.strftime("%Y-%m-%d %H:%M:%S")}, f)
    os.replace(tmp, path)  # atomic on POSIX
    try:
        yield
    finally:
        if (_holder(path) or {}).get("pid") == os.getpid():
            with contextlib.suppress(OSError):
                os.remove(path)


def probe_tpu(timeout_s=150):
    """Run a tiny jit against the default (axon TPU) backend in a fresh
    subprocess. Returns ``(ok, info)`` where info is the probe's JSON
    record or an error string. Never blocks longer than ``timeout_s``."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s}s (tunnel down or wedged)"
    for line in reversed(r.stdout.strip().splitlines() or []):
        try:
            rec = json.loads(line)
            return bool(rec.get("ok")), rec
        except (ValueError, AttributeError):
            continue
    tail = (r.stderr.strip().splitlines() or ["no output"])[-1]
    return False, f"probe rc={r.returncode}: {tail[:300]}"


def probe_and_wait(attempts=6, sleep_secs=180, timeout_s=150, log=print):
    """Bounded retry across the documented wedge window (~2-3 min after a
    killed client; worker crashes need 15-30 min — 6 x 3 min covers the
    common case without letting a capture hang forever).

    Returns ``(ok, last_info)``."""
    info = None
    for i in range(attempts):
        ok, info = probe_tpu(timeout_s)
        if ok:
            return True, info
        log(f"[tpu-probe] attempt {i + 1}/{attempts} failed: {info}")
        if i + 1 < attempts:
            log(f"[tpu-probe] sleeping {sleep_secs}s before retry")
            time.sleep(sleep_secs)
    return False, info
