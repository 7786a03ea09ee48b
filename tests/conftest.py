"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding/collective
code path is exercised without TPU hardware (the driver dry-run-compiles the
multi-chip path separately via ``__graft_entry__.dryrun_multichip``).

These environment variables must be set before the first ``import jax``
anywhere, which is why they live at module import time in conftest.
"""

import os
import sys

# Force-set (not setdefault): the shell env exports JAX_PLATFORMS=axon for
# the tunneled TPU; tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
