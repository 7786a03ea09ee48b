"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding/collective
code path is exercised without TPU hardware (the driver dry-run-compiles the
multi-chip path separately via ``__graft_entry__.dryrun_multichip``).

Platform forcing is tricky in this environment: an ``axon`` PJRT plugin is
registered by a sitecustomize hook at interpreter start, which calls
``jax.config.update("jax_platforms", "axon,cpu")`` — that CONFIG value
overrides the ``JAX_PLATFORMS`` env var, so env-only forcing silently keeps
tests on the tunneled TPU. We must update the config again, before any
backend initializes.
"""

import os
import sys

# XLA_FLAGS is read by the CPU client at backend init — set before first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
