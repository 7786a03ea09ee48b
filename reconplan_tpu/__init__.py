"""reconplan_tpu — a TPU-native 3D reconstruction + redundancy-resolution planning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``geconf/3d-reconstruction-planning`` (UR10 + RealSense D435 object
reconstruction with Expansion-GRR global redundancy resolution), designed
TPU-first:

- arrays instead of object graphs (padded ``(N, ...)`` arrays + CSR neighbor
  lists instead of networkx),
- batched damped-least-squares IK under ``vmap``/``lax.while_loop`` instead of
  Klampt/PyBullet C++ IK,
- brute-force batched top-k nearest neighbors on the MXU instead of
  BallTree/NNDescent/GNAT,
- Pallas/XLA kernels for backprojection, ICP, voxel filtering, TSDF fusion,
  marching cubes and spectral Poisson reconstruction instead of Open3D,
- ``jax.sharding`` meshes + collectives for multi-chip scaling (spatially
  sharded TSDF grids, data-parallel frame batches, sharded IK batches).

Subpackages
-----------
core      SE3/quaternion math, sampling grids (reference ``grr/utils.py``)
kin       kinematic chains, FK/Jacobian/IK, collision (reference ``grr/robot.py``)
ops       device kernels: point clouds, NN, ICP, TSDF, marching cubes
recon     reconstruction pipelines: stitcher, fusion, Poisson, metrics
grr       Expansion-GRR workspace/solver/resolution (reference ``grr/``)
parallel  device meshes, sharded fusion/IK
io        frame feeds, mesh/image IO, config, checkpoints, robot drivers
apps      CLI entry points mirroring ``redundancy.py`` / ``main.py`` / ``stitcher.py``
utils     profiling, logging
viz       host-side visualization exports
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # This image's axon sitecustomize registers the TPU-tunnel backend at
    # interpreter start and latches the platform choice, silently overriding
    # the standard JAX_PLATFORMS env contract: a subprocess launched with
    # JAX_PLATFORMS=cpu still lands on the one real TPU chip (measured:
    # ``JAX_PLATFORMS=cpu python -c "import jax; print(jax.devices())"``
    # -> ``[TPU v5 lite0]``), which both starves the tunnel and violates the
    # one-TPU-client discipline. Restore env-var semantics for every entry
    # point that imports this package; no-op once a backend is already live.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized — caller's choice stands
        pass
