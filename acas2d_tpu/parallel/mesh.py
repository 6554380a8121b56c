"""Device-mesh and sharding helpers (the framework's distributed backbone).

The reference is single-process/single-device with no distributed backend
(SURVEY.md §2.3); in the TPU build, scaling happens along one named mesh
axis, 'env': environment batches shard over it (pure data parallel, zero
collectives in the rollout) and the PPO learner runs data-parallel over the
same axis with XLA-inserted all-reduces for gradients (the ICI/DCN
equivalent of the reference's missing NCCL tier, BASELINE.json configs 4-5).

The tiny (64,64) MLP is always replicated — tensor/pipeline parallelism has
no counterpart in this workload (SURVEY.md §5 'long-context' note).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; env/data parallel only."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = ENV_AXIS) -> NamedSharding:
    """Shard the leading (env-batch) axis; all trailing axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_pytree(tree, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Place every leaf of a batched pytree (leading axis = env) onto the
    mesh, split along the env axis."""
    sh = env_sharding(mesh, axis_name)
    return jax.device_put(tree, sh)


def multihost_init():
    """Initialize jax.distributed when launched across hosts.

    Safe to call unconditionally in drivers: a no-op for single-process
    runs.  On a pod slice, the standard env vars / TPU metadata drive
    coordinator discovery, after which jax.devices() spans all hosts and the
    same mesh/sharding code scales out (DCN between slices, ICI within).
    """
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
            os.environ.get("ACAS2D_MULTIHOST", "0")):
        jax.distributed.initialize()
