"""Device mesh + sharding layer: envs sharded over chips, learner replicated.

The reference has NO distributed code (single process, single GPU,
`multi_gpu: False`; SURVEY §2.9) -- this module is the TPU-native scale-out
layer it lacks. Design (per SURVEY §5.8 / BASELINE north star):

- a 1-D `data` mesh axis over all chips (ICI within a host, DCN across hosts;
  `jax.distributed` + the same code path covers multi-host pods)
- the env batch dimension is sharded along `data`: physics is embarrassingly
  parallel (no cross-env collectives anywhere in the step function), so env
  stepping scales linearly by construction
- PPO network/optimizer state is replicated; under `jit`, XLA's SPMD
  partitioner inserts the gradient `psum` over `data` automatically when the
  sharded batch meets the replicated params -- no hand-written collectives
- observation normalization statistics are computed over the full (global)
  batch via the same mechanism (jnp.mean over a sharded axis lowers to a
  mean + psum), matching the reference's single-learner semantics exactly
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading dim is the env batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree: Any, mesh: Mesh) -> Any:
    """Shard every leaf with a leading env-batch dim along `data`; replicate
    scalars and non-divisible leaves. Used to place EnvState / obs."""
    n_dev = mesh.devices.size
    data = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % n_dev == 0 \
                and leaf.shape[0] > 0 and not _is_key(leaf):
            return jax.device_put(leaf, data)
        return jax.device_put(leaf, repl)

    return jax.tree.map(place, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh. Uses a jitted identity with
    replicated out-shardings rather than device_put: in a multi-process
    (multi-host) mesh device_put rejects non-addressable shardings, while
    SPMD execution produces global replicated arrays from each process's
    (identical, seed-derived) local values — and it handles typed PRNG-key
    leaves uniformly."""
    repl = replicated(mesh)
    shardings = jax.tree.map(lambda _: repl, tree)
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def _is_key(leaf) -> bool:
    return jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key)
