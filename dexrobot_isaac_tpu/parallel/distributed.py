"""Multi-chip / multi-host training: shard_map over the data mesh axis.

Two scale-out paths exist:
- GSPMD (parallel/mesh.py): pass sharded arrays into the normal jit; XLA
  partitions automatically. Works for the pure-XLA engine path.
- shard_map (this module): the env step and PPO update run *per shard* with
  explicit collectives (the learner's pmean/psum, rl/ppo.py). This is the
  path that composes with the fused Pallas physics kernel (a pallas_call
  cannot be auto-partitioned by GSPMD) and is the shape of the multi-host
  design: one process per host, `jax.distributed.initialize`, the same mesh
  spanning all hosts, gradients riding ICI within hosts and DCN across.

Per-shard RNG: the env folds `lax.axis_index(axis)` into its sampling keys
(envs/dexhand.py) so reset randomization is decorrelated across shards while
EnvState.rng itself stays replicated.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dexrobot_isaac_tpu.parallel.mesh import DATA_AXIS


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when launched as a multi-host job
    (coordinator env vars present). Returns True if initialized."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def _batch_specs(template: Any, num_envs_global: int):
    """PartitionSpec pytree: leaves with an env-batch leading dim shard along
    `data`; scalars and keys replicate."""

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == num_envs_global:
            return P(DATA_AXIS)
        return P()

    return jax.tree.map(spec, template)


def make_sharded_train_step(learner, mesh: Mesh, env_state_template, obs_template):
    """Wrap the learner's train iteration in shard_map: env batch sharded
    along `data`, PPO state replicated, gradient/stat collectives explicit
    (learner must be constructed with axis_name=DATA_AXIS)."""
    assert learner.axis_name == DATA_AXIS, (
        "PPOLearner must be built with axis_name=parallel.mesh.DATA_AXIS"
    )
    n_global = obs_template.shape[0]
    es_spec = _batch_specs(env_state_template, n_global)
    obs_spec = P(DATA_AXIS)
    repl = jax.tree.map(lambda _: P(), jax.eval_shape(learner.init_state))

    def run(ppo, env_state, obs):
        return learner._train_iteration(ppo, env_state, obs)

    # output structure: (ppo, env_state, obs, metrics, roll_extras).
    # Trace for shapes with the collectives disabled -- axis_index is only
    # legal inside shard_map, and the output STRUCTURE is identical.
    env = getattr(learner.env_step, "__self__", None)
    saved_axes = (learner.axis_name, getattr(env, "axis_name", None))
    learner.axis_name = None
    if env is not None:
        env.axis_name = None
    try:
        out_shapes = jax.eval_shape(
            run,
            jax.eval_shape(learner.init_state),
            env_state_template,
            obs_template,
        )
    finally:
        learner.axis_name = saved_axes[0]
        if env is not None:
            env.axis_name = saved_axes[1]
    metrics_spec = jax.tree.map(lambda _: P(), out_shapes[3])

    def extras_spec_leaf(leaf):
        # rollout extras are stacked (T, N_local, ...): batch dim is axis 1
        shape = leaf.shape
        if len(shape) >= 2 and shape[1] == n_global:
            return P(None, DATA_AXIS)
        return P()

    extras_spec = jax.tree.map(extras_spec_leaf, out_shapes[4])

    sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(repl, es_spec, obs_spec),
        out_specs=(repl, es_spec, obs_spec, metrics_spec, extras_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
