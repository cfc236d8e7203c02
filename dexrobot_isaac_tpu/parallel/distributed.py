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
    """Initialize jax.distributed when launched as a multi-host job.

    Launch contract (train.py calls this before any backend use): set
    `JAX_COORDINATOR_ADDRESS` (host:port of process 0) on every process; on
    platforms without automatic cluster detection (CPU testing, manual TPU
    pods) additionally set `JAX_NUM_PROCESSES` and `JAX_PROCESS_ID`. On CPU
    the cross-process collectives ride gloo. Returns True if initialized.

    The reference has no distributed code at all (single process, single
    GPU, `multi_gpu: False` — SURVEY §2.9); this is the multi-host entry
    point of the TPU-native scale-out design (BASELINE.json configs #4/#5:
    envs sharded over hosts, gradients over ICI/DCN)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
        # CPU backend: cross-process collectives need an explicit transport
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(**kwargs)
    return True


def make_sharded_reset(env, mesh: Mesh):
    """Per-shard env construction: jit(shard_map(reset_fn)) over the data
    axis, so every process materializes only its LOCAL slice of the global
    env batch (global/num_shards envs per device) instead of building the
    full global batch in one place. Reset sampling folds the shard index in
    (env.reset_fn axis support) so randomization decorrelates across shards;
    the carried EnvState.rng and the curriculum difficulty stay replicated.

    Returns fn(key) -> (env_state, obs) with globally-sharded outputs —
    identical global semantics whether the mesh spans one process (virtual
    or real multi-chip) or many (multi-host): shard identity is the global
    device index either way."""
    n_shards = mesh.devices.size
    n_global = env.num_envs
    assert n_global % n_shards == 0, (
        f"num_envs={n_global} must divide over {n_shards} shards"
    )
    n_local = n_global // n_shards

    def body(key):
        return env.reset_fn(key, num_envs=n_local)

    # out specs from a LOCAL-shape abstract trace (axis collectives disabled;
    # the structure is identical with or without the fold-in)
    saved = env.axis_name
    env.axis_name = None
    try:
        state_shape, obs_shape = jax.eval_shape(body, jax.random.key(0))
    finally:
        env.axis_name = saved

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == n_local:
            return P(DATA_AXIS)
        return P()

    out_specs = (jax.tree.map(spec, state_shape), P(DATA_AXIS))

    def run(key):
        saved_axis = env.axis_name
        env.axis_name = DATA_AXIS
        try:
            sharded = shard_map(
                body, mesh=mesh, in_specs=P(), out_specs=out_specs,
                check_vma=False,
            )
            return jax.jit(sharded)(key)
        finally:
            env.axis_name = saved_axis

    return run


def _batch_specs(template: Any, num_envs_global: int):
    """PartitionSpec pytree: leaves with an env-batch dim shard along
    `data`; scalars and keys replicate. The env batch is the leading dim
    for EnvState/obs leaves and axis 1 for the fused kernel's lane-major
    (rows, N) layout (envs/fused_step.py FusedEnvState)."""

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == num_envs_global:
            return P(DATA_AXIS)
        if len(shape) == 2 and shape[1] == num_envs_global:
            return P(None, DATA_AXIS)
        return P()

    return jax.tree.map(spec, template)


def make_sharded_train_step(
    learner, mesh: Mesh, env_state_template, obs_template, chunk: int = 1
):
    """Wrap the learner's train iteration in shard_map: env batch sharded
    along `data`, PPO state replicated, gradient/stat collectives explicit
    (learner must be constructed with axis_name=DATA_AXIS).

    chunk > 1 scans that many train iterations INSIDE the shard_map body
    (one dispatch per chunk — the distributed analog of
    learner.make_chunked_train_step): metrics gain a leading (chunk,) dim
    and rollout extras become (chunk, T, N, ...), matching the
    single-program chunked path's output contract."""
    assert learner.axis_name == DATA_AXIS, (
        "PPOLearner must be built with axis_name=parallel.mesh.DATA_AXIS"
    )
    n_global = obs_template.shape[0]
    es_spec = _batch_specs(env_state_template, n_global)
    obs_spec = P(DATA_AXIS)
    repl = jax.tree.map(lambda _: P(), jax.eval_shape(learner.init_state))

    if chunk > 1:
        def run(ppo, env_state, obs):
            def body(carry, _):
                ppo, env_state, obs = carry
                ppo, env_state, obs, metrics, extras = (
                    learner._train_iteration(ppo, env_state, obs)
                )
                return (ppo, env_state, obs), (metrics, extras)

            (ppo, env_state, obs), (metrics, extras) = jax.lax.scan(
                body, (ppo, env_state, obs), None, length=chunk
            )
            return ppo, env_state, obs, metrics, extras
    else:
        def run(ppo, env_state, obs):
            return learner._train_iteration(ppo, env_state, obs)

    # output structure: (ppo, env_state, obs, metrics, roll_extras).
    # Trace for shapes with the collectives disabled -- axis_index is only
    # legal inside shard_map, and the output STRUCTURE is identical.
    env = getattr(learner.env_step, "__self__", None) or getattr(
        learner.env_step, "_env", None
    )
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
        # rollout extras are stacked (T, N, ...) — or (chunk, T, N, ...)
        # when chunked: shard the env-batch axis, replicate the rest
        shape = leaf.shape
        batch_axis = 2 if chunk > 1 else 1
        if len(shape) > batch_axis and shape[batch_axis] == n_global:
            return P(*([None] * batch_axis), DATA_AXIS)
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
