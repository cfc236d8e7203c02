"""Shared scenario for the checked-in golden fused-step trajectory.

The golden file (tests/golden/fused_blind_grasping.npz) is RECORDED on real
TPU hardware from the production Mosaic kernel (tools/record_golden.py) and
REPLAYED in default CI on CPU through the hybrid fused backend and the XLA
reference step — so the suite cannot go green if any of the three paths
drifts from the recorded TPU behavior. Re-record on TPU whenever the
physics/obs/reward semantics intentionally change (the test failing with a
uniform small offset is the signal).

Determinism notes: actions come from host numpy (backend-independent);
jax.random (threefry) produces identical draws on CPU and TPU, so in-step
reset sampling matches across backends too.
"""

from __future__ import annotations

import numpy as np

CONFIG = [
    "task=BlindGrasping",
    "numEnvs=8",
    "env.episodeLength=6",   # short: several auto-resets inside the window
    "sim.substeps=2",
]
SEED = 123
STEPS = 12
GOLDEN = "golden/fused_blind_grasping.npz"


def make_env_and_actions():
    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.utils.config import load_config

    env = make_env(load_config(list(CONFIG)), seed=SEED)
    rng = np.random.default_rng(SEED)
    actions = rng.uniform(
        -1.0, 1.0, (STEPS, env.num_envs, env.num_actions)
    ).astype(np.float32)
    return env, actions


def run_fused(env, actions, backend: str):
    """Roll the scenario through the fused step; returns stacked host arrays."""
    import jax

    fused = env.make_fused(backend=backend)
    fs, _ = fused.reset(jax.random.key(SEED))
    step = jax.jit(fused.step_fn)
    out = {"obs": [], "rew": [], "done": [], "comp": []}
    for t in range(actions.shape[0]):
        fs, obs, rew, done, extras = step(fs, actions[t])
        out["obs"].append(np.asarray(obs))
        out["rew"].append(np.asarray(rew))
        out["done"].append(np.asarray(done))
        out["comp"].append(np.asarray(extras["reward_components_packed"]))
    return {k: np.stack(v) for k, v in out.items()}


def run_xla_reference(env, actions):
    """The same scenario through the XLA reference step (envs/dexhand.py),
    packing reward components in the fused order for comparison."""
    import jax

    state, _ = env._reset_jit(jax.random.key(SEED))
    step = jax.jit(env.step_fn)
    comp_names = None
    out = {"obs": [], "rew": [], "done": [], "comp": []}
    for t in range(actions.shape[0]):
        state, obs, rew, done, extras = step(state, actions[t])
        if comp_names is None:
            comp_names = sorted(extras["reward_components"])
        out["obs"].append(np.asarray(obs))
        out["rew"].append(np.asarray(rew))
        out["done"].append(np.asarray(done))
        out["comp"].append(np.stack(
            [np.asarray(extras["reward_components"][k]) for k in comp_names],
            axis=-1,
        ))
    return {k: np.stack(v) for k, v in out.items()}
