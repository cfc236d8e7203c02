#!/usr/bin/env python
"""Semantic FLOPs per env control step, via XLA cost analysis on CPU.

The fused TPU kernel's work is opaque to XLA cost analysis (one custom
call), but it is parity-locked to the readable jnp step
(envs/dexhand.py + physics/engine.py; tests/test_fused_step.py), so the
CPU-compiled reference step's FLOP count IS the semantic (algorithmic)
FLOPs of one control step — the numerator MFU wants. Counting on CPU
also avoids double-counting any TPU-specific recompute the lane kernel
does for VMEM economy.

Usage: python tools/count_flops.py [task] [num_envs]
Prints one JSON line: {"task", "num_envs", "flops_per_step",
"flops_per_env_step"}.  FLOPs scale linearly in num_envs (everything is
per-env vmapped), so a small batch (default 8) suffices and compiles in
well under a minute.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU BEFORE jax initializes a backend (this image preloads jax with
# a remote axon TPU backend via sitecustomize; see tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def count(task: str = "BlindGrasping", num_envs: int = 8) -> dict:
    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.utils.config import load_config

    cfg = load_config([f"task={task}", f"numEnvs={num_envs}"])
    env = make_env(cfg)
    state_t, _ = jax.eval_shape(env.reset_fn, jax.random.key(0))
    acts_t = jax.ShapeDtypeStruct((num_envs, env.num_actions), jnp.float32)
    compiled = jax.jit(env.step_fn).lower(state_t, acts_t).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca["flops"])
    return {
        "task": task,
        "num_envs": num_envs,
        "flops_per_step": flops,
        "flops_per_env_step": flops / num_envs,
    }


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "BlindGrasping"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps(count(task, n)))
