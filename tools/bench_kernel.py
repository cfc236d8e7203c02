#!/usr/bin/env python
"""Micro-benchmark of the fused Pallas control-step kernel variants.

Times ONLY the physics control step (no obs/reward/PPO) at a given env count
and block size, printing one JSON line per configuration. Used to tune
ENV_BLOCK and to quantify kernel changes (FK fold, LTL solve) in isolation.

NOTE (memory/tpu-tunnel-gotchas): the FIRST execution of a fresh kernel
program over the axon tunnel can take 20-35 min of silence (device-side
compile). Run under a generous timeout; steady-state timing starts after
the warmup block completes.

  python tools/bench_kernel.py [num_envs] [steps] [block1,block2,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    blocks = (
        [int(b) for b in sys.argv[3].split(",")]
        if len(sys.argv) > 3 else [1024]
    )

    import jax
    import jax.numpy as jnp

    from dexrobot_isaac_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from dexrobot_isaac_tpu.physics.engine import HandPhysics
    from dexrobot_isaac_tpu.physics.pallas_step import build_control_step
    from dexrobot_isaac_tpu.physics.types import (
        SimParams,
        make_initial_physics_state,
    )

    phys = HandPhysics(params=SimParams(dt=0.01, substeps=2, has_box=True))
    n_physics_steps = 4

    key = jax.random.key(0)
    state = make_initial_physics_state(
        num_envs,
        box_pos=jnp.tile(jnp.array([[0.1, 0.0, 0.027]]), (num_envs, 1)),
    )
    q = state.q + jax.random.uniform(key, state.q.shape, maxval=0.2)
    spawn = jnp.tile(
        jnp.array([[0.0, 0.0, 0.25]], dtype=jnp.float32), (num_envs, 1)
    )
    targets = q
    box13 = jnp.concatenate(
        [state.box_pos, state.box_quat, state.box_linvel, state.box_angvel],
        axis=1,
    )
    dr4 = jnp.ones((num_envs, 4), jnp.float32)

    substeps = n_physics_steps * phys.params.substeps
    for block in blocks:
        ctrl = build_control_step(phys, n_physics_steps, block=block)
        t_warm = time.perf_counter()
        out = ctrl(q, qd := state.qd, targets, spawn, box13, dr4)
        jax.block_until_ready(out[0])
        warm_s = time.perf_counter() - t_warm

        t0 = time.perf_counter()
        qq, qdd = q, qd
        for _ in range(steps):
            qq, qdd, box13_o, cf, bf, kin = ctrl(
                qq, qdd, targets, spawn, box13, dr4
            )
        jax.block_until_ready(qq)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"kernel env-steps/s ({num_envs} envs, block {block})",
            "value": round(num_envs * steps / dt, 1),
            "unit": "env-steps/s",
            "substeps_per_call": substeps,
            "warmup_s": round(warm_s, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
