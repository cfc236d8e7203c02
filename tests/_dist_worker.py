"""Subprocess worker for the multi-process distributed tests (not a test).

Run as `python tests/_dist_worker.py <pid> <nproc> <port> <out.npz> <ndev>
<iters>`: joins a jax.distributed CPU cluster (gloo collectives), builds a
tiny BaseTask env with per-shard construction (make_sharded_reset), runs
`iters` sharded train iterations, and — on process 0 — saves the final
(replicated) policy params to `out.npz`.

`run_training` is also imported directly by the test process as the
single-process comparator: a 1-process x 8-virtual-device mesh must produce
the same global computation as 2 processes x 4 devices (shard identity is
the global device index either way).
"""

from __future__ import annotations

import os
import sys


def run_training(iters: int, num_envs: int = 16, seed: int = 7):
    import jax
    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.parallel.distributed import (
        make_sharded_reset,
        make_sharded_train_step,
    )
    from dexrobot_isaac_tpu.parallel.mesh import (
        DATA_AXIS,
        make_mesh,
        replicate_pytree,
    )
    from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
    from dexrobot_isaac_tpu.utils.config import load_config

    cfg = load_config([
        "task=BaseTask", f"numEnvs={num_envs}", "device=cpu",
        "env.episodeLength=8", "sim.substeps=1",
        "sim.physics_steps_per_control=2",
    ])
    env = make_env(cfg, seed=seed)
    pcfg = PPOConfig(
        num_actions=env.num_actions, num_obs=env.num_obs,
        num_states=env.num_states, num_envs=num_envs,
        horizon_length=4, minibatch_size=8, mini_epochs=2, units=(32, 32),
    )
    learner = PPOLearner(pcfg, env.step_fn, seed=seed, axis_name=DATA_AXIS)
    mesh = make_mesh()
    env.axis_name = DATA_AXIS
    env_state, obs = make_sharded_reset(env, mesh)(jax.random.key(seed))
    step = make_sharded_train_step(learner, mesh, env_state, obs)
    ppo = replicate_pytree(learner.init_state(), mesh)
    metrics = None
    for _ in range(iters):
        ppo, env_state, obs, metrics, _ = step(ppo, env_state, obs)
    assert np.isfinite(float(metrics["kl"])), "sharded training produced NaN"
    leaves = jax.tree_util.tree_flatten_with_path(ppo.params)[0]
    params = {
        jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
        for path, leaf in leaves
    }
    return params, {k: float(v) for k, v in metrics.items()}


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out, ndev, iters = (
        sys.argv[3], sys.argv[4], int(sys.argv[5]), int(sys.argv[6])
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    import numpy as np

    params, metrics = run_training(iters)
    if pid == 0:
        np.savez(out, **params)
        print(f"worker0: kl={metrics['kl']:.6f}")
    return 0


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.exit(main())
