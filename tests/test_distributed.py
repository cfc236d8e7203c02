"""Multi-process (multi-host-shaped) distributed training tests.

The reference has no distributed code at all (SURVEY §2.9/§5.8: single
process, single GPU, `multi_gpu: False`) — this is the TPU-native multi-host
path it lacks, validated without a pod: 2 OS processes x 4 virtual CPU
devices each join one jax.distributed cluster (gloo collectives) and train
over the same 8-shard global mesh the single-process suite uses.

Covers:
- per-process env construction (make_sharded_reset: each process
  materializes only its local slice of the global env batch)
- sharded train iterations with cross-process gradient/stat collectives
- equivalence: 2x4 multi-process == 1x8 single-process (identical seeds,
  shard identity = global device index), params compared after 3 iterations
- the train.py CLI launched unmodified as a multi-process job
  (JAX_COORDINATOR_ADDRESS env contract), checkpoint/TB writes on process 0
  only
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")
ITERS = 3


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("DEXHAND_TPU_TESTS", None)
    if extra:
        env.update(extra)
    return env


def _run_pair(cmds, envs, timeout=900):
    procs = [
        subprocess.Popen(
            c, env=e, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for c, e in zip(cmds, envs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


class TestShardedFused:
    """The fused env-step kernel composed with shard_map (the combination
    parallel/distributed.py exists for: pallas_call cannot be
    GSPMD-partitioned, so the kernel runs per shard on its local batch).
    Uses the hybrid backend — the exact fused lane math without the Mosaic
    compile — on the 8-device virtual CPU mesh."""

    @pytest.fixture(scope="class")
    def fused_env(self):
        import jax

        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config([
            "task=BlindGrasping", "numEnvs=16", "env.episodeLength=50",
            "sim.substeps=2",
        ])
        env = make_env(cfg, seed=3)
        fused = env.make_fused(backend="hybrid")
        return env, fused

    def test_sharded_fused_step_matches_single_program(self, fused_env):
        """fused.step_fn inside shard_map (local batch per shard) must
        produce bitwise the outputs of the single-program full-batch call
        while no resets fire (the shard-folded reset keys only feed the
        done-masked merge)."""
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dexrobot_isaac_tpu.parallel.distributed import _batch_specs
        from dexrobot_isaac_tpu.parallel.mesh import DATA_AXIS, make_mesh

        env, fused = fused_env
        n = env.num_envs
        state, _ = env.reset_fn(jax.random.key(3))
        fs = fused.pack(state)
        actions = jnp.zeros((n, env.num_actions), jnp.float32)

        env.axis_name = None
        out_single = jax.jit(fused.step_fn)(fs, actions)

        mesh = make_mesh()
        out_shapes = jax.eval_shape(fused.step_fn, fs, actions)
        out_specs = _batch_specs(out_shapes, n)
        in_specs = (_batch_specs(fs, n), P(DATA_AXIS))
        env.axis_name = DATA_AXIS
        try:
            sharded = jax.jit(shard_map(
                fused.step_fn, mesh=mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            ))
            out_sharded = sharded(fs, actions)
        finally:
            env.axis_name = None

        def cmp(path, a, b):
            if jax.dtypes.issubdtype(
                getattr(a, "dtype", None), jax.dtypes.prng_key
            ):
                a, b = jax.random.key_data(a), jax.random.key_data(b)
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
                np.testing.assert_array_equal(a, b, err_msg=str(path))
            else:
                # XLA fuses/reassociates differently for the (16,) single
                # program vs the (2,)-per-shard bodies: same math, float
                # noise only
                np.testing.assert_allclose(
                    a, b, rtol=0, atol=1e-4, err_msg=str(path)
                )

        jax.tree.map_with_path(cmp, out_single, out_sharded)

    def test_sharded_fused_train_iteration(self, fused_env):
        """Full sharded PPO iteration with the fused step: sharded reset ->
        pack -> make_sharded_train_step, finite KL on the virtual mesh."""
        import jax

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

        env, fused = fused_env
        mesh = make_mesh()
        pcfg = PPOConfig(
            num_actions=env.num_actions, num_obs=env.num_obs,
            num_states=env.num_states, num_envs=env.num_envs,
            horizon_length=4, minibatch_size=8, mini_epochs=2,
            units=(32, 32),
        )
        learner = PPOLearner(
            pcfg, fused.step_fn, seed=3, axis_name=DATA_AXIS
        )
        learner.comp_names = fused.comp_names
        env.axis_name = DATA_AXIS
        try:
            env_state, obs = make_sharded_reset(env, mesh)(jax.random.key(3))
            env_state = jax.jit(fused.pack)(env_state)
            step = make_sharded_train_step(learner, mesh, env_state, obs)
            ppo = replicate_pytree(learner.init_state(), mesh)
            ppo, env_state, obs, metrics, extras = step(ppo, env_state, obs)
            assert np.isfinite(float(metrics["kl"]))
            assert "reward_components_packed" in extras
        finally:
            env.axis_name = None


class TestMultiProcessTraining:
    def test_two_process_matches_single_process(self, tmp_path):
        """2 procs x 4 devices must reproduce the 1 proc x 8 devices run."""
        port = _free_port()
        out = str(tmp_path / "p0.npz")
        cmds = [
            [sys.executable, WORKER, str(pid), "2", str(port), out, "4",
             str(ITERS)]
            for pid in range(2)
        ]
        _run_pair(cmds, [_child_env(), _child_env()])
        got = dict(np.load(out))
        assert got, "worker 0 saved no params"

        # single-process comparator over the SAME 8-shard global mesh,
        # in-process (conftest provides the 8 virtual CPU devices)
        from tests._dist_worker import run_training

        ref, metrics = run_training(ITERS)
        assert set(got) == set(ref)
        for k in ref:
            # tolerance: cross-process (gloo) vs single-process (XLA)
            # all-reduce summation ORDER differs; the ~1e-4 float noise is
            # amplified by Adam + adaptive LR over the iterations. A
            # semantic divergence (different RNG stream, wrong collective,
            # desynced shards) shows up at O(1e-1) — orders above this.
            np.testing.assert_allclose(
                got[k], ref[k], rtol=0, atol=2e-3,
                err_msg=f"param {k} diverged between 2x4 and 1x8 runs",
            )

    def test_train_cli_multiprocess(self, tmp_path):
        """train.py is launchable unmodified as a multi-process job; run
        dirs/checkpoints are written by process 0 only."""
        port = _free_port()
        runs0 = tmp_path / "runs0"
        runs1 = tmp_path / "runs1"
        runs0.mkdir()
        runs1.mkdir()
        args = [
            sys.executable, "train.py", "device=cpu", "task=BaseTask",
            "numEnvs=16", "maxIterations=2", "env.episodeLength=8",
            "sim.substeps=1", "sim.physics_steps_per_control=2",
            "train.logging.noLogFile=true",
            "train.params.config.save_frequency=2",
            "train.params.network.units=[32,32]",
            "train.params.config.horizon_length=4",
            "train.params.config.minibatch_size=8",
            "train.params.config.mini_epochs=1",
        ]
        envs = [
            _child_env({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
                "DEXHAND_RUNS_DIR": str(runs0 if pid == 0 else runs1),
            })
            for pid in range(2)
        ]
        _run_pair([args, args], envs)
        # process 0 wrote the run + checkpoints
        runs_all = runs0 / "runs_all"
        assert runs_all.is_dir()
        run = sorted(os.listdir(runs_all))[-1]
        files = os.listdir(runs_all / run / "nn")
        assert "latest.ckpt" in files
        # process 1 wrote NOTHING into its runs dir
        assert not (runs1 / "runs_all").exists()
