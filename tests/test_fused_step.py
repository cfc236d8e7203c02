"""Parity tests for the fused env-step kernel (envs/fused_step.py).

Strategy (mirrors the physics-kernel strategy in test_pallas_step.py):
the fused kernel body is plain jnp over lane arrays, so it traces OUTSIDE
pallas. The "hybrid" backend runs that exact body under array write-shims
with physics delegated to the env's own `_control_step` — physics inputs are
then bitwise identical to the XLA reference step (envs/dexhand.py step_fn),
so these tests isolate everything the fused kernel adds: the action
pipeline, observation, task lane_step, termination, reward, and
masked-reset-merge lane math, plus the FusedEnvState packing.

The full pallas kernel (lane physics included) shares its physics lanes with
the parity-tested physics kernel (build_lane_sim) and is covered end-to-end
by the TPU-gated test at the bottom (DEXHAND_TPU_TESTS=1).

Episode lengths are kept short so several auto-resets (the done-masked merge
path) happen inside each trajectory.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.fused_step import FusedUnsupported
from dexrobot_isaac_tpu.factory import make_env
from dexrobot_isaac_tpu.utils.config import load_config

_TPU = os.environ.get("DEXHAND_TPU_TESTS") == "1"


def _np(x):
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(x))
    return np.asarray(x)


def _assert_state_close(a, b, atol):
    def cmp(path, x, y):
        x, y = _np(x), _np(y)
        if x.dtype == bool or np.issubdtype(x.dtype, np.integer):
            np.testing.assert_array_equal(x, y, err_msg=str(path))
        else:
            np.testing.assert_allclose(x, y, rtol=0, atol=atol, err_msg=str(path))

    jax.tree.map_with_path(cmp, a, b)


def _run_parity(task, steps, backend, atol=1e-5, overrides=()):
    cfg = load_config(
        [f"task={task}", "numEnvs=4", "env.episodeLength=6", *overrides]
    )
    env = make_env(cfg)
    fused = env.make_fused(backend=backend)

    state, _ = env.reset_fn(jax.random.key(11))
    fs = fused.pack(state)
    _assert_state_close(state, fused.unpack(fs), atol=0)

    step_x = jax.jit(env.step_fn)
    step_f = jax.jit(fused.step_fn)
    akey = jax.random.key(5)
    saw_done = False
    for i in range(steps):
        akey, k = jax.random.split(akey)
        a = jax.random.uniform(k, (4, env.num_actions), minval=-1.0, maxval=1.0)
        state, obs_x, rew_x, done_x, ex_x = step_x(state, a)
        fs, obs_f, rew_f, done_f, ex_f = step_f(fs, a)
        np.testing.assert_allclose(
            _np(obs_x), _np(obs_f), rtol=0, atol=atol, err_msg=f"obs step {i}"
        )
        np.testing.assert_allclose(
            _np(rew_x), _np(rew_f), rtol=0, atol=atol, err_msg=f"rew step {i}"
        )
        np.testing.assert_array_equal(_np(done_x), _np(done_f))
        saw_done = saw_done or bool(done_x.any())
        # extras: masks + packed components vs the reference component dict
        for key in ("success", "failure", "timeout"):
            np.testing.assert_array_equal(
                _np(ex_x[key]), _np(ex_f[key]), err_msg=f"{key} step {i}"
            )
        packed_x = jnp.stack(
            [ex_x["reward_components"][k] for k in fused.comp_names], axis=-1
        )
        np.testing.assert_allclose(
            _np(packed_x), _np(ex_f["reward_components_packed"]),
            rtol=0, atol=atol, err_msg=f"components step {i}",
        )
    assert saw_done, "trajectory must cross auto-resets to test the merge"
    _assert_state_close(state, fused.unpack(fs), atol=atol)


class TestHybridParity:
    """Post-physics lane math vs the XLA reference step, on CPU."""

    def test_base_task(self):
        _run_parity("BaseTask", steps=9, backend="hybrid")

    def test_blind_grasping(self):
        _run_parity("BlindGrasping", steps=9, backend="hybrid")

    def test_box_pushing(self):
        # exercises the sampled reset-task-state rows (target_xy reaches
        # the kernel through ctx.reset_ts)
        _run_parity("BoxPushing", steps=9, backend="hybrid")

    def test_box_reorientation(self):
        _run_parity("BoxReorientation", steps=9, backend="hybrid")

    def test_in_hand_reorientation(self):
        _run_parity("InHandReorientation", steps=9, backend="hybrid")

    def test_box_stacking(self):
        # multi-object scene: exercises the kernel's box2 state lanes,
        # box2 reset rows, and the 6-lane boxf split (fused_step.py has_box2)
        _run_parity("BoxStacking", steps=9, backend="hybrid")

    def test_blind_grasping_clearance_shaping(self):
        # under_box_penalty is weight-0 (skipped at trace time) in the stock
        # config; activate it so the lane twin participates in the reward sum
        _run_parity(
            "BlindGrasping", steps=9, backend="hybrid",
            overrides=("task.reward_weights.under_box_penalty=-150.0",),
        )


class TestSupportChecks:
    def test_task_without_lane_step_is_refused(self):
        cfg = load_config(["task=BlindGrasping", "numEnvs=2"])
        env = make_env(cfg)
        lane = type(env.comps.task).lane_step
        try:
            del type(env.comps.task).lane_step  # looks like no override
            with pytest.raises(FusedUnsupported):
                env.make_fused(backend="hybrid")
        finally:
            type(env.comps.task).lane_step = lane


class TestFusedTraining:
    """The fused step as the PPO learner's env_step (train.py wiring): the
    packed reward-components passthrough in _slim_extras plus a full
    train_iteration over FusedEnvState carries."""

    def test_train_iteration_on_fused_step(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown
        from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner

        cfg = load_config(
            ["task=BlindGrasping", "numEnvs=4", "env.episodeLength=6"]
        )
        env = make_env(cfg)
        fused = env.make_fused(backend="hybrid")
        ppo_cfg = PPOConfig(
            num_actions=env.num_actions,
            num_obs=env.num_obs,
            num_states=env.num_states,
            num_envs=env.num_envs,
            horizon_length=4,
            minibatch_size=8,
            mini_epochs=1,
        )
        learner = PPOLearner(ppo_cfg, fused.step_fn, seed=0)
        learner.comp_names = fused.comp_names
        ppo = learner.init_state()
        fs, obs = fused.reset(jax.random.key(0))
        for _ in range(2):
            ppo, fs, obs, metrics, extras = learner.train_iteration(
                ppo, fs, obs
            )
        assert np.isfinite(float(metrics["kl"]))
        assert extras["reward_components_packed"].shape == (
            4, env.num_envs, len(fused.comp_names)
        )
        # the device-side breakdown reducer accepts the packed extras
        bd = DeviceBreakdown.create(extras, comp_names=learner.comp_names)
        bd.update(extras)
        stats = bd.fetch_and_reset()
        assert set(stats["comp_sum"].keys()) == set(learner.comp_names)


if _TPU:
    # Opt-in hardware re-run (DEXHAND_TPU_TESTS=1): the real Mosaic kernel
    # vs the XLA reference, live on the chip. Generated conditionally (not
    # skipif) so the default CPU suite reports zero skips: the default-CI
    # Mosaic coverage is the recorded golden trajectory
    # (tests/test_golden_trajectory.py) plus the xla-backend kernel-body
    # parity (tests/test_pallas_step.py).
    class TestPallasFusedParity:
        """The real fused kernel (lane physics + post-physics) on hardware."""

        def test_blind_grasping_pallas(self):
            _run_parity("BlindGrasping", steps=9, backend="pallas", atol=2e-4)
