"""Deployment export round-trips: npz/NumpyPolicy and TorchScript actors
must reproduce `PPOLearner.act_deterministic` bit-for-bit-close on both the
symmetric shared-trunk network and the asymmetric actor-critic."""

import os

import numpy as np
import pytest

import jax

from dexrobot_isaac_tpu.rl.checkpoint import save_checkpoint
from dexrobot_isaac_tpu.rl.export import (
    NumpyPolicy,
    export_npz,
    export_torchscript,
)
from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner

NUM_OBS, NUM_ACT, NUM_STATES, NUM_ENVS = 12, 4, 3, 8


def dummy_env_step(state, actions):
    key, obs = state
    key, sub = jax.random.split(key)
    new_obs = jax.random.normal(sub, obs.shape)
    import jax.numpy as jnp

    reward = -jnp.sum(actions**2, axis=-1)
    done = jnp.zeros(obs.shape[0], dtype=bool)
    return (key, new_obs), new_obs, reward, done, {"timeout": done}


def make_ckpt(tmp_path, num_states):
    cfg = PPOConfig(
        num_actions=NUM_ACT, num_obs=NUM_OBS, num_states=num_states,
        num_envs=NUM_ENVS, horizon_length=4, minibatch_size=8,
        mini_epochs=1, units=(16, 16),
    )
    learner = PPOLearner(cfg, dummy_env_step, seed=3)
    st = learner.init_state()
    # non-trivial normalization stats so the export path is actually tested
    import dataclasses

    import jax.numpy as jnp

    rms = st.obs_rms
    width = NUM_OBS + num_states
    rms = dataclasses.replace(
        rms,
        mean=jnp.linspace(-1.0, 1.0, width),
        var=jnp.linspace(0.5, 2.0, width),
    )
    st = dataclasses.replace(st, obs_rms=rms)
    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, st, {"iteration": 1})
    return learner, st, path


@pytest.mark.parametrize("num_states", [0, NUM_STATES])
class TestExportRoundtrip:
    def test_npz_matches_act_deterministic(self, tmp_path, num_states):
        learner, st, ckpt = make_ckpt(tmp_path, num_states)
        out = export_npz(ckpt, str(tmp_path / "policy.npz"))
        policy = NumpyPolicy.load(out)
        assert policy.num_obs == NUM_OBS

        obs = np.random.default_rng(0).normal(
            size=(5, NUM_OBS + num_states)
        ).astype(np.float32)
        ref = np.asarray(learner.act_deterministic(st, obs))
        np.testing.assert_allclose(policy(obs), ref, atol=1e-5)
        # deployment passes only the policy slice — identical result
        np.testing.assert_allclose(
            policy(obs[:, :NUM_OBS]), ref, atol=1e-5
        )

    def test_torchscript_matches(self, tmp_path, num_states):
        import torch

        learner, st, ckpt = make_ckpt(tmp_path, num_states)
        out = export_torchscript(ckpt, str(tmp_path / "policy.pt"))
        module = torch.jit.load(out)

        obs = np.random.default_rng(1).normal(
            size=(5, NUM_OBS + num_states)
        ).astype(np.float32)
        ref = np.asarray(learner.act_deterministic(st, obs))
        got = module(torch.from_numpy(obs)).detach().numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cli(tmp_path):
    from dexrobot_isaac_tpu.rl.export import main

    _, _, ckpt = make_ckpt(tmp_path, 0)
    assert main([ckpt]) == 0
    assert (tmp_path / "ckpt.npz").exists()
    assert main([ckpt, "--format", "torchscript"]) == 0
    assert (tmp_path / "ckpt.pt").exists()
    assert main([ckpt, "--format", "bin"]) == 0
    assert (tmp_path / "ckpt.bin").exists()


# ----------------------------------------------------------------------
# native C++ runtime (native/policy_runtime) parity via ctypes
# ----------------------------------------------------------------------
def _build_native_runtime(tmp_path):
    import shutil
    import subprocess

    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    src = os.path.join(os.path.dirname(__file__), "..", "native",
                       "policy_runtime")
    build = tmp_path / "build"
    subprocess.run(
        ["cmake", "-S", src, "-B", str(build)], check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(build)], check=True, capture_output=True
    )
    return str(build / "libdex_policy.so")


@pytest.mark.parametrize("num_states", [0, NUM_STATES])
def test_cpp_runtime_matches(tmp_path, num_states):
    import ctypes

    from dexrobot_isaac_tpu.rl.export import export_flat_binary

    learner, st, ckpt = make_ckpt(tmp_path, num_states)
    bin_path = export_flat_binary(ckpt, str(tmp_path / "policy.bin"))
    lib_path = _build_native_runtime(tmp_path)

    lib = ctypes.CDLL(lib_path)
    lib.dex_policy_load.restype = ctypes.c_void_p
    lib.dex_policy_load.argtypes = [ctypes.c_char_p]
    lib.dex_policy_act.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dex_policy_num_obs.argtypes = [ctypes.c_void_p]
    lib.dex_policy_num_actions.argtypes = [ctypes.c_void_p]
    lib.dex_policy_free.argtypes = [ctypes.c_void_p]

    handle = lib.dex_policy_load(bin_path.encode())
    assert handle, "dex_policy_load failed"
    try:
        assert lib.dex_policy_num_obs(handle) == NUM_OBS
        assert lib.dex_policy_num_actions(handle) == NUM_ACT

        obs = np.random.default_rng(2).normal(
            size=(5, NUM_OBS)
        ).astype(np.float32)
        full = np.concatenate(
            [obs, np.zeros((5, num_states), np.float32)], axis=1
        )
        ref = np.asarray(learner.act_deterministic(st, full))

        out = np.empty((5, NUM_ACT), np.float32)
        rc = lib.dex_policy_act(
            handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 5,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert rc == 0
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        lib.dex_policy_free(handle)
