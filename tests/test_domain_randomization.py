"""Domain randomization: per-env physics parameter scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.factory import make_env
from dexrobot_isaac_tpu.physics.types import DRSample
from dexrobot_isaac_tpu.utils.config import load_config


class TestDRSample:
    def test_nominal(self):
        dr = DRSample.nominal(4)
        np.testing.assert_allclose(np.asarray(dr.kp_scale), 1.0)

    def test_sample_ranges(self):
        dr = DRSample.sample(
            jax.random.key(0), 64,
            {"kp_scale": (0.8, 1.2), "friction_scale": (0.5, 1.5)},
        )
        kp = np.asarray(dr.kp_scale)
        assert kp.min() >= 0.8 and kp.max() <= 1.2
        assert kp.std() > 0.01
        # unlisted fields stay nominal
        np.testing.assert_allclose(np.asarray(dr.box_mass_scale), 1.0)


class TestDREnv:
    @pytest.fixture(scope="class")
    def env(self):
        cfg = load_config([
            "task=BlindGrasping", "numEnvs=2", "env.episodeLength=6",
            "task.domain_randomization.enabled=true",
            "task.domain_randomization.kp_scale=[0.7,1.3]",
            "task.domain_randomization.box_mass_scale=[0.5,2.0]",
        ])
        return make_env(cfg)

    def test_dr_enabled_and_varied(self, env):
        env.reset()
        kp = np.asarray(env.state.dr.kp_scale)
        assert kp.shape == (2,)
        assert not np.allclose(kp, 1.0)
        assert 0.7 <= kp.min() and kp.max() <= 1.3

    def test_dr_resampled_on_reset(self, env):
        env.reset()
        before = np.asarray(env.state.dr.kp_scale).copy()
        a = jnp.zeros((2, 18))
        for _ in range(8):  # episodeLength=6 forces a timeout reset
            env.step(a)
        after = np.asarray(env.state.dr.kp_scale)
        assert not np.allclose(before, after), "DR must resample on reset"
        assert 0.7 <= after.min() and after.max() <= 1.3

    def test_step_finite_under_dr(self, env):
        env.reset()
        a = jnp.full((2, 18), 0.5)
        obs, rew, done, _ = env.step(a)
        assert bool(jnp.isfinite(obs).all()) and bool(jnp.isfinite(rew).all())
