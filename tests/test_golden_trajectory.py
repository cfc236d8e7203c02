"""Default-CI check against the TPU-recorded golden trajectory.

The golden file was produced by the PRODUCTION Mosaic fused kernel on real
TPU hardware (tools/record_golden.py). Replaying the identical scenario
here on CPU through (a) the hybrid fused backend — the exact kernel lane
math without Mosaic — and (b) the XLA reference step pins all three paths
to the recorded TPU behavior: the suite cannot go green while any of them
diverges from the production kernel (CLAUDE.md invariant: the fused kernel
must match the jnp engine — change both together, then re-record on TPU).

Tolerances are Mosaic-vs-XLA f32 op-ordering noise amplified over 12 control
steps of stiff contact dynamics (the same budget as the TPU-gated
pallas-vs-hybrid parity test, tests/test_fused_step.py atol=2e-4).
"""

import os

import numpy as np
import pytest

from tests import golden_scenario as gs

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), gs.GOLDEN)


@pytest.fixture(scope="module")
def golden():
    assert os.path.isfile(GOLDEN_PATH), (
        "golden trajectory missing — record on TPU: python tools/record_golden.py"
    )
    return dict(np.load(GOLDEN_PATH, allow_pickle=False))


@pytest.fixture(scope="module")
def env_actions():
    return gs.make_env_and_actions()


def _compare(got, golden, atol_obs, atol_rew):
    np.testing.assert_array_equal(
        got["done"], golden["done"], err_msg="done mask diverged from golden"
    )
    np.testing.assert_allclose(
        got["obs"], golden["obs"], rtol=0, atol=atol_obs, err_msg="obs"
    )
    np.testing.assert_allclose(
        got["rew"], golden["rew"], rtol=0, atol=atol_rew, err_msg="reward"
    )
    np.testing.assert_allclose(
        got["comp"], golden["comp"], rtol=0, atol=atol_rew,
        err_msg="reward components",
    )


class TestGoldenTrajectory:
    def test_hybrid_fused_matches_tpu_golden(self, golden, env_actions):
        env, actions = env_actions
        got = gs.run_fused(env, actions, backend="hybrid")
        _compare(got, golden, atol_obs=2e-4, atol_rew=1e-3)

    def test_xla_reference_matches_tpu_golden(self, golden, env_actions):
        env, actions = env_actions
        got = gs.run_xla_reference(env, actions)
        _compare(got, golden, atol_obs=2e-4, atol_rew=1e-3)
