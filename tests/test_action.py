"""Action pipeline unit tests: scaling math, rules, filters, coupling.

Mirrors the reference's action-to-DOF verification strategy
(examples/dexhand_test.py:1159-1409): action-space sizing vs control flags,
both control modes, velocity/position clamps, and the 18->26 coupling
(pinky spread 2x, r_f_joint3_1 pinned at 0).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.constants import DOF_INDEX, NUM_DOFS
from dexrobot_isaac_tpu.envs import action as am
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model

CONTROL_DT = 0.02


@pytest.fixture(scope="module")
def model():
    return build_hand_model()


def make_pl(model, mode="position", base=True, fingers=True):
    return am.build_action_pipeline(
        model, mode, CONTROL_DT,
        policy_controls_base=base, policy_controls_fingers=fingers,
        max_base_linear_velocity=0.5, max_base_angular_velocity=1.5,
        max_finger_joint_velocity=1.0,
    )


class TestSizing:
    def test_action_space_18(self, model):
        assert make_pl(model).num_actions == 18

    def test_action_space_12(self, model):
        assert make_pl(model, base=False).num_actions == 12

    def test_action_space_6(self, model):
        assert make_pl(model, fingers=False).num_actions == 6


class TestScalingMath:
    def test_scale_to_limits_endpoints(self):
        lo, hi = jnp.array([0.0]), jnp.array([0.3])
        np.testing.assert_allclose(am.scale_to_limits(jnp.array([-1.0]), lo, hi), [0.0])
        np.testing.assert_allclose(am.scale_to_limits(jnp.array([1.0]), lo, hi), [0.3])
        np.testing.assert_allclose(
            am.scale_to_limits(jnp.array([0.0]), lo, hi), [0.15]
        )

    def test_velocity_clamp(self):
        out = am.apply_velocity_clamp(
            jnp.array([1.0]), jnp.array([0.0]), jnp.array([0.1])
        )
        np.testing.assert_allclose(out, [0.1])


class TestCoupling:
    def test_coupling_shapes_and_pinky_2x(self, model):
        pl = make_pl(model)
        active = jnp.zeros((1, 18)).at[0, 6 + 3].set(0.2)  # spread control
        full = am.apply_coupling(pl, active)
        assert full.shape == (1, NUM_DOFS)
        assert abs(float(full[0, DOF_INDEX["r_f_joint2_1"]]) - 0.2) < 1e-6
        assert abs(float(full[0, DOF_INDEX["r_f_joint4_1"]]) - 0.2) < 1e-6
        assert abs(float(full[0, DOF_INDEX["r_f_joint5_1"]]) - 0.4) < 1e-6  # 2x

    def test_joint3_1_pinned_zero(self, model):
        pl = make_pl(model)
        active = jnp.ones((1, 18))
        full = am.apply_coupling(pl, active)
        assert float(full[0, DOF_INDEX["r_f_joint3_1"]]) == 0.0

    def test_dip_coupling(self, model):
        pl = make_pl(model)
        active = jnp.zeros((1, 18)).at[0, 6 + 5].set(0.7)  # index DIP control
        full = am.apply_coupling(pl, active)
        assert abs(float(full[0, DOF_INDEX["r_f_joint2_3"]]) - 0.7) < 1e-6
        assert abs(float(full[0, DOF_INDEX["r_f_joint2_4"]]) - 0.7) < 1e-6

    def test_base_passthrough(self, model):
        pl = make_pl(model)
        active = jnp.zeros((1, 18)).at[0, 2].set(0.5)
        full = am.apply_coupling(pl, active)
        assert abs(float(full[0, DOF_INDEX["ARTz"]]) - 0.5) < 1e-6

    def test_extract_inverse_of_coupling(self, model):
        pl = make_pl(model)
        active = jnp.asarray(np.random.default_rng(0).uniform(0, 0.3, (2, 18)))
        full = am.apply_coupling(pl, active)
        back = am.extract_active_targets(pl, full)
        np.testing.assert_allclose(back, active, atol=1e-6)


class TestRules:
    def test_position_mode_scales_to_limits(self, model):
        pl = make_pl(model, "position")
        actions = jnp.ones((1, 18))
        prev = jnp.zeros((1, 18))
        # velocity clamp limits per-step delta even in position mode
        full, active = am.process_actions(pl, actions, prev, prev)
        max_d = np.asarray(pl.max_deltas)
        np.testing.assert_allclose(np.asarray(active[0]), np.minimum(
            np.asarray(pl.active_upper), max_d), atol=1e-5)

    def test_position_delta_mode(self, model):
        pl = make_pl(model, "position_delta")
        prev = jnp.zeros((1, 18))
        actions = jnp.full((1, 18), 0.5)
        full, active = am.process_actions(pl, actions, prev, prev)
        expected = np.minimum(
            0.5 * np.asarray(pl.max_deltas), np.asarray(pl.active_upper)
        )
        expected = np.maximum(expected, np.asarray(pl.active_lower))
        np.testing.assert_allclose(np.asarray(active[0]), expected, atol=1e-5)

    def test_position_delta_respects_limits(self, model):
        pl = make_pl(model, "position_delta")
        prev = jnp.tile(pl.active_upper[None], (1, 1))
        actions = jnp.ones((1, 18))
        _, active = am.process_actions(pl, actions, prev, prev)
        assert np.all(np.asarray(active) <= np.asarray(pl.active_upper) + 1e-6)

    def test_fingers_only_mode(self, model):
        pl = make_pl(model, "position_delta", base=False)
        prev = jnp.zeros((1, 18))
        actions = jnp.full((1, 12), 1.0)
        _, active = am.process_actions(pl, actions, prev, prev)
        # base part untouched (rule targets preserved)
        np.testing.assert_allclose(np.asarray(active[0, :6]), np.zeros(6), atol=1e-6)
        assert np.all(np.asarray(active[0, 6:]) > 0)

    def test_rule_targets_preserved_for_uncontrolled(self, model):
        pl = make_pl(model, "position", base=False)
        rule = jnp.zeros((1, 18)).at[0, 2].set(0.3)
        prev = rule
        actions = jnp.zeros((1, 12))
        _, active = am.process_actions(pl, actions, prev, rule)
        assert abs(float(active[0, 2]) - 0.3) < 1e-6
