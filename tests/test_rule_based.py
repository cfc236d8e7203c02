"""Rule-based controller tests (non-policy DOF groups)."""

import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.envs.rule_based import (
    adaptive_grasp,
    circular_base_motion,
    make_pre_action_rule,
)


def _obs(t, contact=None):
    n = len(t)
    return {
        "episode_time": jnp.asarray(t, dtype=jnp.float32)[:, None],
        "contact_binary": (
            jnp.zeros((n, 5)) if contact is None else jnp.asarray(contact)
        ),
    }


class TestCircularBase:
    def test_starts_at_origin_offset(self):
        rule = make_pre_action_rule(
            base_controller=circular_base_motion(radius=0.1, period=4.0)
        )
        targets = jnp.zeros((2, 18))
        out = rule(targets, _obs([0.0, 0.0]))
        # at t=0: x = r*cos(0) - r = 0, y = 0
        np.testing.assert_allclose(np.asarray(out[:, :2]), 0.0, atol=1e-6)

    def test_quarter_period(self):
        rule = make_pre_action_rule(
            base_controller=circular_base_motion(radius=0.1, period=4.0)
        )
        out = rule(jnp.zeros((1, 18)), _obs([1.0]))  # quarter turn
        np.testing.assert_allclose(float(out[0, 0]), -0.1, atol=1e-6)
        np.testing.assert_allclose(float(out[0, 1]), 0.1, atol=1e-6)

    def test_fingers_untouched(self):
        rule = make_pre_action_rule(
            base_controller=circular_base_motion()
        )
        prev = jnp.ones((1, 18)) * 0.5
        out = rule(prev, _obs([2.0]))
        np.testing.assert_allclose(np.asarray(out[0, 6:]), 0.5, atol=1e-6)


class TestAdaptiveGrasp:
    def test_closes_without_contact(self):
        rule = make_pre_action_rule(finger_controller=adaptive_grasp())
        prev = jnp.zeros((2, 18))
        out = rule(prev, _obs([0.0, 0.0]))
        fingers = np.asarray(out[:, 6:])
        assert (fingers[:, [0, 1, 2]] > 0).all(), "uncontacted fingers close"
        np.testing.assert_allclose(fingers[:, 3], 0.0)  # spread stays

    def test_holds_on_contact(self):
        rule = make_pre_action_rule(finger_controller=adaptive_grasp())
        prev = jnp.zeros((1, 18))
        contact = np.zeros((1, 5))
        contact[0, 0] = 1.0  # thumb in contact
        out = rule(prev, _obs([0.0], contact))
        fingers = np.asarray(out[0, 6:])
        np.testing.assert_allclose(fingers[0], 0.0, atol=1e-7)  # thumb holds
        assert fingers[4] > 0  # index keeps closing
