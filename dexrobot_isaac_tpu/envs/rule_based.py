"""Rule-based controllers for non-policy-controlled DOF groups.

Parity with the reference's RuleBasedController
(components/action/rule_based_controller.py:29-161) and the example
controllers in its test harness (circular base motion, adaptive grasp;
examples/dexhand_test.py:107-240): when `policy_controls_hand_base` or
`policy_controls_fingers` is false, user-registered callables produce the
targets for those segments. Here the controllers are pure functions wired in
as the task's pre-action rule, so their outputs flow through the exact same
filter/coupling pipeline as policy actions.

A controller has signature (t_seconds, obs_dict, targets_segment) ->
targets_segment, where t_seconds is per-env episode time.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

BaseController = Callable[[jnp.ndarray, Dict, jnp.ndarray], jnp.ndarray]


def make_pre_action_rule(
    base_controller: Optional[BaseController] = None,
    finger_controller: Optional[BaseController] = None,
):
    """Build a pre-action rule that overwrites the base (first 6) and/or
    finger (last 12) active-target segments with controller outputs."""

    def rule(active_prev_targets: jnp.ndarray, obs_dict: Dict) -> jnp.ndarray:
        t = obs_dict["episode_time"][:, 0]
        out = active_prev_targets
        if base_controller is not None:
            out = out.at[:, :6].set(
                base_controller(t, obs_dict, active_prev_targets[:, :6])
            )
        if finger_controller is not None:
            out = out.at[:, 6:].set(
                finger_controller(t, obs_dict, active_prev_targets[:, 6:])
            )
        return out

    return rule


def circular_base_motion(
    radius: float = 0.1, period: float = 4.0, z_amplitude: float = 0.0
) -> BaseController:
    """Base moves on a horizontal circle (reference harness's circular
    rule-based base controller, examples/dexhand_test.py:107-170)."""

    def controller(t, obs_dict, targets):
        phase = 2 * jnp.pi * t / period
        out = targets
        out = out.at[:, 0].set(radius * jnp.cos(phase) - radius)
        out = out.at[:, 1].set(radius * jnp.sin(phase))
        if z_amplitude:
            out = out.at[:, 2].set(z_amplitude * jnp.sin(phase))
        return out

    return controller


def adaptive_grasp(
    close_rate: float = 0.5, force_threshold: float = 1.0,
    control_dt: float = 0.02,
) -> BaseController:
    """Fingers close until their contact reports force (reference harness's
    adaptive grasp controller, examples/dexhand_test.py:171-240): each finger
    control advances while its fingertip feels no contact, and holds once the
    binary contact fires."""

    # finger-control index -> contact-sensor index (thumb, index, middle,
    # ring, pinky distal links); spread control (index 3) stays put
    import numpy as np
    control_to_finger = np.asarray([0, 0, 0, -1, 1, 1, 2, 2, 3, 3, 4, 4])

    def controller(t, obs_dict, targets):
        contact = obs_dict["contact_binary"]  # (N, 5)
        gate = jnp.where(
            control_to_finger < 0,
            jnp.zeros_like(contact[:, :1]),
            1.0 - contact[:, np.clip(control_to_finger, 0, 4)],
        )
        # advance close_rate rad/s per control step while no contact; pass
        # the env's actual control_dt for correct rates at non-default timing
        return targets + gate * close_rate * control_dt

    return controller
