"""Action processing pipeline: rules -> filters -> coupling -> DOF targets.

TPU-native re-design of the reference's action layer (SURVEY §2.3):
- `ActionProcessor.process_actions` (dexhand_env/components/action/action_processor.py:284-352)
- rule registry with pre-action rule, action rule, post-action filters
  (components/action/rules.py:78-190)
- default position / position_delta rules (components/action/default_rules.py:21-114)
- pure scaling math (components/action/scaling.py:27-99)
- 18 active targets -> 26 DOF coupling with the pinky-spread 2x scale and
  r_f_joint3_1 pinned at 0 (action_processor.py:570-614, constants.py:71-88)

Everything is a pure function over a static `ActionPipeline` config object;
all limit/coupling/max-delta tensors are precomputed at build time from the
model + task config + control_dt (the reference precomputes these in
`initialize_from_config` / `finalize_setup`, action_processor.py:181-267).

Action semantics timing parity: the pre-action rule is evaluated in
post-physics of step N-1 against that step's observations; its output
(`active_rule_targets`) is consumed by `process_actions` in step N's
pre-physics (reference step_processor.py:66-77, dexhand_base.py:864-877).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import (
    ACTIVE_FINGER_DOF_INDICES,
    DOF_INDEX,
    FINGER_COUPLING_MAP,
    NUM_ACTIVE_TARGETS,
    NUM_BASE_DOFS,
    NUM_DOFS,
)
from dexrobot_isaac_tpu.models.dexhand021 import HandModel

# rule signature: (active_prev_targets, active_rule_targets, actions, pipeline)
#                 -> active_targets, all (N, 18) except actions (N, num_actions)
ActionRule = Callable[..., jnp.ndarray]
# filter signature: (active_prev_targets, active_rule_targets, active_targets,
#                    pipeline) -> active_targets
PostActionFilter = Callable[..., jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class ActionPipeline:
    """Static action-pipeline configuration; closed over at trace time."""

    control_mode: str                 # "position" | "position_delta"
    policy_controls_base: bool
    policy_controls_fingers: bool
    num_actions: int
    active_lower: jnp.ndarray         # (18,)
    active_upper: jnp.ndarray         # (18,)
    max_deltas: jnp.ndarray           # (18,) control_dt * per-component vel limit
    # coupling gather/scatter (static): full DOF d takes
    # coupling_scale[d] * active[coupling_src[d]]; uncontrolled DOFs scale 0.
    coupling_src: jnp.ndarray         # (26,) int
    coupling_scale: jnp.ndarray       # (26,)
    post_action_filters: Tuple[str, ...] = ("velocity_clamp", "position_clamp")
    custom_action_rule: Optional[ActionRule] = None
    custom_filters: Tuple[PostActionFilter, ...] = ()


def build_action_pipeline(
    model: HandModel,
    control_mode: str,
    control_dt: float,
    policy_controls_base: bool = True,
    policy_controls_fingers: bool = True,
    max_base_linear_velocity: float = 0.5,
    max_base_angular_velocity: float = 1.5,
    max_finger_joint_velocity: float = 1.0,
    post_action_filters: Sequence[str] = ("velocity_clamp", "position_clamp"),
    custom_action_rule: Optional[ActionRule] = None,
    custom_filters: Sequence[PostActionFilter] = (),
) -> ActionPipeline:
    """Precompute the static pipeline tensors (mirrors initialize_from_config +
    finalize_setup; reference action_processor.py:181-267, :415-434)."""
    if control_mode not in ("position", "position_delta"):
        raise ValueError(f"Unknown control mode: {control_mode}")

    # active limits: base DOFs 0-5 + primary joint of each finger control
    active_idx = list(range(NUM_BASE_DOFS)) + ACTIVE_FINGER_DOF_INDICES
    lower = model.lower_limit[active_idx]
    upper = model.upper_limit[active_idx]

    max_deltas = control_dt * np.array(
        [max_base_linear_velocity] * 3
        + [max_base_angular_velocity] * 3
        + [max_finger_joint_velocity] * 12
    )

    # coupling scatter arrays
    src = np.zeros(NUM_DOFS, dtype=np.int32)
    scale = np.zeros(NUM_DOFS)
    for d in range(NUM_BASE_DOFS):  # base passthrough
        src[d] = d
        scale[d] = 1.0
    for control, pairs in FINGER_COUPLING_MAP.items():
        for joint, s in pairs:
            d = DOF_INDEX[joint]
            src[d] = NUM_BASE_DOFS + control
            scale[d] = s
    # r_f_joint3_1 and any unmapped DOF keep scale 0 => target pinned at 0

    num_actions = 6 * policy_controls_base + 12 * policy_controls_fingers

    return ActionPipeline(
        control_mode=control_mode,
        policy_controls_base=policy_controls_base,
        policy_controls_fingers=policy_controls_fingers,
        num_actions=num_actions,
        active_lower=np.asarray(lower, dtype=np.float32),
        active_upper=np.asarray(upper, dtype=np.float32),
        max_deltas=np.asarray(max_deltas, dtype=np.float32),
        coupling_src=np.asarray(src),
        coupling_scale=np.asarray(scale, dtype=np.float32),
        post_action_filters=tuple(post_action_filters),
        custom_action_rule=custom_action_rule,
        custom_filters=tuple(custom_filters),
    )


# ----------------------------------------------------------------------
# pure scaling math (parity: components/action/scaling.py)
# ----------------------------------------------------------------------
def scale_to_limits(actions, lower, upper):
    """[-1, 1] -> [lower, upper] affine map (scaling.py:27-45)."""
    return (actions + 1.0) * 0.5 * (upper - lower) + lower


def apply_velocity_deltas(prev_targets, actions, max_deltas):
    """prev + action * max_delta (scaling.py:47-63)."""
    return prev_targets + actions * max_deltas


def clamp_to_limits(targets, lower, upper):
    return jnp.clip(targets, lower, upper)


def apply_velocity_clamp(new_targets, prev_targets, max_deltas):
    """Clamp per-step target change to +/-max_delta (scaling.py:82-99)."""
    delta = jnp.clip(new_targets - prev_targets, -max_deltas, max_deltas)
    return prev_targets + delta


# ----------------------------------------------------------------------
# rules
# ----------------------------------------------------------------------
def _expand_policy_actions(pl: ActionPipeline, actions: jnp.ndarray):
    """Split the policy action vector into (base6 | None, finger12 | None)."""
    base = fingers = None
    ofs = 0
    if pl.policy_controls_base:
        base = actions[..., :6]
        ofs = 6
    if pl.policy_controls_fingers:
        fingers = actions[..., ofs:ofs + 12]
    return base, fingers


def position_action_rule(pl: ActionPipeline, active_prev, active_rule, actions):
    """Absolute position mode: scale [-1,1] to active limits
    (default_rules.py:21-66)."""
    targets = active_rule
    base, fingers = _expand_policy_actions(pl, actions)
    if base is not None:
        targets = targets.at[..., :6].set(
            scale_to_limits(base, pl.active_lower[:6], pl.active_upper[:6])
        )
    if fingers is not None:
        targets = targets.at[..., 6:].set(
            scale_to_limits(fingers, pl.active_lower[6:], pl.active_upper[6:])
        )
    return targets


def position_delta_action_rule(pl: ActionPipeline, active_prev, active_rule, actions):
    """Relative mode: prev + action * max_delta, clamped to limits
    (default_rules.py:68-114)."""
    targets = active_rule
    base, fingers = _expand_policy_actions(pl, actions)
    if base is not None:
        targets = targets.at[..., :6].set(
            apply_velocity_deltas(active_prev[..., :6], base, pl.max_deltas[:6])
        )
    if fingers is not None:
        targets = targets.at[..., 6:].set(
            apply_velocity_deltas(active_prev[..., 6:], fingers, pl.max_deltas[6:])
        )
    return clamp_to_limits(targets, pl.active_lower, pl.active_upper)


_BUILTIN_FILTERS = {
    # rules.py:141-166
    "velocity_clamp": lambda pl, prev, rule, t: apply_velocity_clamp(
        t, prev, pl.max_deltas
    ),
    # rules.py:168-190
    "position_clamp": lambda pl, prev, rule, t: clamp_to_limits(
        t, pl.active_lower, pl.active_upper
    ),
}


def apply_coupling(pl: ActionPipeline, active_targets: jnp.ndarray) -> jnp.ndarray:
    """18 active targets -> 26 full-DOF targets via static gather + scale
    (reference scatter loop, action_processor.py:570-614)."""
    return active_targets[..., pl.coupling_src] * pl.coupling_scale


def extract_active_targets(pl: ActionPipeline, full_dof: jnp.ndarray) -> jnp.ndarray:
    """Inverse of coupling for target re-sync on reset: base DOFs + primary
    finger joints (action_processor.py:616-666)."""
    idx = jnp.asarray(
        list(range(NUM_BASE_DOFS)) + ACTIVE_FINGER_DOF_INDICES
    )
    return full_dof[..., idx]


def unscale_actions(pl: ActionPipeline, active_targets: jnp.ndarray) -> jnp.ndarray:
    """Map active targets back into [-1, 1] action space (inverse of
    scale_to_limits; reference action_processor.py:721-756)."""
    rng = pl.active_upper - pl.active_lower
    safe = jnp.where(rng > 0, rng, 1.0)
    return jnp.where(
        rng > 0,
        (active_targets - pl.active_lower) / safe * 2.0 - 1.0,
        0.0,
    )


def process_actions(
    pl: ActionPipeline,
    actions: jnp.ndarray,           # (N, num_actions)
    active_prev_targets: jnp.ndarray,  # (N, 18)
    active_rule_targets: jnp.ndarray,  # (N, 18) from step N-1's pre-action rule
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full pre-physics action pipeline (action_processor.py:284-352).

    Returns (full_dof_targets (N, 26), new_active_prev_targets (N, 18)).
    """
    if pl.custom_action_rule is not None:
        targets = pl.custom_action_rule(
            pl, active_prev_targets, active_rule_targets, actions
        )
    elif pl.control_mode == "position":
        targets = position_action_rule(
            pl, active_prev_targets, active_rule_targets, actions
        )
    else:
        targets = position_delta_action_rule(
            pl, active_prev_targets, active_rule_targets, actions
        )

    for name in pl.post_action_filters:
        targets = _BUILTIN_FILTERS[name](
            pl, active_prev_targets, active_rule_targets, targets
        )
    for fn in pl.custom_filters:
        targets = fn(pl, active_prev_targets, active_rule_targets, targets)

    full = apply_coupling(pl, targets)
    return full, targets
