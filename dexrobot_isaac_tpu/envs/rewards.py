"""Common reward terms + weighted aggregation.

TPU-native re-design of the reference's `RewardCalculator`
(dexhand_env/components/reward/reward_calculator.py:66-275): the ten built-in
exponential shaping terms and the weighted sum where a weight of 0 skips the
term entirely. Stateful prev-velocity/contact tracking becomes explicit state
threaded through the step function.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from dexrobot_isaac_tpu.constants import NUM_BASE_DOFS


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """Static reward weights; term order is fixed for stable jit structure."""

    weights: Dict[str, float]
    finger_lower_limits: jnp.ndarray  # (20,)
    finger_upper_limits: jnp.ndarray  # (20,)


def compute_common_reward_terms(
    cfg: RewardConfig,
    obs_dict: Dict[str, jnp.ndarray],
    dof_pos: jnp.ndarray,        # (N, 26)
    dof_vel: jnp.ndarray,        # (N, 26) manual velocities
    hand_vel: jnp.ndarray,       # (N, 3) palm linear velocity
    hand_ang_vel: jnp.ndarray,   # (N, 3)
    prev_finger_dof_vel: jnp.ndarray,  # (N, 20)
    prev_hand_vel: jnp.ndarray,        # (N, 3)
    prev_hand_ang_vel: jnp.ndarray,    # (N, 3)
    prev_contacts: jnp.ndarray,        # (N, n_contact) bool
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """The 10 common terms (reward_calculator.py:66-221).

    Returns (rewards, new_tracking_state) where new_tracking_state holds the
    prev_* buffers for the next step.
    """
    n = dof_pos.shape[0]
    finger_vel = dof_vel[:, NUM_BASE_DOFS:]
    finger_pos = dof_pos[:, NUM_BASE_DOFS:]
    rewards: Dict[str, jnp.ndarray] = {}

    rewards["alive"] = jnp.ones(n, dtype=dof_pos.dtype)

    # height safety: penalize fingertips close to the ground (min height 2 cm)
    tips = obs_dict["fingertip_poses_world"].reshape(n, 5, 7)
    min_tip_height = jnp.min(tips[:, :, 2], axis=1)
    rewards["height_safety"] = jnp.clip(
        1.0 - jnp.exp(-(min_tip_height - 0.02) * 20.0), 0.0, 1.0
    )

    rewards["finger_velocity"] = jnp.exp(-0.1 * jnp.linalg.norm(finger_vel, axis=1))
    rewards["hand_velocity"] = jnp.exp(-0.2 * jnp.linalg.norm(hand_vel, axis=1))
    rewards["hand_angular_velocity"] = jnp.exp(
        -0.2 * jnp.linalg.norm(hand_ang_vel, axis=1)
    )

    # joint limit penalty on finger joints within 10% of their limits
    rng = cfg.finger_upper_limits - cfg.finger_lower_limits
    normalized = jnp.where(
        rng > 0,
        2.0 * (finger_pos - cfg.finger_lower_limits) / jnp.where(rng > 0, rng, 1.0)
        - 1.0,
        0.0,
    )
    over = jnp.clip(jnp.abs(normalized) - 0.8, 0.0, 1.0)
    rewards["joint_limit"] = 1.0 - jnp.sum(over, axis=1) / finger_pos.shape[1]

    rewards["finger_acceleration"] = jnp.exp(
        -2.0 * jnp.linalg.norm(finger_vel - prev_finger_dof_vel, axis=1)
    )
    rewards["hand_acceleration"] = jnp.exp(
        -0.5 * jnp.linalg.norm(hand_vel - prev_hand_vel, axis=1)
    )
    rewards["hand_angular_acceleration"] = jnp.exp(
        -0.5 * jnp.linalg.norm(hand_ang_vel - prev_hand_ang_vel, axis=1)
    )

    # contact stability: penalize contact-state flips (threshold 0.1 N)
    cf = obs_dict["contact_forces"]
    n_bodies = cf.shape[1] // 3
    contacts = jnp.linalg.norm(cf.reshape(n, n_bodies, 3), axis=2) > 0.1
    changes = jnp.sum(jnp.logical_xor(contacts, prev_contacts), axis=1).astype(
        dof_pos.dtype
    )
    rewards["contact_stability"] = jnp.exp(-changes)

    tracking = {
        "prev_finger_dof_vel": finger_vel,
        "prev_hand_vel": hand_vel,
        "prev_hand_ang_vel": hand_ang_vel,
        "prev_contacts": contacts,
    }
    return rewards, tracking


def compute_total_reward(
    cfg: RewardConfig,
    common_rewards: Dict[str, jnp.ndarray],
    task_rewards: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum; weight 0 => skipped; logs raw + `_weighted` components
    (reward_calculator.py:223-275)."""
    all_rewards = {**common_rewards, **task_rewards}
    first = next(iter(all_rewards.values()))
    total = jnp.zeros_like(first)
    components: Dict[str, jnp.ndarray] = {}
    for name in sorted(all_rewards):
        weight = cfg.weights.get(name, 0.0)
        if weight != 0.0:
            weighted = all_rewards[name] * weight
            total = total + weighted
            components[name] = all_rewards[name]
            components[f"{name}_weighted"] = weighted
    components["total"] = total
    return total, components
