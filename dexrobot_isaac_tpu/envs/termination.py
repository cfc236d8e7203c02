"""Termination evaluation: success / failure / timeout + one-time rewards.

TPU-native re-design of the reference's `TerminationManager`
(dexhand_env/components/termination/termination_manager.py:120-321) and the
built-in `hitting_ground` criterion assembled by the step processor
(components/step_processor.py:133-181). The reference's per-criterion
"reason" tracking (episode-scoped boolean masks) becomes explicit state
threaded through the step function and zeroed on reset.

Fail-fast parity: criteria named in `active_*_criteria` must be produced by
the builtin/task evaluators (termination_manager.py:98-118); this is checked
at build time since the criterion set is static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TerminationConfig:
    active_success_criteria: Tuple[str, ...]
    active_failure_criteria: Tuple[str, ...]
    max_episode_length: int
    success_reward: float          # reward_weights.termination_success
    failure_penalty: float         # reward_weights.termination_failure_penalty
    timeout_penalty: float         # reward_weights.termination_timeout_penalty
    # height-safety thresholds for the builtin hitting_ground criterion;
    # the criterion exists only when the task config has a height_safety
    # block (step_processor.py:140-165 creates it conditionally)
    handbase_threshold: float = 0.0
    fingertip_threshold: float = 0.0
    has_height_safety: bool = True
    # cap on the scalar consecutive-successes counter
    # (termination_manager.py:336-338; cfg/task/BaseTask.yaml:81)
    max_consecutive_successes: int = 50

    def validate(self, success_names, failure_names):
        """Fail fast if an active criterion has no implementation
        (termination_manager.py:98-118)."""
        for name in self.active_success_criteria:
            if name not in success_names:
                raise RuntimeError(
                    f"Success criterion '{name}' is active but not implemented "
                    f"(available: {sorted(success_names)})"
                )
        for name in self.active_failure_criteria:
            if name not in failure_names:
                raise RuntimeError(
                    f"Failure criterion '{name}' is active but not implemented "
                    f"(available: {sorted(failure_names)})"
                )


def builtin_failure_criteria(
    cfg: TerminationConfig, obs_dict: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """`hitting_ground`: hand base or any fingertip below threshold.
    Only produced when the task configures height_safety — the reference
    creates this criterion conditionally (step_processor.py:140-165)."""
    if not cfg.has_height_safety:
        return {}
    n = obs_dict["hand_pose"].shape[0]
    hand_z = obs_dict["hand_pose"][:, 2]
    tips = obs_dict["fingertip_poses_world"].reshape(n, 5, 7)
    min_tip = jnp.min(tips[:, :, 2], axis=1)
    return {
        "hitting_ground": (hand_z < cfg.handbase_threshold)
        | (min_tip < cfg.fingertip_threshold)
    }


def evaluate_termination(
    cfg: TerminationConfig,
    episode_step_count: jnp.ndarray,        # (N,)
    success_criteria: Dict[str, jnp.ndarray],
    failure_criteria: Dict[str, jnp.ndarray],
    success_reason_flags: Dict[str, jnp.ndarray],  # episode-scoped tracking
    failure_reason_flags: Dict[str, jnp.ndarray],
):
    """Mutually-exclusive success/failure/timeout masks, one-time termination
    rewards, per-reason tracking (termination_manager.py:120-321).

    Returns (should_reset, info, termination_reward, new_success_flags,
    new_failure_flags). `info` carries the same keys the reference exposes in
    extras: success/failure/timeout masks, rates, and per-reason masks.
    """
    active_success = {
        k: v for k, v in success_criteria.items()
        if not cfg.active_success_criteria or k in cfg.active_success_criteria
    }
    active_failure = {
        k: v for k, v in failure_criteria.items()
        if not cfg.active_failure_criteria or k in cfg.active_failure_criteria
    }

    n = episode_step_count.shape[0]
    episode_success = jnp.zeros(n, dtype=bool)
    new_success_flags = dict(success_reason_flags)
    for name in sorted(active_success):
        crit = active_success[name]
        new = ~episode_success & crit
        new_success_flags[name] = new | success_reason_flags.get(
            name, jnp.zeros(n, dtype=bool)
        )
        episode_success = episode_success | crit

    episode_failure = jnp.zeros(n, dtype=bool)
    new_failure_flags = dict(failure_reason_flags)
    for name in sorted(active_failure):
        crit = active_failure[name]
        new = ~episode_failure & crit
        new_failure_flags[name] = new | failure_reason_flags.get(
            name, jnp.zeros(n, dtype=bool)
        )
        episode_failure = episode_failure | crit

    timeout = episode_step_count >= cfg.max_episode_length - 1
    should_reset = episode_success | episode_failure | timeout

    success_term = episode_success & should_reset
    failure_term = episode_failure & ~episode_success & should_reset
    timeout_term = timeout & ~episode_success & ~episode_failure & should_reset

    f32 = jnp.float32
    termination_reward = (
        success_term.astype(f32) * cfg.success_reward
        - failure_term.astype(f32) * cfg.failure_penalty
        - timeout_term.astype(f32) * cfg.timeout_penalty
    )

    info: Dict[str, jnp.ndarray] = {
        "success": success_term,
        "failure": failure_term,
        "timeout": timeout_term,
        "success_rate": success_term.astype(f32).mean(),
        "failure_rate": failure_term.astype(f32).mean(),
        "timeout_rate": timeout_term.astype(f32).mean(),
    }
    for name, crit in active_success.items():
        info[f"success_{name}"] = crit.astype(f32).mean()
    for name, crit in active_failure.items():
        info[f"failure_{name}"] = crit.astype(f32).mean()
    for name, mask in new_success_flags.items():
        info[f"success_reason_{name}"] = mask
    for name, mask in new_failure_flags.items():
        info[f"failure_reason_{name}"] = mask

    # termination reward components for logging (step_processor.py:204-219)
    term_components = {
        "termination_success": success_term.astype(f32),
        "termination_success_weighted": success_term.astype(f32) * cfg.success_reward,
        "termination_failure_penalty": failure_term.astype(f32),
        "termination_failure_penalty_weighted": -failure_term.astype(f32)
        * cfg.failure_penalty,
        "termination_timeout_penalty": timeout_term.astype(f32),
        "termination_timeout_penalty_weighted": -timeout_term.astype(f32)
        * cfg.timeout_penalty,
    }

    return (
        should_reset,
        info,
        termination_reward,
        term_components,
        new_success_flags,
        new_failure_flags,
    )
