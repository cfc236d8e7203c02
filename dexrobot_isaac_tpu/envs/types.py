"""Environment state pytree and static environment configuration.

The reference holds this state scattered across mutable components
(ObservationEncoder.prev_*, ActionProcessor.*_targets, RewardCalculator.prev_*,
TerminationManager reason dicts, task_states registry; SURVEY §2.3-2.5). Here
it is one explicit pytree threaded through a pure step function, which is what
makes the whole env step a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from dexrobot_isaac_tpu.physics.types import DRSample, PhysicsState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Full per-step environment state (leading dim = num_envs everywhere)."""

    physics: PhysicsState
    full_dof_targets: jnp.ndarray      # (N, 26)
    active_prev_targets: jnp.ndarray   # (N, 18)
    active_rule_targets: jnp.ndarray   # (N, 18) pre-action rule output (step N-1)
    prev_actions: jnp.ndarray          # (N, num_actions)
    prev_dof_pos: jnp.ndarray          # (N, 26) for manual velocity
    contact_duration_steps: jnp.ndarray  # (N, n_contact) int32
    prev_contact_binary: jnp.ndarray     # (N, n_contact) float32
    episode_step_count: jnp.ndarray      # (N,) int32
    # from the last physics step; read back by eval-time diagnostics/render.
    # (The box's net contact force is consumed fresh within the step and is
    # deliberately NOT carried -- it had no reader.)
    body_contact_force: jnp.ndarray      # (N, B, 3)
    # reward-calculator tracking (reward_calculator.py:50-54)
    prev_finger_dof_vel: jnp.ndarray   # (N, 20)
    prev_hand_vel: jnp.ndarray         # (N, 3)
    prev_hand_ang_vel: jnp.ndarray     # (N, 3)
    prev_contacts: jnp.ndarray         # (N, n_contact) bool
    # termination per-reason episode tracking (termination_manager.py:200-230)
    success_flags: Dict[str, jnp.ndarray]
    failure_flags: Dict[str, jnp.ndarray]
    consecutive_successes: jnp.ndarray  # () int32
    # task plugin state registry (observation_encoder.py:385-440)
    task_states: Dict[str, jnp.ndarray]
    # per-env domain-randomization scales, resampled on reset when enabled
    dr: DRSample
    rng: jax.Array
    # curriculum difficulty in [0, 1]: a runtime scalar consumed by
    # task.reset_task to scale reset-randomization ranges. Carried in state
    # (not closed over) so the host can adjust it between PPO iterations
    # without recompiling. 1.0 = full reference-parity randomization.
    # (Capability beyond the reference, which has no curriculum on reset
    # ranges -- its "curriculum" is BlindGrasping's in-episode stage FSM.)
    difficulty: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.ones((), dtype=jnp.float32)
    )

    @property
    def dof_pos(self) -> jnp.ndarray:
        return self.physics.q

    @property
    def dof_vel(self) -> jnp.ndarray:
        return self.physics.qd
