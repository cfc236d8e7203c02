"""Task plugin contract (pure-function re-design of the reference's DexTask).

The reference defines tasks as stateful plugin objects called by the env
(dexhand_env/tasks/task_interface.py:14-405): reward terms, success/failure
criteria, reset randomization, task observations, and optional action-rule
hooks. Here a task is a bundle of pure functions over the env state; task
temporal state lives in `EnvState.task_states` (the reference's registered
task-state registry, observation_encoder.py:385-440).

Per-step ordering parity with the reference's StepProcessor
(components/step_processor.py:37-131): `compute_step` is invoked once per step
after default observations and returns task observations, updated task state,
criteria dicts, and reward terms together -- internally it must follow the
reference order (task obs + FSM update -> failure criteria -> rewards), since
e.g. BlindGrasping's stage-completion bonuses read failure tensors computed by
the criteria pass (blind_grasping_task.py:1020-1040).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dexrobot_isaac_tpu.physics.types import KinematicsOut, PhysicsState, SimParams


@dataclasses.dataclass
class TaskStep:
    """Everything a task contributes to one env step."""

    task_obs: Dict[str, jnp.ndarray]
    task_states: Dict[str, jnp.ndarray]
    success_criteria: Dict[str, jnp.ndarray]
    failure_criteria: Dict[str, jnp.ndarray]
    reward_terms: Dict[str, jnp.ndarray]


@dataclasses.dataclass
class TaskReset:
    """Per-env reset values (full batch; env merges by done-mask)."""

    dof_pos: jnp.ndarray                      # (N, 26)
    box_pos: Optional[jnp.ndarray] = None     # (N, 3)
    box_quat: Optional[jnp.ndarray] = None    # (N, 4)
    task_states: Optional[Dict[str, jnp.ndarray]] = None
    # second free body (SimParams.has_box2 scenes only)
    box2_pos: Optional[jnp.ndarray] = None    # (N, 3)
    box2_quat: Optional[jnp.ndarray] = None   # (N, 4)


# ----------------------------------------------------------------------
# shared task math (used by multiple shipped tasks; keep ONE copy)
# ----------------------------------------------------------------------
def detect_finger_box_contacts(
    obs_dict: Dict[str, jnp.ndarray],
    box_contact_force: jnp.ndarray,
    box_pos: jnp.ndarray,
    box_size: float,
    contact_binary_threshold: float,
) -> jnp.ndarray:
    """Heuristic per-finger box contact: finger contact AND box contact AND
    fingerpad-to-center proximity < sqrt(3)*size/2*1.2
    (blind_grasping_task.py:773-833). Returns (N, 5) bool."""
    import math

    n = box_pos.shape[0]
    box_mag = jnp.linalg.norm(box_contact_force, axis=-1)
    box_has_contact = box_mag > contact_binary_threshold
    pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
    dist = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
    proximity = dist < (math.sqrt(3.0) * box_size / 2.0 * 1.2)
    finger_has_contact = obs_dict["contact_binary"] > 0.5
    return finger_has_contact & box_has_contact[:, None] & proximity


def symmetric_angle_error(
    angle: jnp.ndarray, target: jnp.ndarray, period: float
) -> jnp.ndarray:
    """Signed shortest error modulo `period` (cube symmetry etc.)."""
    err = angle - target
    return err - period * jnp.round(err / period)


def curriculum_scale(difficulty, min_fraction: float, enabled: bool = True):
    """Randomization-amplitude scale: min_fraction + (1-min_fraction)*d,
    clipped to [min_fraction, 1]; 1.0 when disabled or difficulty is None."""
    if not enabled or difficulty is None:
        return 1.0
    return min_fraction + (1.0 - min_fraction) * jnp.clip(difficulty, 0.0, 1.0)


class DexTask:
    """Base task: no-op everywhere (parity: dexhand_env/tasks/base_task.py)."""

    name = "BaseTask"

    def __init__(self, task_cfg: Dict[str, Any]):
        self.cfg = task_cfg

    # --- build-time hooks -------------------------------------------------
    def configure_scene(self, params: SimParams) -> SimParams:
        """Add task objects to the scene (parity: create_task_objects /
        load_task_assets, task_interface.py:120-180)."""
        return params

    def init_task_states(self, num_envs: int) -> Dict[str, jnp.ndarray]:
        """Register task temporal state tensors."""
        return {}

    # --- per-step hooks ---------------------------------------------------
    def compute_step(
        self,
        obs_dict: Dict[str, jnp.ndarray],
        task_states: Dict[str, jnp.ndarray],
        physics: PhysicsState,
        kin: KinematicsOut,
        body_contact_force: jnp.ndarray,
        box_contact_force: jnp.ndarray,
        control_dt: float,
        box2_contact_force: Optional[jnp.ndarray] = None,
    ) -> TaskStep:
        return TaskStep(
            task_obs={},
            task_states=task_states,
            success_criteria={},
            failure_criteria={},
            reward_terms={},
        )

    # --- reset hook -------------------------------------------------------
    def reset_task(
        self,
        key: jax.Array,
        num_envs: int,
        default_dof_pos: jnp.ndarray,
        difficulty: Optional[jnp.ndarray] = None,
    ) -> TaskReset:
        """Randomized reset values for all envs (parity: reset_task_state,
        task_interface.py:94-118).

        `difficulty` is an optional runtime scalar in [0, 1] (traced, NOT a
        Python float) from the curriculum controller; tasks that support a
        reset curriculum scale their randomization ranges by it. Tasks may
        ignore it (the default)."""
        return TaskReset(
            dof_pos=jnp.tile(default_dof_pos[None], (num_envs, 1))
        )

    # --- optional action hooks (task_interface.py:290-405) ----------------
    pre_action_rule = None     # fn(active_prev_targets, obs_dict) -> (N, 18)
    custom_action_rule = None
    custom_post_filters: Tuple = ()

    # --- fused-kernel lane hook (envs/fused_step.py) ----------------------
    def lane_step(self, ctx):
        """Lane-vector equivalent of `compute_step` for the fused env-step
        Pallas kernel: all values are tuples of (B,) lane arrays (plain jnp
        math — the same function traces inside the kernel and in CPU parity
        tests). The base task contributes nothing, matching its trivial
        `compute_step`. Tasks that override `compute_step` MUST also
        override `lane_step` (or the fused path refuses to build,
        envs/fused_step.py _check_supported) — the two are parity-tested
        against each other.

        `ctx` carries: obs (default obs lane dict), ts (task-state lane
        dict), box_pos/quat/linvel/angvel, box_contact_force, q, qd, dvel,
        control_dt, zero (a zero lane), reset_box_pos/quat (this step's
        sampled reset values, for reset_ts). Returns a namespace with
        task_obs, ts_new, success, failure, rewards (lane dicts) and
        reset_ts (lane values merged into done envs)."""
        from types import SimpleNamespace

        return SimpleNamespace(
            task_obs={}, ts_new={}, success={}, failure={}, rewards={},
            reset_ts={},
        )
