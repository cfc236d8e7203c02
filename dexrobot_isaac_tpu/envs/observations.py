"""Observation computation: obs dict + config-selected policy tensor.

TPU-native re-design of the reference's `ObservationEncoder`
(dexhand_env/components/observation/observation_encoder.py, SURVEY §2.4):
pure functions over `(kinematics, physics state, action targets, tracked
state)` producing the same observation dictionary keys
(observation_encoder.py:576-758) and the concatenation of
`policy_observation_keys` into the policy tensor
(observation_encoder.py:783-829).

Reproduced semantics:
- manual DOF velocities by finite-differencing positions over control_dt (the
  reference distrusts Isaac's velocities; observation_encoder.py:298-321).
  Deviation: after a reset we seed prev_dof_pos with the new positions so the
  first step of an episode reports zero velocity (the reference zeroes the
  buffer instead, producing a one-step q/dt spike; reset_observer_state,
  observation_encoder.py:363-383).
- contact binary/duration tracking with start/continue/stop transitions
  (observation_encoder.py:323-361).
- ARR-aligned hand pose compensating the built-in Ry(90 deg)
  (observation_encoder.py:1483-1521).
- world->hand frame transforms of fingertip/fingerpad poses
  (observation_encoder.py:915-986).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import (
    ACTIVE_FINGER_DOF_INDICES,
    NUM_BASE_DOFS,
)
from dexrobot_isaac_tpu.models.dexhand021 import HandModel
from dexrobot_isaac_tpu.ops import quat as qm
from dexrobot_isaac_tpu.physics.types import KinematicsOut

_SQRT_HALF = 0.7071067811865476
# the model's built-in rotation: hand quat is Ry(90 deg) at ARR=0
_BUILTIN_ROT = np.array([0.0, _SQRT_HALF, 0.0, _SQRT_HALF], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class ObsConfig:
    """Static observation configuration (built from model + task cfg)."""

    policy_observation_keys: Tuple[str, ...]
    contact_body_indices: jnp.ndarray   # (n,) hand body indices monitored
    contact_binary_threshold: float
    control_dt: float
    num_contact_bodies: int
    hand_body_index: int                # palm / right_hand_base
    fingertip_site_indices: jnp.ndarray  # (5,)
    fingerpad_site_indices: jnp.ndarray  # (5,)
    num_actions: int
    # asymmetric actor-critic: when non-empty, these keys are concatenated
    # into a privileged critic ("states") slice appended after the policy
    # slice; the critic trunk consumes it while the actor sees only the
    # policy slice (capability beyond the reference: its rl_games config
    # never wires central_value; SURVEY §2.9)
    critic_observation_keys: Tuple[str, ...] = ()


def build_obs_config(
    model: HandModel,
    policy_observation_keys,
    contact_force_bodies,
    contact_binary_threshold: float,
    control_dt: float,
    num_actions: int,
    critic_observation_keys=(),
) -> ObsConfig:
    tip_idx = [model.site_index(n) for n in
               ["r_f_link%d_tip" % f for f in range(1, 6)]]
    pad_idx = [model.site_index(n) for n in
               ["r_f_link%d_pad" % f for f in range(1, 6)]]
    return ObsConfig(
        policy_observation_keys=tuple(policy_observation_keys),
        contact_body_indices=np.asarray(
            [model.body_index(b) for b in contact_force_bodies]
        ),
        num_contact_bodies=len(list(contact_force_bodies)),
        contact_binary_threshold=float(contact_binary_threshold),
        control_dt=float(control_dt),
        hand_body_index=model.body_index("right_hand_base"),
        fingertip_site_indices=np.asarray(tip_idx),
        fingerpad_site_indices=np.asarray(pad_idx),
        num_actions=num_actions,
        critic_observation_keys=tuple(critic_observation_keys),
    )


def arr_aligned_pose(hand_poses: jnp.ndarray) -> jnp.ndarray:
    """Compensate the built-in Ry(90): identity orientation at ARR=0
    (observation_encoder.py:1483-1521)."""
    pos = hand_poses[..., :3]
    quat = hand_poses[..., 3:7]
    inv = qm.quat_conjugate(_BUILTIN_ROT)
    return jnp.concatenate([pos, qm.quat_mul(quat, inv)], axis=-1)


def poses_to_hand_frame(poses_world: jnp.ndarray, hand_pose: jnp.ndarray) -> jnp.ndarray:
    """(N, 35) world-frame finger poses -> hand frame
    (observation_encoder.py:915-986)."""
    n = poses_world.shape[0]
    p = poses_world.reshape(n, 5, 7)
    hand_pos = hand_pose[:, None, :3]
    hand_quat = hand_pose[:, None, 3:7]
    pos_h = qm.point_in_hand_frame(p[..., :3], hand_pos, hand_quat)
    quat_h = qm.quat_mul(qm.quat_conjugate(hand_quat), p[..., 3:7])
    return jnp.concatenate([pos_h, quat_h], axis=-1).reshape(n, 35)


def compute_default_observations(
    cfg: ObsConfig,
    kin: KinematicsOut,
    dof_pos: jnp.ndarray,            # (N, 26)
    prev_dof_pos: jnp.ndarray,       # (N, 26) for manual velocities
    full_dof_targets: jnp.ndarray,   # (N, 26)
    active_prev_targets: jnp.ndarray,  # (N, 18)
    prev_actions: jnp.ndarray,       # (N, num_actions)
    body_contact_force: jnp.ndarray,  # (N, B, 3)
    contact_duration_steps: jnp.ndarray,  # (N, n_contact)
    prev_contact_binary: jnp.ndarray,     # (N, n_contact)
    episode_step_count: jnp.ndarray,      # (N,)
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Default obs dict (observation_encoder.py:576-758).

    Returns (obs_dict, new_contact_duration_steps, contact_binary) -- the
    caller threads the updated tracking state into the next EnvState.
    """
    obs: Dict[str, jnp.ndarray] = {}
    dof_vel = (dof_pos - prev_dof_pos) / cfg.control_dt  # manual velocities

    obs["base_dof_pos"] = dof_pos[:, :NUM_BASE_DOFS]
    obs["base_dof_vel"] = dof_vel[:, :NUM_BASE_DOFS]
    act_idx = np.asarray(ACTIVE_FINGER_DOF_INDICES)
    obs["active_finger_dof_pos"] = dof_pos[:, act_idx]
    obs["active_finger_dof_vel"] = dof_vel[:, act_idx]
    obs["all_finger_dof_pos"] = dof_pos[:, NUM_BASE_DOFS:]
    obs["all_finger_dof_vel"] = dof_vel[:, NUM_BASE_DOFS:]

    hand_pose = jnp.concatenate(
        [
            kin.body_pos[:, cfg.hand_body_index],
            kin.body_quat[:, cfg.hand_body_index],
        ],
        axis=-1,
    )
    obs["hand_pose"] = hand_pose
    obs["hand_pose_arr_aligned"] = arr_aligned_pose(hand_pose)

    contact_forces = body_contact_force[:, cfg.contact_body_indices]  # (N, n, 3)
    n_envs = contact_forces.shape[0]
    obs["contact_forces"] = contact_forces.reshape(n_envs, -1)
    mags = jnp.linalg.norm(contact_forces, axis=-1)
    obs["contact_force_magnitude"] = mags
    contact_binary = (mags > cfg.contact_binary_threshold).astype(jnp.float32)
    obs["contact_binary"] = contact_binary

    # contact duration tracking (observation_encoder.py:323-361)
    started = (contact_binary == 1.0) & (prev_contact_binary == 0.0)
    active = contact_binary == 1.0
    new_duration = jnp.where(
        started,
        jnp.ones_like(contact_duration_steps),
        jnp.where(active, contact_duration_steps + 1, 0),
    )
    obs["contact_duration"] = new_duration.astype(jnp.float32) * cfg.control_dt

    obs["prev_actions"] = prev_actions
    obs["active_prev_targets"] = active_prev_targets
    obs["base_dof_target"] = full_dof_targets[:, :NUM_BASE_DOFS]
    obs["active_finger_dof_target"] = full_dof_targets[:, act_idx]
    obs["all_finger_dof_target"] = full_dof_targets[:, NUM_BASE_DOFS:]

    def site_poses(indices):
        return jnp.concatenate(
            [kin.site_pos[:, indices], kin.site_quat[:, indices]], axis=-1
        ).reshape(n_envs, 35)

    tip_world = site_poses(cfg.fingertip_site_indices)
    pad_world = site_poses(cfg.fingerpad_site_indices)
    obs["fingertip_poses_world"] = tip_world
    obs["fingertip_poses_hand"] = poses_to_hand_frame(tip_world, hand_pose)
    obs["fingerpad_poses_world"] = pad_world
    obs["fingerpad_poses_hand"] = poses_to_hand_frame(pad_world, hand_pose)

    obs["episode_time"] = (
        episode_step_count.astype(jnp.float32) * cfg.control_dt
    )[:, None]

    return obs, new_duration, contact_binary


def concat_selected_observations(
    cfg: ObsConfig, obs_dict: Dict[str, jnp.ndarray], keys=None
) -> jnp.ndarray:
    """Concatenate `policy_observation_keys` (or an explicit `keys` list, e.g.
    critic_observation_keys) in config order into one tensor
    (observation_encoder.py:783-829). Fail-fast on missing keys."""
    parts = []
    for key in cfg.policy_observation_keys if keys is None else keys:
        if key not in obs_dict:
            raise KeyError(
                f"observation key '{key}' not in obs_dict "
                f"(available: {sorted(obs_dict)})"
            )
        v = obs_dict[key]
        parts.append(v if v.ndim == 2 else v.reshape(v.shape[0], -1))
    return jnp.concatenate(parts, axis=-1)


def observation_slices(
    cfg: ObsConfig, obs_dict: Dict[str, jnp.ndarray], keys=None
) -> Dict[str, Tuple[int, int]]:
    """Semantic index lookup: key -> (start, end) slice into the policy tensor
    (reference index-lookup API, observation_encoder.py:999-1200)."""
    out: Dict[str, Tuple[int, int]] = {}
    ofs = 0
    for key in cfg.policy_observation_keys if keys is None else keys:
        v = obs_dict[key]
        dim = int(np.prod(v.shape[1:]))
        out[key] = (ofs, ofs + dim)
        ofs += dim
    return out
