"""Environment factory: config dict -> task object -> DexHandEnv.

Parity with the reference factory (dexhand_env/factory.py:20-147):
`create_dex_env` maps the task name onto a task class, builds the scene, and
assembles all static sub-configs the jitted step function closes over.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

import numpy as np

from dexrobot_isaac_tpu.constants import NUM_DOFS
from dexrobot_isaac_tpu.envs import action as action_mod
from dexrobot_isaac_tpu.envs import observations as obs_mod
from dexrobot_isaac_tpu.envs import rewards as rew_mod
from dexrobot_isaac_tpu.envs import termination as term_mod
from dexrobot_isaac_tpu.envs.dexhand import DexHandEnv, EnvComponents
from dexrobot_isaac_tpu.envs.tasks.api import DexTask
from dexrobot_isaac_tpu.envs.tasks.base_task import BaseTask
from dexrobot_isaac_tpu.envs.tasks.blind_grasping import BlindGraspingTask
from dexrobot_isaac_tpu.envs.tasks.box_pushing import BoxPushingTask
from dexrobot_isaac_tpu.envs.tasks.box_reorientation import BoxReorientationTask
from dexrobot_isaac_tpu.envs.tasks.box_stacking import BoxStackingTask
from dexrobot_isaac_tpu.envs.tasks.in_hand_reorientation import (
    InHandReorientationTask,
)
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import SimParams
from dexrobot_isaac_tpu.utils.config import get_by_path

def _parse_dr(dr_cfg) -> Dict[str, Any] | None:
    """task.domain_randomization: {enabled: bool, <field>: [lo, hi], ...}"""
    if not dr_cfg or not dr_cfg.get("enabled", False):
        return None
    out = {}
    for k in ("kp_scale", "kd_scale", "box_mass_scale", "friction_scale"):
        if k in dr_cfg:
            lo, hi = dr_cfg[k]
            out[k] = (float(lo), float(hi))
    return out


TASK_REGISTRY: Dict[str, Type[DexTask]] = {
    "BaseTask": BaseTask,
    "BlindGrasping": BlindGraspingTask,
    "BoxPushing": BoxPushingTask,
    "BoxReorientation": BoxReorientationTask,
    "BoxStacking": BoxStackingTask,
    "InHandReorientation": InHandReorientationTask,
}


def register_task(name: str, cls: Type[DexTask]) -> None:
    """Register a custom task plugin (parity: factory task map)."""
    TASK_REGISTRY[name] = cls


def build_sim_params(cfg: Dict[str, Any]) -> SimParams:
    sim = cfg.get("sim", {})
    contact = sim.get("contact", {})
    return SimParams(
        dt=float(sim.get("dt", 0.005)),
        substeps=int(sim.get("substeps", 4)),
        gravity=float(sim.get("gravity", -9.81)),
        contact_stiffness=float(contact.get("stiffness", 8000.0)),
        contact_damping=float(contact.get("damping", 60.0)),
        friction_stiffness=float(contact.get("friction_stiffness", 400.0)),
        contact_beta=float(contact.get("beta", 0.2)),
        max_depenetration_velocity=float(
            contact.get("max_depenetration_velocity", 0.2)
        ),
        ground_friction=float(sim.get("ground_friction", 1.0)),
        hand_friction=float(sim.get("hand_friction", 1.0)),
        self_collision=bool(sim.get("self_collision", True)),
    )


def _reject_nonzero_restitution(node: Any, path: str = "task") -> None:
    """The penalty contact model has no restitution term: the key exists for
    schema parity with the reference (blind_grasping_task.py:321-366 sets
    restitution on the box actor) but only the shipped 0.0 is honored —
    fail fast instead of silently no-oping a nonzero value."""
    if isinstance(node, dict):
        for k, v in node.items():
            p = f"{path}.{k}"
            if k == "restitution":
                if float(v) != 0.0:
                    raise NotImplementedError(
                        f"{p}={v}: the penalty contact model has no "
                        "restitution term; only 0.0 is supported"
                    )
            else:
                _reject_nonzero_restitution(v, p)


def make_env(cfg: Dict[str, Any], seed: Optional[int] = None) -> DexHandEnv:
    """Build a DexHandEnv from a composed config (parity: make_env,
    factory.py:93-147)."""
    task_cfg = cfg.get("task", {})
    _reject_nonzero_restitution(task_cfg)
    env_cfg = cfg.get("env", {})
    task_name = task_cfg.get("name", "BaseTask")
    if task_name not in TASK_REGISTRY:
        raise ValueError(
            f"Unknown task '{task_name}' (registered: {sorted(TASK_REGISTRY)})"
        )
    # the env's hand spawn is the single source of truth for tasks whose
    # geometry depends on it (e.g. InHandReorientation's pinch solve); an
    # explicit task.hand_spawn still overrides
    task_cfg = dict(task_cfg)
    task_cfg.setdefault(
        "hand_spawn", env_cfg.get("initialHandPos", [0.0, 0.0, 0.5])
    )
    task = TASK_REGISTRY[task_name](task_cfg)

    # env.handAsset: load the hand from an MJCF file through models/mjcf.py
    # (reference asset loading, hand_initializer.py:209-257); default is the
    # doc-reconstructed canonical model. The vendored
    # assets/dexhand021_right_simplified_floating.xml is equivalence-tested
    # against it (tests/test_mjcf_model.py).
    hand_asset = env_cfg.get("handAsset")
    if hand_asset:
        from dexrobot_isaac_tpu.models.mjcf import load_mjcf

        model = load_mjcf(str(hand_asset))
    else:
        model = build_hand_model()
    params = task.configure_scene(build_sim_params(cfg))
    engine = HandPhysics(model=model, params=params)

    steps_per_control = int(
        get_by_path(cfg, "sim.physics_steps_per_control", 4)
    )
    control_dt = params.dt * steps_per_control

    pipeline = action_mod.build_action_pipeline(
        model=model,
        control_mode=task_cfg.get("controlMode", "position"),
        control_dt=control_dt,
        policy_controls_base=bool(task_cfg.get("policy_controls_hand_base", True)),
        policy_controls_fingers=bool(task_cfg.get("policy_controls_fingers", True)),
        max_base_linear_velocity=float(task_cfg.get("max_base_linear_velocity", 0.5)),
        max_base_angular_velocity=float(
            task_cfg.get("max_base_angular_velocity", 1.5)
        ),
        max_finger_joint_velocity=float(
            task_cfg.get("max_finger_joint_velocity", 1.0)
        ),
        custom_action_rule=task.custom_action_rule,
        custom_filters=task.custom_post_filters,
    )

    obs_cfg = obs_mod.build_obs_config(
        model=model,
        policy_observation_keys=task_cfg.get("policy_observation_keys", []),
        contact_force_bodies=task_cfg.get(
            "contact_force_bodies",
            ["r_f_link%d_4" % f for f in range(1, 6)],
        ),
        contact_binary_threshold=task_cfg.get("contact_binary_threshold", 1.0),
        control_dt=control_dt,
        num_actions=pipeline.num_actions,
        critic_observation_keys=task_cfg.get("critic_observation_keys", []),
    )

    weights = dict(task_cfg.get("reward_weights", {}))
    reward_cfg = rew_mod.RewardConfig(
        weights=weights,
        finger_lower_limits=np.asarray(model.lower_limit[6:], dtype=np.float32),
        finger_upper_limits=np.asarray(model.upper_limit[6:], dtype=np.float32),
    )

    term = task_cfg.get("termination", {})
    hs = term.get("height_safety", {})
    term_cfg = term_mod.TerminationConfig(
        active_success_criteria=tuple(term.get("active_success_criteria", [])),
        active_failure_criteria=tuple(term.get("active_failure_criteria", [])),
        max_episode_length=int(env_cfg.get("episodeLength", 300)),
        success_reward=float(weights.get("termination_success", 0.0)),
        failure_penalty=float(weights.get("termination_failure_penalty", 0.0)),
        timeout_penalty=float(weights.get("termination_timeout_penalty", 0.0)),
        handbase_threshold=float(hs.get("handbase_threshold", 0.0)),
        fingertip_threshold=float(hs.get("fingertip_threshold", 0.0)),
        has_height_safety="height_safety" in term,
        max_consecutive_successes=int(
            task_cfg.get("max_consecutive_successes", 50)
        ),
    )

    comps = EnvComponents(
        num_envs=int(env_cfg.get("numEnvs", 1024)),
        model=model,
        engine=engine,
        pipeline=pipeline,
        obs_cfg=obs_cfg,
        reward_cfg=reward_cfg,
        term_cfg=term_cfg,
        task=task,
        physics_steps_per_control=steps_per_control,
        control_dt=control_dt,
        spawn_pos=np.asarray(
            env_cfg.get("initialHandPos", [0.0, 0.0, 0.5]), dtype=np.float32
        ),
        default_dof_pos=np.zeros(NUM_DOFS, dtype=np.float32),
        clip_observations=float(env_cfg.get("clipObservations", np.inf)),
        clip_actions=float(env_cfg.get("clipActions", np.inf)),
        dr_ranges=_parse_dr(task_cfg.get("domain_randomization")),
        initial_difficulty=(
            float(get_by_path(task_cfg, "curriculum.initial_difficulty", 0.0))
            if get_by_path(task_cfg, "curriculum.enabled", False) else 1.0
        ),
    )
    if seed is None:
        seed = int(get_by_path(cfg, "train.seed", 42))

    # Attach the spawn-validity FK closure to tasks that project sampled
    # hand poses above the ground (BlindGrasping spawn_projection; see the
    # task __init__ rationale). Lives here because only the factory holds
    # the assembled engine + obs config; the closure maps sampled DOF
    # positions (N, 26) -> lowest fingertip z (N,).
    if getattr(task, "_min_tip_z_fn", "absent") is None:
        import jax.numpy as jnp

        from dexrobot_isaac_tpu.physics.pallas_step import build_lane_sim

        tip_idx = np.asarray(obs_cfg.fingertip_site_indices)
        spawn_c = tuple(
            float(x) for x in env_cfg.get("initialHandPos", [0.0, 0.0, 0.5])
        )
        proj_sim = build_lane_sim(engine, steps_per_control)

        def _min_tip_z(dof_pos):
            # lane-form positions-only FK — op-for-op the same function the
            # fused kernel runs on its reset rows (sim.min_site_z), so the
            # XLA and fused paths project spawns identically
            lanes = tuple(dof_pos[:, i] for i in range(dof_pos.shape[1]))
            zero = jnp.zeros_like(dof_pos[:, 0])
            return proj_sim.min_site_z(lanes, spawn_c, zero, tip_idx)

        task._min_tip_z_fn = _min_tip_z

    return DexHandEnv(comps, seed=seed)
