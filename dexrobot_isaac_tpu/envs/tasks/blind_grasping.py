"""BlindGrasping: tactile-only box grasping with a 3-stage curriculum.

TPU-native re-design of the reference task
(dexhand_env/tasks/blind_grasping_task.py, SURVEY §2.8). Reproduced semantics:

- box scene: 5 cm / 100 g cube on the ground, reset to xy +/-2 cm and yaw
  +/-180 deg at z = 0.027 (blind_grasping_task.py:433-547)
- hand randomization: base translation +/-0.2 m, rotation +/-45 deg, finger
  DOFs uniform [0, 30 deg] with thumb rotation [0, 90 deg]
- privileged task observations: object pos/vel, finger-object distances,
  fingerpad geometry, heuristic finger-box contact (finger contact AND box
  contact AND pad-to-center proximity < sqrt(3)*size/2*1.2;
  blind_grasping_task.py:773-833), grasp duration
- stage FSM: 1->2 time-based (4 s), 2->3 contact-sustained (0.5 s) or timeout
  (3 s), exact-step transition flags (blind_grasping_task.py:835-956)
- stage-masked rewards + one-time completion bonuses gated on quality checks,
  geometric penetration penalty (blind_grasping_task.py:980-1208)
- success: box z > 0.2 m with >= 2 fingers on box sustained 2 s; failures:
  box_too_far, stage1_pregrasp_failed, stage2_contact_failed,
  stage3_grasp_lost (blind_grasping_task.py:1210-1364)
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dexrobot_isaac_tpu.constants import DOF_INDEX
from dexrobot_isaac_tpu.envs.tasks.api import (
    DexTask,
    TaskReset,
    TaskStep,
    curriculum_scale,
    detect_finger_box_contacts,
)
from dexrobot_isaac_tpu.physics.types import SimParams


def _get(cfg, key, default):
    v = cfg
    for k in key.split("."):
        if not isinstance(v, dict) or k not in v:
            return default
        v = v[k]
    return v


class BlindGraspingTask(DexTask):
    name = "BlindGrasping"

    def __init__(self, task_cfg: Dict[str, Any]):
        super().__init__(task_cfg)
        c = task_cfg
        box = c.get("box", {})
        self.box_size = float(box.get("size", 0.05))
        self.box_mass = float(box.get("mass", 0.1))
        self.box_friction = float(box.get("friction", 1.0))
        self.box_xy_range = float(_get(box, "initial_position.xy_range", 0.02))
        self.box_z = float(_get(box, "initial_position.z", 0.027))

        self.height_threshold = float(c.get("success_height_threshold", 0.2))
        self.contact_duration_threshold = float(
            c.get("contact_duration_threshold", 2.0)
        )
        self.min_fingers_for_grasp = int(c.get("min_fingers_for_grasp", 2))
        self.max_box_distance = float(c.get("max_box_distance", 0.8))
        self.contact_binary_threshold = float(
            c.get("contact_binary_threshold", 0.1)
        )

        self.stage1_duration = float(c.get("stage1_duration", 4.0))
        self.stage2_duration = float(c.get("stage2_duration", 3.0))
        self.stage2_contact_success_threshold = float(
            _get(c, "stage_evaluation.stage2_contact_success_threshold", 0.5)
        )

        self.hand_translation_range = float(c.get("hand_translation_range", 0.2))
        self.hand_rotation_range = float(c.get("hand_rotation_range", 0.785))
        self.thumb_rotation_range = float(
            _get(c, "finger_randomization.thumb_rotation_range", 1.571)
        )
        self.other_finger_range = float(
            _get(c, "finger_randomization.other_finger_range", 0.524)
        )

        rc = c.get("reward_calculation", {})
        self.height_alignment_decay = float(rc.get("height_alignment_decay", 5.0))
        self.centroid_positioning_decay = float(
            rc.get("centroid_positioning_decay", 5.0)
        )
        self.object_stability_decay = float(rc.get("object_stability_decay", 100.0))
        self.first_three_height_consistency_decay = float(
            rc.get("first_three_height_consistency_decay", 50.0)
        )
        self.fingerpad_proximity_decay = float(
            rc.get("fingerpad_proximity_decay", 10.0)
        )
        self.base_stability_decay = float(rc.get("base_stability_decay", 3.0))

        qt = c.get("quality_thresholds", {})
        self.height_tolerance = float(qt.get("height_tolerance", 0.03))
        self.centroid_tolerance = float(qt.get("centroid_tolerance", 0.08))
        self.position_drift_tolerance = float(
            qt.get("position_drift_tolerance", 0.01)
        )
        self.velocity_tolerance = float(qt.get("velocity_tolerance", 0.005))

        # Reset curriculum (beyond-reference capability): with difficulty d,
        # randomization amplitude = range * (min_fraction + (1-min_fraction)*d)
        # so d=1 reproduces exact reference-parity ranges. The thumb/finger
        # pose noise and box yaw stay at full range at every difficulty (they
        # don't gate task solvability; the hand-pose offset does).
        cur = c.get("curriculum", {}) or {}
        self.curriculum_enabled = bool(cur.get("enabled", False))
        self.curriculum_min_fraction = float(cur.get("min_range_fraction", 0.2))

        # Spawn validity projection (round-5 diagnosis,
        # tools/diag_rollout.py): at the low tactile spawn height the
        # training recipes use (initialHandPos z=0.25 vs the reference
        # default 0.5; reference cfg/task/BaseTask.yaml:17), the full
        # +/-0.2 m / +/-45 deg hand randomization places fingertips BELOW
        # the ground plane in 15.3% of difficulty-1.0 draws — the episode
        # then terminates hitting_ground on its first step regardless of
        # the action, which capped every round-1..4 policy at ~79-85% and
        # made four successive reward-shaping levers measure neutral.
        # The projection lifts the sampled base z (ARTz, a world-z
        # prismatic joint, so tips translate 1:1) by exactly the amount
        # that gives the LOWEST fingertip `clearance` above ground —
        # preserving the xy/rotation/finger randomization untouched and
        # acting only on the doomed subset. No-op at the reference spawn
        # height. The FK closure is attached by the factory
        # (factory.py attach; engine.fk on the sampled pose).
        sp = c.get("spawn_projection", {}) or {}
        self.spawn_projection = bool(sp.get("enabled", True))
        self.spawn_projection_clearance = float(sp.get("clearance", 0.01))
        self._min_tip_z_fn = None  # attached by factory when available

        pp = c.get("penetration_prevention", {})
        self.geometric_penetration_factor = float(
            pp.get("geometricPenetrationFactor", 1.0)
        )
        self.proximity_min_distance_factor = float(
            pp.get("proximityMinDistanceFactor", 1.0)
        )
        self.penetration_depth_scale = float(pp.get("penetrationDepthScale", 100.0))

        # Under-box clearance shaping (beyond-reference; round-3 lever for
        # the dominant hitting_ground failure: fingertips grazing z<0 while
        # scooping under the ground-resting box). The term penalizes tips
        # inside the box XY footprint below a clearance margin while the box
        # is still near the ground; its reward weight is 0 (off) by default.
        cs = c.get("clearance_shaping", {}) or {}
        self.under_box_margin = float(cs.get("under_margin", 0.01))
        self.under_box_footprint_factor = float(cs.get("footprint_factor", 1.4))
        self.under_box_ground_z = float(cs.get("box_near_ground_z", 0.10))

    # ------------------------------------------------------------------
    def configure_scene(self, params: SimParams) -> SimParams:
        """Add the box to the scene (parity: load_task_assets +
        create_task_objects, blind_grasping_task.py:300-366)."""
        import dataclasses

        return dataclasses.replace(
            params,
            has_box=True,
            box_size=self.box_size,
            box_mass=self.box_mass,
            box_friction=self.box_friction,
        )

    def init_task_states(self, num_envs: int) -> Dict[str, jnp.ndarray]:
        n = num_envs
        return {
            "success_duration_steps": jnp.zeros(n, dtype=jnp.int32),
            "success_conditions_met": jnp.zeros(n, dtype=bool),
            "current_stage": jnp.ones(n, dtype=jnp.int32),
            "time_in_stage": jnp.zeros(n, dtype=jnp.float32),
            "stage_contact_duration": jnp.zeros(n, dtype=jnp.float32),
            "just_transitioned_to_stage2": jnp.zeros(n, dtype=bool),
            "just_transitioned_to_stage3": jnp.zeros(n, dtype=bool),
            "initial_box_pos": jnp.zeros((n, 3), dtype=jnp.float32),
        }

    # ------------------------------------------------------------------
    def _detect_finger_box_contacts(self, obs_dict, box_contact_force, box_pos):
        """Heuristic finger-box contact (blind_grasping_task.py:773-833)."""
        return detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos, self.box_size,
            self.contact_binary_threshold,
        )

    def compute_step(
        self, obs_dict, task_states, physics, kin, body_contact_force,
        box_contact_force, control_dt,
    ) -> TaskStep:
        n = physics.q.shape[0]
        f32 = jnp.float32
        ts = dict(task_states)
        box_pos = physics.box_pos
        box_vel = physics.box_linvel

        # ---------- task observations (blind_grasping_task.py:549-653) ----------
        obs: Dict[str, jnp.ndarray] = {}
        obs["object_pos"] = box_pos
        obs["object_vel"] = box_vel

        pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
        d_f2o = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
        obs["finger_to_object_distances"] = d_f2o
        obs["avg_finger_to_object_distance"] = d_f2o.mean(axis=1)
        hdiff = jnp.abs(pads[:, :, 2] - box_pos[:, None, 2])
        obs["finger_to_object_height_diff"] = hdiff
        obs["avg_finger_to_object_height_diff"] = hdiff.mean(axis=1)
        hand_pos = obs_dict["hand_pose"][:, :3]
        obs["hand_to_object_distance"] = jnp.linalg.norm(hand_pos - box_pos, axis=-1)

        # fingerpad geometry: 10 pairwise distances + first-3 centroid
        iu, ju = jnp.triu_indices(5, k=1)
        obs["fingerpad_distances"] = jnp.linalg.norm(
            pads[:, iu] - pads[:, ju], axis=-1
        )
        obs["first_three_fingerpad_centroid"] = pads[:, :3].mean(axis=1)

        # contact state (blind_grasping_task.py:668-683)
        fb_contact = self._detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos
        )
        thumb_contact = fb_contact[:, 0]
        other_contact = fb_contact[:, 1:].any(axis=1)
        grasp_state = thumb_contact & other_contact
        obs["thumb_contact"] = thumb_contact.astype(f32)[:, None]
        obs["other_fingers_contact"] = other_contact.astype(f32)[:, None]
        obs["grasp_state"] = grasp_state.astype(f32)[:, None]

        # success-duration tracking (blind_grasping_task.py:592-648)
        num_on_box = fb_contact.sum(axis=1)
        height_ok = box_pos[:, 2] > self.height_threshold
        cond = height_ok & (num_on_box >= self.min_fingers_for_grasp)
        steps = jnp.where(cond, ts["success_duration_steps"] + 1, 0)
        ts["success_duration_steps"] = steps
        ts["success_conditions_met"] = cond
        obs["grasp_duration"] = (steps.astype(f32) * control_dt)[:, None]

        # ---------- stage FSM (blind_grasping_task.py:835-956) ----------
        stage = ts["current_stage"]
        time_in_stage = ts["time_in_stage"] + control_dt
        # stage-2 contact duration uses policy-observable sensors only
        fc = obs_dict["contact_binary"] > 0.5
        thumb_and_other = fc[:, 0] & fc[:, 1:].any(axis=1)
        in_s2 = stage == 2
        scd = jnp.where(
            in_s2,
            jnp.where(
                thumb_and_other, ts["stage_contact_duration"] + control_dt, 0.0
            ),
            ts["stage_contact_duration"],
        )

        s1_complete = (stage == 1) & (time_in_stage >= self.stage1_duration)
        s2_contact_ok = in_s2 & (scd >= self.stage2_contact_success_threshold)
        s2_timeout = in_s2 & (time_in_stage >= self.stage2_duration)
        s2_complete = s2_contact_ok | s2_timeout

        just_t2 = s1_complete
        just_t3 = s2_complete
        stage = jnp.where(s1_complete, 2, stage)
        stage = jnp.where(s2_complete, 3, stage)
        time_in_stage = jnp.where(s1_complete | s2_complete, 0.0, time_in_stage)
        scd = jnp.where(s1_complete | s2_complete, 0.0, scd)

        ts["current_stage"] = stage
        ts["time_in_stage"] = time_in_stage
        ts["stage_contact_duration"] = scd
        ts["just_transitioned_to_stage2"] = just_t2
        ts["just_transitioned_to_stage3"] = just_t3

        obs["current_stage"] = stage.astype(f32)[:, None]
        obs["time_in_stage"] = time_in_stage[:, None]
        progress = jnp.where(
            stage == 1,
            jnp.clip(time_in_stage / self.stage1_duration, 0.0, 1.0),
            jnp.where(
                stage == 2,
                jnp.clip(time_in_stage / self.stage2_duration, 0.0, 1.0),
                1.0,
            ),
        )
        obs["stage_progress"] = progress[:, None]

        # ---------- failure criteria (blind_grasping_task.py:1238-1364) ----------
        pregrasp_ok = self._pregrasp_quality(obs, pads, box_pos, box_vel, ts)
        failures = {
            "box_too_far": obs["hand_to_object_distance"] > self.max_box_distance,
            "stage1_pregrasp_failed": just_t2 & ~pregrasp_ok,
            "stage2_contact_failed": just_t3 & ~grasp_state,
            "stage3_grasp_lost": (stage == 3) & ~grasp_state,
        }

        # ---------- success criteria (blind_grasping_task.py:1210-1236) ----------
        threshold_steps = int(round(self.contact_duration_threshold / control_dt))
        successes = {"grasp_lift_success": steps >= threshold_steps}

        # ---------- rewards (blind_grasping_task.py:980-1208) ----------
        rewards = self._compute_rewards(
            obs_dict, obs, pads, box_pos, box_vel, ts, stage, just_t2, just_t3,
            failures, thumb_contact, other_contact, grasp_state,
        )

        return TaskStep(
            task_obs=obs,
            task_states=ts,
            success_criteria=successes,
            failure_criteria=failures,
            reward_terms=rewards,
        )

    # ------------------------------------------------------------------
    def _pregrasp_quality(self, obs, pads, box_pos, box_vel, ts):
        """Privileged pregrasp quality (blind_grasping_task.py:1334-1364)."""
        hdiff3 = jnp.abs(pads[:, :3, 2] - box_pos[:, None, 2])
        height_ok = jnp.all(hdiff3 <= self.height_tolerance, axis=1)
        centroid = obs["first_three_fingerpad_centroid"]
        centroid_ok = (
            jnp.linalg.norm(centroid - box_pos, axis=-1) <= self.centroid_tolerance
        )
        drift = jnp.linalg.norm(box_pos - ts["initial_box_pos"], axis=-1)
        stability_ok = (drift <= self.position_drift_tolerance) & (
            jnp.linalg.norm(box_vel, axis=-1) <= self.velocity_tolerance
        )
        return height_ok & centroid_ok & stability_ok

    def _geometric_penetration(self, obs_dict, box_pos):
        n = box_pos.shape[0]
        tips = obs_dict["fingertip_poses_world"].reshape(n, 5, 7)[:, :, :3]
        dist = jnp.linalg.norm(tips - box_pos[:, None, :], axis=-1)
        min_dist = dist.min(axis=1)
        threshold = self.box_size / 2.0 * self.geometric_penetration_factor
        return min_dist < threshold, min_dist

    def _compute_rewards(
        self, obs_dict, obs, pads, box_pos, box_vel, ts, stage, just_t2, just_t3,
        failures, thumb_contact, other_contact, grasp_state,
    ):
        f32 = jnp.float32
        r: Dict[str, jnp.ndarray] = {}
        s1 = (stage == 1).astype(f32)
        s2 = (stage == 2).astype(f32)
        s3 = (stage == 3).astype(f32)

        # --- stage 1 (blind_grasping_task.py:1055-1112) ---
        r["s1_height_alignment"] = (
            jnp.exp(-self.height_alignment_decay
                    * obs["avg_finger_to_object_height_diff"]) * s1
        )
        centroid_dist = jnp.linalg.norm(
            obs["first_three_fingerpad_centroid"] - box_pos, axis=-1
        )
        r["s1_centroid_positioning"] = (
            jnp.exp(-self.centroid_positioning_decay * centroid_dist) * s1
        )
        drift = jnp.linalg.norm(box_pos - ts["initial_box_pos"], axis=-1)
        velmag = jnp.linalg.norm(box_vel, axis=-1)
        r["s1_object_stability"] = (
            jnp.exp(-self.object_stability_decay * (drift + velmag)) * s1
        )
        h3 = pads[:, :3, 2]
        hvar = jnp.var(h3, axis=1, ddof=1)  # torch.var defaults to unbiased
        r["s1_finger_height_consistency"] = (
            jnp.exp(-self.first_three_height_consistency_decay * hvar) * s1
        )
        thumb_rot = obs_dict["all_finger_dof_pos"][
            :, DOF_INDEX["r_f_joint1_1"] - 6
        ]
        r["s1_thumb_rotation"] = (
            jnp.exp(-5.0 * jnp.abs(thumb_rot - math.pi / 2)) * s1
        )

        # --- stage 2 (blind_grasping_task.py:1114-1151) ---
        r["s2_thumb_contact"] = thumb_contact.astype(f32) * s2
        r["s2_other_fingers_contact"] = other_contact.astype(f32) * s2
        r["s2_grasp_achievement"] = grasp_state.astype(f32) * s2
        _, min_dist = self._geometric_penetration(obs_dict, box_pos)
        min_reward_dist = self.box_size / 2.0 * self.proximity_min_distance_factor
        safe_dist = jnp.maximum(min_dist, min_reward_dist)
        r["s2_fingerpad_proximity"] = (
            jnp.exp(-self.fingerpad_proximity_decay * safe_dist) * s2
        )
        base_vel_mag = jnp.linalg.norm(obs_dict["base_dof_vel"], axis=-1)
        r["s2_base_stability"] = (
            jnp.exp(-self.base_stability_decay * base_vel_mag) * s2
        )

        # --- stage 3 (blind_grasping_task.py:1153-1176) ---
        height_above = box_pos[:, 2] - self.box_z
        r["s3_object_height"] = (
            jnp.clip(height_above / (self.height_threshold - self.box_z), 0.0, 1.0)
            * s3
        )
        r["s3_grasp_maintenance"] = grasp_state.astype(f32) * s3
        r["s3_grasp_duration"] = (
            jnp.clip(
                obs["grasp_duration"][:, 0] / self.contact_duration_threshold,
                0.0, 1.0,
            ) * s3
        )

        # --- completion bonuses (blind_grasping_task.py:1020-1040) ---
        r["s1_completion"] = (
            just_t2 & ~failures["stage1_pregrasp_failed"]
        ).astype(f32)
        r["s2_completion"] = (
            just_t3 & ~failures["stage2_contact_failed"]
        ).astype(f32)

        # --- penetration penalty (blind_grasping_task.py:1194-1208) ---
        threshold = self.box_size / 2.0 * self.geometric_penetration_factor
        depth = jnp.clip(threshold - min_dist, 0.0, None)
        r["penetration_penalty"] = depth * self.penetration_depth_scale

        # --- under-box clearance penalty (beyond-reference; weight 0 off) ---
        n = box_pos.shape[0]
        tips3 = obs_dict["fingertip_poses_world"].reshape(n, 5, 7)[:, :, :3]
        half = self.box_size / 2.0 * self.under_box_footprint_factor
        in_fp = (
            (jnp.abs(tips3[:, :, 0] - box_pos[:, None, 0]) < half)
            & (jnp.abs(tips3[:, :, 1] - box_pos[:, None, 1]) < half)
        )
        low = jnp.clip(self.under_box_margin - tips3[:, :, 2], 0.0, None)
        near_ground = (box_pos[:, 2] < self.under_box_ground_z).astype(f32)
        r["under_box_penalty"] = (
            (in_fp.astype(f32) * low).sum(axis=1) * near_ground
        )
        return r

    # ------------------------------------------------------------------
    def lane_step(self, ctx):
        """Lane-vector `compute_step` for the fused env-step kernel
        (envs/fused_step.py). Mirrors `compute_step` above term for term;
        tests/test_fused_step.py asserts the two paths agree."""
        from types import SimpleNamespace

        f32 = jnp.float32
        obs_d = ctx.obs
        ts = ctx.ts
        dt = ctx.control_dt
        zero = ctx.zero
        box_pos = ctx.box_pos
        box_vel = ctx.box_linvel

        def sub3(a, b):
            return tuple(x - y for x, y in zip(a, b))

        def norm(v):
            return jnp.sqrt(sum(x * x for x in v))

        obs = {}
        obs["object_pos"] = box_pos
        obs["object_vel"] = box_vel

        pads = [
            obs_d["fingerpad_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        d_f2o = tuple(norm(sub3(p, box_pos)) for p in pads)
        obs["finger_to_object_distances"] = d_f2o
        obs["avg_finger_to_object_distance"] = (sum(d_f2o) / 5.0,)
        hdiff = tuple(jnp.abs(p[2] - box_pos[2]) for p in pads)
        obs["finger_to_object_height_diff"] = hdiff
        obs["avg_finger_to_object_height_diff"] = (sum(hdiff) / 5.0,)
        hand_pos = obs_d["hand_pose"][:3]
        h2o = norm(sub3(hand_pos, box_pos))
        obs["hand_to_object_distance"] = (h2o,)

        # 10 pairwise fingerpad distances in jnp.triu_indices(5, 1) order
        obs["fingerpad_distances"] = tuple(
            norm(sub3(pads[i], pads[j]))
            for i in range(5) for j in range(i + 1, 5)
        )
        centroid = tuple(
            (pads[0][k] + pads[1][k] + pads[2][k]) / 3.0 for k in range(3)
        )
        obs["first_three_fingerpad_centroid"] = centroid

        # heuristic finger-box contact (tasks/api.py detect_finger_box_contacts)
        box_has = norm(ctx.box_contact_force) > self.contact_binary_threshold
        prox_thr = math.sqrt(3.0) * self.box_size / 2.0 * 1.2
        fingc = [obs_d["contact_binary"][i] > 0.5 for i in range(5)]
        fb = [fingc[i] & box_has & (d_f2o[i] < prox_thr) for i in range(5)]
        thumb_contact = fb[0]
        other_contact = fb[1] | fb[2] | fb[3] | fb[4]
        grasp_state = thumb_contact & other_contact
        obs["thumb_contact"] = (thumb_contact.astype(f32),)
        obs["other_fingers_contact"] = (other_contact.astype(f32),)
        obs["grasp_state"] = (grasp_state.astype(f32),)

        num_on_box = sum(b.astype(jnp.int32) for b in fb)
        height_ok = box_pos[2] > self.height_threshold
        cond = height_ok & (num_on_box >= self.min_fingers_for_grasp)
        steps = jnp.where(cond, ts["success_duration_steps"][0] + 1, 0)
        obs["grasp_duration"] = (steps.astype(f32) * dt,)

        # stage FSM
        stage = ts["current_stage"][0]
        tis = ts["time_in_stage"][0] + dt
        fc = [obs_d["contact_binary"][i] > 0.5 for i in range(5)]
        thumb_and_other = fc[0] & (fc[1] | fc[2] | fc[3] | fc[4])
        in_s2 = stage == 2
        scd = jnp.where(
            in_s2,
            jnp.where(
                thumb_and_other, ts["stage_contact_duration"][0] + dt, 0.0
            ),
            ts["stage_contact_duration"][0],
        )
        s1_complete = (stage == 1) & (tis >= self.stage1_duration)
        s2_contact_ok = in_s2 & (scd >= self.stage2_contact_success_threshold)
        s2_timeout = in_s2 & (tis >= self.stage2_duration)
        s2_complete = s2_contact_ok | s2_timeout
        just_t2 = s1_complete
        just_t3 = s2_complete
        stage = jnp.where(s1_complete, 2, stage)
        stage = jnp.where(s2_complete, 3, stage)
        tis = jnp.where(s1_complete | s2_complete, 0.0, tis)
        scd = jnp.where(s1_complete | s2_complete, 0.0, scd)

        obs["current_stage"] = (stage.astype(f32),)
        obs["time_in_stage"] = (tis,)
        progress = jnp.where(
            stage == 1,
            jnp.clip(tis / self.stage1_duration, 0.0, 1.0),
            jnp.where(
                stage == 2,
                jnp.clip(tis / self.stage2_duration, 0.0, 1.0),
                1.0,
            ),
        )
        obs["stage_progress"] = (progress,)

        # pregrasp quality + failures
        hdiff3_ok = (
            (hdiff[0] <= self.height_tolerance)
            & (hdiff[1] <= self.height_tolerance)
            & (hdiff[2] <= self.height_tolerance)
        )
        centroid_ok = norm(sub3(centroid, box_pos)) <= self.centroid_tolerance
        drift = norm(sub3(box_pos, ts["initial_box_pos"]))
        stability_ok = (drift <= self.position_drift_tolerance) & (
            norm(box_vel) <= self.velocity_tolerance
        )
        pregrasp_ok = hdiff3_ok & centroid_ok & stability_ok
        failures = {
            "box_too_far": h2o > self.max_box_distance,
            "stage1_pregrasp_failed": just_t2 & ~pregrasp_ok,
            "stage2_contact_failed": just_t3 & ~grasp_state,
            "stage3_grasp_lost": (stage == 3) & ~grasp_state,
        }
        threshold_steps = int(round(self.contact_duration_threshold / dt))
        successes = {"grasp_lift_success": steps >= threshold_steps}

        # rewards (stage-masked; mirrors _compute_rewards)
        s1 = (stage == 1).astype(f32)
        s2 = (stage == 2).astype(f32)
        s3 = (stage == 3).astype(f32)
        r = {}
        r["s1_height_alignment"] = (
            jnp.exp(-self.height_alignment_decay
                    * obs["avg_finger_to_object_height_diff"][0]) * s1
        )
        centroid_dist = norm(sub3(centroid, box_pos))
        r["s1_centroid_positioning"] = (
            jnp.exp(-self.centroid_positioning_decay * centroid_dist) * s1
        )
        velmag = norm(box_vel)
        r["s1_object_stability"] = (
            jnp.exp(-self.object_stability_decay * (drift + velmag)) * s1
        )
        h3 = [pads[i][2] for i in range(3)]
        hmean = (h3[0] + h3[1] + h3[2]) / 3.0
        hvar = (
            (h3[0] - hmean) ** 2 + (h3[1] - hmean) ** 2 + (h3[2] - hmean) ** 2
        ) / 2.0  # unbiased (ddof=1) over 3 samples
        r["s1_finger_height_consistency"] = (
            jnp.exp(-self.first_three_height_consistency_decay * hvar) * s1
        )
        thumb_rot = obs_d["all_finger_dof_pos"][
            DOF_INDEX["r_f_joint1_1"] - 6
        ]
        r["s1_thumb_rotation"] = (
            jnp.exp(-5.0 * jnp.abs(thumb_rot - math.pi / 2)) * s1
        )
        r["s2_thumb_contact"] = thumb_contact.astype(f32) * s2
        r["s2_other_fingers_contact"] = other_contact.astype(f32) * s2
        r["s2_grasp_achievement"] = grasp_state.astype(f32) * s2
        tips = [
            obs_d["fingertip_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        tip_dist = [norm(sub3(t, box_pos)) for t in tips]
        min_dist = tip_dist[0]
        for d in tip_dist[1:]:
            min_dist = jnp.minimum(min_dist, d)
        min_reward_dist = self.box_size / 2.0 * self.proximity_min_distance_factor
        safe_dist = jnp.maximum(min_dist, min_reward_dist)
        r["s2_fingerpad_proximity"] = (
            jnp.exp(-self.fingerpad_proximity_decay * safe_dist) * s2
        )
        base_vel_mag = norm(obs_d["base_dof_vel"])
        r["s2_base_stability"] = (
            jnp.exp(-self.base_stability_decay * base_vel_mag) * s2
        )
        height_above = box_pos[2] - self.box_z
        r["s3_object_height"] = (
            jnp.clip(
                height_above / (self.height_threshold - self.box_z), 0.0, 1.0
            ) * s3
        )
        r["s3_grasp_maintenance"] = grasp_state.astype(f32) * s3
        r["s3_grasp_duration"] = (
            jnp.clip(
                obs["grasp_duration"][0] / self.contact_duration_threshold,
                0.0, 1.0,
            ) * s3
        )
        r["s1_completion"] = (
            just_t2 & ~failures["stage1_pregrasp_failed"]
        ).astype(f32)
        r["s2_completion"] = (
            just_t3 & ~failures["stage2_contact_failed"]
        ).astype(f32)
        threshold = self.box_size / 2.0 * self.geometric_penetration_factor
        depth = jnp.clip(threshold - min_dist, 0.0, None)
        r["penetration_penalty"] = depth * self.penetration_depth_scale

        # under-box clearance penalty twin (weight 0 off by default)
        half = self.box_size / 2.0 * self.under_box_footprint_factor
        near_ground = (box_pos[2] < self.under_box_ground_z).astype(f32)
        under = zero
        for t in tips:
            in_fp = (
                (jnp.abs(t[0] - box_pos[0]) < half)
                & (jnp.abs(t[1] - box_pos[1]) < half)
            ).astype(f32)
            under = under + in_fp * jnp.clip(
                self.under_box_margin - t[2], 0.0, None
            )
        r["under_box_penalty"] = under * near_ground

        izero = jnp.zeros_like(stage)
        ts_new = {
            "success_duration_steps": (steps,),
            "success_conditions_met": (cond,),
            "current_stage": (stage,),
            "time_in_stage": (tis,),
            "stage_contact_duration": (scd,),
            "just_transitioned_to_stage2": (just_t2,),
            "just_transitioned_to_stage3": (just_t3,),
            "initial_box_pos": ts["initial_box_pos"],
        }
        reset_ts = {
            "success_duration_steps": (izero,),
            "success_conditions_met": (izero,),
            "current_stage": (jnp.ones_like(stage),),
            "time_in_stage": (zero,),
            "stage_contact_duration": (zero,),
            "just_transitioned_to_stage2": (izero,),
            "just_transitioned_to_stage3": (izero,),
            "initial_box_pos": ctx.reset_box_pos,
        }
        return SimpleNamespace(
            task_obs=obs, ts_new=ts_new, success=successes, failure=failures,
            rewards=r, reset_ts=reset_ts,
        )

    # ------------------------------------------------------------------
    def reset_task(
        self, key, num_envs, default_dof_pos, difficulty=None,
        project: bool = True,
    ) -> TaskReset:
        n = num_envs
        k_box, k_yaw, k_trans, k_rot, k_fing = jax.random.split(key, 5)

        # curriculum scale on the hand-pose offset ranges (1.0 when disabled
        # or no difficulty provided -> exact reference-parity randomization)
        cscale = curriculum_scale(
            difficulty, self.curriculum_min_fraction, self.curriculum_enabled
        )

        xy = (jax.random.uniform(k_box, (n, 2)) * 2 - 1) * self.box_xy_range
        box_pos = jnp.concatenate(
            [xy, jnp.full((n, 1), self.box_z, dtype=jnp.float32)], axis=-1
        )
        yaw = (jax.random.uniform(k_yaw, (n,)) * 2 - 1) * math.pi
        box_quat = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.sin(yaw / 2), jnp.cos(yaw / 2)],
            axis=-1,
        )

        dof = jnp.tile(default_dof_pos[None], (n, 1))
        trans = (
            (jax.random.uniform(k_trans, (n, 3)) * 2 - 1)
            * self.hand_translation_range * cscale
        )
        rot = (
            (jax.random.uniform(k_rot, (n, 3)) * 2 - 1)
            * self.hand_rotation_range * cscale
        )
        dof = dof.at[:, 0:3].set(trans).at[:, 3:6].set(rot)
        ranges = jnp.full((20,), self.other_finger_range).at[0].set(
            self.thumb_rotation_range
        )
        fingers = jax.random.uniform(k_fing, (n, 20)) * ranges
        dof = dof.at[:, 6:26].set(fingers)

        if project and self.spawn_projection and (
            self._min_tip_z_fn is not None
        ):
            # project=False => the caller projects instead (the fused
            # kernel lane-projects its reset rows with the SAME
            # sim.min_site_z function; envs/fused_step.py)
            # lift ARTz so the lowest fingertip clears the ground (see
            # __init__ rationale); pure upward projection — valid spawns
            # are untouched
            mz = self._min_tip_z_fn(dof)
            lift = jnp.maximum(0.0, self.spawn_projection_clearance - mz)
            dof = dof.at[:, 2].add(lift)

        ts = self.init_task_states(n)
        ts["initial_box_pos"] = box_pos
        return TaskReset(
            dof_pos=dof, box_pos=box_pos, box_quat=box_quat, task_states=ts
        )
