"""BoxStacking: grasp a cube and stack it on a platform cube.

The first multi-object task — beyond the reference's single-free-object
scenes (SURVEY §2.8; the reference's task API supports per-env extra actors
through Isaac Gym, dexhand_env/tasks/task_interface.py create_task_objects,
but neither shipped task uses more than one). Exercises the engine's second
free body + cube-cube contact (physics/engine.py _corners_vs_box).

Scene: the pick cube (primary box) spawns under the hand like BlindGrasping;
the platform cube (box2) rests on the ground at a randomized direction and
distance. The policy must grasp the pick cube, carry it over the platform,
and set it down on top: success requires the pick cube centered over the
platform within `position_tolerance`, at stacking height within
`height_tolerance`, moving slower than `rest_speed_tolerance`, sustained for
`hold_duration_threshold` seconds. Knocking the platform away
(`platform_moved`) or losing the pick cube (`box_too_far`) are failures.

Reset curriculum: with `curriculum.enabled`, the platform distance and the
initial randomization amplitudes scale with the runtime difficulty scalar
(tasks/api.py curriculum_scale).

Trains on the fused env-step kernel: `lane_step` below is the lane twin of
`compute_step`, and the kernel carries the platform cube's 13 state lanes
natively (envs/fused_step.py has_box2 support; parity in
tests/test_fused_step.py::test_box_stacking).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dexrobot_isaac_tpu.envs.tasks.api import (
    DexTask,
    TaskReset,
    TaskStep,
    curriculum_scale,
    detect_finger_box_contacts,
)
from dexrobot_isaac_tpu.physics.types import SimParams


class BoxStackingTask(DexTask):
    name = "BoxStacking"

    def __init__(self, task_cfg: Dict[str, Any]):
        super().__init__(task_cfg)
        c = task_cfg
        box = c.get("box", {})
        self.box_size = float(box.get("size", 0.05))
        self.box_mass = float(box.get("mass", 0.1))
        self.box_friction = float(box.get("friction", 1.0))
        self.box_xy_range = float(
            box.get("initial_position", {}).get("xy_range", 0.02)
        )
        self.box_z = float(box.get("initial_position", {}).get("z", 0.027))

        plat = c.get("platform", {})
        self.plat_size = float(plat.get("size", 0.08))
        self.plat_mass = float(plat.get("mass", 0.5))
        self.plat_friction = float(plat.get("friction", 1.2))
        pd = plat.get("distance", {})
        self.plat_dist_min = float(pd.get("min", 0.10))
        self.plat_dist_max = float(pd.get("max", 0.16))

        self.position_tolerance = float(c.get("position_tolerance", 0.02))
        self.height_tolerance = float(c.get("height_tolerance", 0.015))
        self.rest_speed_tolerance = float(c.get("rest_speed_tolerance", 0.1))
        self.hold_duration_threshold = float(
            c.get("hold_duration_threshold", 0.5)
        )
        self.box_far_threshold = float(c.get("box_far_threshold", 0.35))
        self.platform_move_tolerance = float(
            c.get("platform_move_tolerance", 0.05)
        )
        self.contact_binary_threshold = float(
            c.get("contact_binary_threshold", 0.1)
        )

        rc = c.get("reward_calculation", {})
        self.proximity_decay = float(rc.get("proximity_decay", 10.0))
        self.transport_decay = float(rc.get("transport_decay", 8.0))
        self.place_decay = float(rc.get("place_decay", 20.0))

        self.hand_translation_range = float(
            c.get("hand_translation_range", 0.05)
        )
        self.hand_rotation_range = float(c.get("hand_rotation_range", 0.2))
        self.finger_range = float(
            c.get("finger_randomization", {}).get("other_finger_range", 0.3)
        )

        cur = c.get("curriculum", {})
        self.curriculum_enabled = bool(cur.get("enabled", False))
        self.curriculum_min_fraction = float(cur.get("min_fraction", 0.4))
        # reverse-spawn curriculum: this fraction of resets (annealed to 0
        # as difficulty -> 1, so full-difficulty EVAL is unaffected) start
        # with the pick cube on the platform and the hand caging it — the
        # policy experiences the at-pose/release/settle states that plain
        # forward exploration rarely reaches (the "final inch" of
        # stacking). Default 0 (off): round 3 measured the hovering
        # variant collapsing the policy into freebie-farming avoidance
        # (BASELINE.md); the contact-allowance anneal is the default
        # release bridge. If enabled, MUST stay below the curriculum
        # promotion threshold (0.3).
        self.reverse_spawn_fraction = float(
            cur.get("reverse_spawn_fraction", 0.0)
        )
        # contact-allowance anneal (round-3 release lever): below this
        # difficulty, "stacked" tolerates some fingers still touching the
        # cube — floor(3 * (1 - d/anneal_end)) fingers allowed, so the
        # existing carry-to-pose policy gets success credit immediately at
        # d=0 (hover-hold counts) and the allowance steps 3 -> 2 -> 1 -> 0
        # as difficulty climbs. At d >= anneal_end (and at EVAL, which
        # forces difficulty 1.0) the criterion is the strict released
        # stack — eval semantics are unchanged. 0 disables (always strict).
        self.release_anneal_end = float(cur.get("release_anneal_end", 0.0))
        # at-pose bridge anneal (round-3 retune): the same bridge scalar
        # that anneals the contact allowance also (a) relaxes the stacked
        # position/height tolerances by tolerance_relax x at d=0 -> 1x at
        # d>=release_anneal_end and (b) shortens the required hold from
        # hold_duration_threshold to hold_anneal_min seconds at d=0.
        # Rationale (measured, BASELINE.md): with the strict 2 cm/1.5 cm
        # pocket the carry policy converges to hovering ~6 cm away farming
        # carry rewards — the pocket is never experienced, so the success
        # value never backs up. A relaxed pocket overlaps the hover noise;
        # the criterion tightens to strict as the curriculum climbs, and
        # EVAL (difficulty 1.0) is always strict. Defaults are neutral.
        self.tolerance_relax = float(cur.get("tolerance_relax", 1.0))
        self.hold_anneal_min = float(
            cur.get("hold_anneal_min", self.hold_duration_threshold)
        )
        # per-env difficulty band: spawn each env at a difficulty sampled
        # U(d - band, d) so recently-mastered settings keep appearing after
        # a promotion — success experience (and its value gradient)
        # survives the discrete bridge steps (the contact-allowance 2 -> 1
        # transition is unlearnable cold: measured success 0.3 -> 0.0
        # collapse right after promotion). The band collapses to zero at
        # difficulty 1.0, so full-difficulty training and EVAL always use
        # the exact target distribution. 0 disables.
        self.difficulty_band = float(cur.get("difficulty_band", 0.0))
        # fraction of banded spawns pinned exactly AT the controller's
        # difficulty (strict top-of-band; the promote_strict gate's sample)
        self.band_top_fraction = float(cur.get("band_top_fraction", 0.25))

        # bridge-annealed hitting_ground (round-3; measured attribution:
        # 74% of failures at difficulty 0.45 were hitting_ground — tips
        # grazing z<0 while working the ground-resting cube, the same trap
        # as BlindGrasping's dominant failure). When margin > 0 the task
        # overrides the builtin criterion with one whose fingertip limit
        # relaxes to (threshold - margin*bridge); strict at d>=anneal_end
        # and at eval. 0 keeps the builtin.
        term = c.get("termination", {}) or {}
        hsafe = term.get("height_safety", {}) or {}
        self.handbase_threshold = float(hsafe.get("handbase_threshold", 0.0))
        self.fingertip_threshold = float(hsafe.get("fingertip_threshold", 0.0))
        self.fingertip_bridge_margin = float(
            hsafe.get("fingertip_bridge_margin", 0.0)
        )
        # pocket-conditioned graze margin (round-3; the global bridge
        # margin above measured NEGATIVE — relaxing everywhere removed the
        # selection pressure that drives early clean-grasp learning, and
        # ground-scraping carry survived). This variant relaxes the
        # fingertip limit ONLY while the cube is within pocket_radius of
        # the stack point: early grasping keeps the strict rule (grazes
        # die fast, selection favors clean side grasps) while the
        # descent-to-place no longer executes the env for a graze at the
        # pocket — the measured blocker (74% of failures with the cube
        # within 1.7 cm p50 of the stack point, stacked_hold raw pinned
        # at 0.0: the place/release/settle sequence was never survived).
        # Rides the same bridge anneal as every other tolerance: strict
        # at d >= release_anneal_end and at eval. 0 disables.
        # Gate metrics differ deliberately: the cube uses 3D transport
        # distance, the tip gate is XY-planar (the tip sits near/below
        # ground when it matters, so z would dominate a 3D distance).
        self.pocket_margin = float(hsafe.get("pocket_margin", 0.0))
        self.pocket_radius = float(hsafe.get("pocket_radius", 0.05))
        # round-4 decoupling: the pocket margin can anneal on its OWN
        # schedule (strict at d >= pocket_anneal_end) instead of the
        # shared release bridge. Measured motivation: with the shared
        # 0.75 bridge the round-4 run's strict-gated curriculum stalled
        # at 0.60 and evaluated 91.5% hitting_ground at difficulty 1.0 —
        # the relaxation the place-descent needs anneals out before the
        # skill is clean. Default 1.0: relaxed in proportion (1 - d)
        # through the whole curriculum, exactly strict at eval.
        self.pocket_anneal_end = float(
            hsafe.get("pocket_anneal_end", 1.0)
        )
        if self.pocket_margin > 0.0 and self.pocket_anneal_end <= 0.0:
            import logging

            logging.getLogger("dexhand_tpu").warning(
                "BoxStacking: pocket_margin=%g has no effect because "
                "pocket_anneal_end is 0 (the pocket relaxation's anneal "
                "scalar is identically zero)",
                self.pocket_margin,
            )

        # under-box clearance shaping (same rationale and formula as
        # BlindGrasping's round-3 term): penalize tips inside the cube's
        # XY footprint below a clearance margin while the cube is near the
        # ground — scooping is what causes the ground grazes.
        cs = c.get("clearance_shaping", {}) or {}
        self.under_box_margin = float(cs.get("under_margin", 0.01))
        self.under_box_footprint_factor = float(cs.get("footprint_factor", 1.4))
        self.under_box_ground_z = float(cs.get("box_near_ground_z", 0.10))
        # free margin before the dense platform-drift penalty engages
        # (round-4 lever; see compute_step). Legit placement jostles the
        # platform ~millimeters; the penalty only sees real shoves.
        self.drift_free_margin = float(cs.get("drift_free_margin", 0.01))

    # ------------------------------------------------------------------
    def configure_scene(self, params: SimParams) -> SimParams:
        import dataclasses

        return dataclasses.replace(
            params,
            has_box=True,
            box_size=self.box_size,
            box_mass=self.box_mass,
            box_friction=self.box_friction,
            has_box2=True,
            box2_size=self.plat_size,
            box2_mass=self.plat_mass,
            box2_friction=self.plat_friction,
        )

    def init_task_states(self, num_envs: int) -> Dict[str, jnp.ndarray]:
        n = num_envs
        return {
            "platform_spawn_xy": jnp.zeros((n, 2), dtype=jnp.float32),
            "hold_duration_steps": jnp.zeros(n, dtype=jnp.int32),
            "prev_transport_dist": jnp.zeros(n, dtype=jnp.float32),
            # difficulty at reset time, carried per-env so compute_step can
            # evaluate the contact-allowance anneal (1.0 = strict criterion)
            "spawn_difficulty": jnp.ones(n, dtype=jnp.float32),
        }

    # ------------------------------------------------------------------
    def compute_step(
        self, obs_dict, task_states, physics, kin, body_contact_force,
        box_contact_force, control_dt, box2_contact_force=None,
    ) -> TaskStep:
        n = physics.q.shape[0]
        f32 = jnp.float32
        ts = dict(task_states)
        box_pos = physics.box_pos
        box_vel = physics.box_linvel
        plat_pos = physics.box2_pos

        # stack target point: centered on the platform's top face
        target = jnp.concatenate(
            [plat_pos[:, :2], jnp.full((n, 1), 0.0, dtype=f32)], axis=-1
        )
        target = target.at[:, 2].set(plat_pos[:, 2] + (self.plat_size + self.box_size) / 2.0)
        to_target = target - box_pos
        transport_dist = jnp.linalg.norm(to_target, axis=-1)
        xy_err = jnp.linalg.norm(to_target[:, :2], axis=-1)
        z_err = jnp.abs(to_target[:, 2])
        speed = jnp.linalg.norm(box_vel, axis=-1)

        # ---------- task observations ----------
        obs: Dict[str, jnp.ndarray] = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = physics.box_quat
        obs["object_vel"] = box_vel
        obs["platform_pos"] = plat_pos
        obs["platform_quat"] = physics.box2_quat
        obs["to_stack_target"] = to_target
        obs["stack_dist"] = transport_dist[:, None]

        pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
        d_f2o = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
        obs["finger_to_object_distances"] = d_f2o

        fb_contact = detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos, self.box_size,
            self.contact_binary_threshold,
        )
        obs["fingers_on_box"] = fb_contact.astype(f32)
        n_on_i = fb_contact.sum(axis=1)

        # ---------- stacked-state tracking ----------
        # released gate: success requires the hand to have LET GO of the
        # cube — without it a policy could hover-hold the grasped cube at
        # the stack pose for hold_duration_threshold and "succeed" without
        # ever placing it (mirrors how lift/transport are gated on `held`)
        # bridge anneal (see __init__): 1 at d=0 -> 0 at d>=anneal_end;
        # release_anneal_end == 0.0 keeps the strict criterion everywhere
        if self.release_anneal_end > 0.0:
            bridge = jnp.clip(
                1.0 - ts["spawn_difficulty"] / self.release_anneal_end,
                0.0, 1.0,
            )
        else:
            bridge = jnp.zeros(n, dtype=f32)
        relax = 1.0 + (self.tolerance_relax - 1.0) * bridge
        at_pose = (xy_err < self.position_tolerance * relax) & (
            z_err < self.height_tolerance * relax
        )
        # contact-allowance anneal: fingers allowed on the cube while
        # "stacked", stepping 3 -> 0 with the spawn difficulty
        allowed = jnp.floor(3.0 * bridge + 1e-6).astype(jnp.int32)
        stacked = (
            at_pose
            & (speed < self.rest_speed_tolerance)
            & (n_on_i <= allowed)
        )
        steps = jnp.where(stacked, ts["hold_duration_steps"] + 1, 0)
        ts["hold_duration_steps"] = steps
        obs["hold_duration"] = (steps.astype(f32) * control_dt)[:, None]

        # ---------- criteria ----------
        hold_secs = self.hold_duration_threshold - (
            self.hold_duration_threshold - self.hold_anneal_min
        ) * bridge
        threshold_steps = jnp.round(hold_secs / control_dt).astype(jnp.int32)
        successes = {"stack_success": steps >= threshold_steps}
        plat_moved = jnp.linalg.norm(
            plat_pos[:, :2] - ts["platform_spawn_xy"], axis=-1
        )
        failures = {
            "box_too_far": jnp.linalg.norm(
                box_pos[:, :2], axis=-1
            ) > self.box_far_threshold,
            # platform drift tolerance rides the same bridge (2x at d=0):
            # at low difficulty the platform spawns only ~4-6 cm away, so
            # a strict 5 cm limit turns every near-platform approach into
            # a -100 lottery and teaches approach AVOIDANCE (measured:
            # lift raw declined 0.15 -> 0.06 over 10k iters, failure 96%)
            "platform_moved": plat_moved > self.platform_move_tolerance * relax,
        }
        tips3 = obs_dict["fingertip_poses_world"].reshape(n, 5, 7)[:, :, :3]
        if self.fingertip_bridge_margin > 0.0 or self.pocket_margin > 0.0:
            # bridged/pocket hitting_ground override (see __init__); takes
            # precedence over the builtin in both step paths. The pocket
            # relaxation is PER-TIP: a tip survives the relaxed limit only
            # while both the cube and THAT tip are within pocket_radius of
            # the stack point — a tip grazing the ground away from the
            # platform keeps the strict rule even mid-place.
            tip_pocket = (transport_dist < self.pocket_radius)[:, None] & (
                jnp.linalg.norm(
                    tips3[:, :, :2] - target[:, None, :2], axis=-1
                ) < self.pocket_radius
            )
            # the pocket margin anneals on its own schedule (strict at
            # sd >= pocket_anneal_end; see __init__) — decoupled from the
            # contact-allowance bridge
            if self.pocket_anneal_end > 0.0:
                pocket_bridge = jnp.clip(
                    1.0 - ts["spawn_difficulty"] / self.pocket_anneal_end,
                    0.0, 1.0,
                )
            else:
                pocket_bridge = jnp.zeros_like(bridge)
            margin = self.fingertip_bridge_margin * bridge[:, None] + \
                jnp.where(
                    tip_pocket,
                    self.pocket_margin * pocket_bridge[:, None], 0.0,
                )
            failures["hitting_ground"] = (
                (obs_dict["hand_pose"][:, 2] < self.handbase_threshold)
                | (tips3[:, :, 2]
                   < self.fingertip_threshold - margin).any(axis=1)
            )

        # ---------- rewards ----------
        r: Dict[str, jnp.ndarray] = {}
        r["fingerpad_proximity"] = jnp.exp(
            -self.proximity_decay * d_f2o.min(axis=1)
        )
        n_on = n_on_i.astype(f32)
        r["finger_contact"] = jnp.minimum(n_on, 3.0) / 3.0
        # carrying: holding the cube off the ground — but NOT once the cube
        # is at the stack pose: the carry rewards stop paying there, so
        # hover-holding at the target is strictly worse than releasing
        # (place + stacked_hold only pay a settled, released cube)
        held = (n_on >= 2) & (box_pos[:, 2] > self.box_z + 0.02)
        carrying = held & ~at_pose
        r["lift"] = carrying.astype(f32)
        # transport shaping: exponential proximity to the stack point, gated
        # on holding the cube so pushing it along the ground scores nothing
        r["transport"] = carrying.astype(f32) * jnp.exp(
            -self.transport_decay * transport_dist
        )
        # dense improvement term (potential difference, held or not: also
        # rewards a settled cube sliding into place)
        r["transport_delta"] = ts["prev_transport_dist"] - transport_dist
        # placement: tight shaping near the stack pose, no grasp gate (the
        # hand must RELEASE to finish, so the reward cannot require contact)
        r["place"] = jnp.exp(-self.place_decay * (xy_err + z_err))
        r["stacked_hold"] = stacked.astype(f32)
        # shaped release (round-3 lever): once the cube is at the stack
        # pose, pay for every finger taken OFF it — a per-finger gradient
        # from hover-hold (0) to full release (1). Gated on at_pose so it
        # can never reward simply not grasping; only reachable by first
        # carrying the cube to the pose.
        r["release"] = at_pose.astype(f32) * (
            1.0 - jnp.minimum(n_on, 3.0) / 3.0
        )
        # under-box clearance penalty (see __init__; BlindGrasping twin)
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
        # dense platform-drift penalty (round-4 lever): the round-4 eval of
        # the 40k round-3 checkpoint failed 94.1% by platform_moved at the
        # strict 5 cm limit — the policy learned to shove the platform
        # under the bridge-relaxed training tolerance. Penalize drift
        # beyond a free margin EVERY step so "keep the platform still" has
        # a gradient long before the hard termination. Rides the bridge
        # anneal (zero at d=0 -> full at d >= release_anneal_end): a
        # constant-strength version was measured to collapse fresh runs
        # into whole-region avoidance (finger_contact raw 0.003 at 8.7k
        # iters — the platform spawns 4-6 cm from the cube at low
        # difficulty, so early random pokes pay the penalty before
        # grasping exists; the same failure mode as the under-box -100).
        r["platform_drift_penalty"] = jnp.maximum(
            plat_moved - self.drift_free_margin, 0.0
        ) * (1.0 - bridge)
        ts["prev_transport_dist"] = transport_dist

        return TaskStep(
            task_obs=obs,
            task_states=ts,
            success_criteria=successes,
            failure_criteria=failures,
            reward_terms=r,
        )

    # ------------------------------------------------------------------
    def lane_step(self, ctx):
        """Lane-vector `compute_step` for the fused env-step kernel
        (envs/fused_step.py): mirrors `compute_step` above term for term
        (tests/test_fused_step.py asserts the two paths agree). First task
        to use the kernel's multi-object lanes: ctx.box2_* carries the
        platform cube."""
        from types import SimpleNamespace

        f32 = jnp.float32
        obs_d, ts, dt = ctx.obs, ctx.ts, ctx.control_dt
        box_pos, box_vel = ctx.box_pos, ctx.box_linvel
        plat_pos = ctx.box2_pos

        def sub(a, b):
            return tuple(x - y for x, y in zip(a, b))

        def norm(v):
            return jnp.sqrt(sum(x * x for x in v))

        target = (
            plat_pos[0], plat_pos[1],
            plat_pos[2] + (self.plat_size + self.box_size) / 2.0,
        )
        to_target = sub(target, box_pos)
        transport_dist = norm(to_target)
        xy_err = jnp.sqrt(
            to_target[0] * to_target[0] + to_target[1] * to_target[1]
        )
        z_err = jnp.abs(to_target[2])
        speed = norm(box_vel)

        obs = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = ctx.box_quat
        obs["object_vel"] = box_vel
        obs["platform_pos"] = plat_pos
        obs["platform_quat"] = ctx.box2_quat
        obs["to_stack_target"] = to_target
        obs["stack_dist"] = (transport_dist,)

        pads = [
            obs_d["fingerpad_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        d_f2o = tuple(norm(sub(p, box_pos)) for p in pads)
        obs["finger_to_object_distances"] = d_f2o

        # heuristic finger-box contact (tasks/api.py
        # detect_finger_box_contacts, lane form)
        box_has = norm(ctx.box_contact_force) > self.contact_binary_threshold
        prox_thr = math.sqrt(3.0) * self.box_size / 2.0 * 1.2
        fb = [
            (obs_d["contact_binary"][i] > 0.5) & box_has
            & (d_f2o[i] < prox_thr)
            for i in range(5)
        ]
        obs["fingers_on_box"] = tuple(b.astype(f32) for b in fb)
        n_on_i = fb[0].astype(jnp.int32)
        for b in fb[1:]:
            n_on_i = n_on_i + b.astype(jnp.int32)
        n_on = n_on_i.astype(f32)

        # bridge anneal twin (compute_step above)
        if self.release_anneal_end > 0.0:
            bridge = jnp.clip(
                1.0 - ts["spawn_difficulty"][0] / self.release_anneal_end,
                0.0, 1.0,
            )
        else:
            bridge = jnp.zeros_like(xy_err)
        relax = 1.0 + (self.tolerance_relax - 1.0) * bridge
        at_pose = (xy_err < self.position_tolerance * relax) & (
            z_err < self.height_tolerance * relax
        )
        allowed = jnp.floor(3.0 * bridge + 1e-6).astype(jnp.int32)
        stacked = (
            at_pose
            & (speed < self.rest_speed_tolerance)
            & (n_on_i <= allowed)
        )
        steps = jnp.where(stacked, ts["hold_duration_steps"][0] + 1, 0)
        obs["hold_duration"] = (steps.astype(f32) * dt,)

        hold_secs = self.hold_duration_threshold - (
            self.hold_duration_threshold - self.hold_anneal_min
        ) * bridge
        threshold_steps = jnp.round(hold_secs / dt).astype(jnp.int32)
        successes = {"stack_success": steps >= threshold_steps}
        spawn_xy = ts["platform_spawn_xy"]
        plat_moved = jnp.sqrt(
            (plat_pos[0] - spawn_xy[0]) ** 2 + (plat_pos[1] - spawn_xy[1]) ** 2
        )
        failures = {
            "box_too_far": jnp.sqrt(
                box_pos[0] * box_pos[0] + box_pos[1] * box_pos[1]
            ) > self.box_far_threshold,
            # bridge-scaled drift tolerance (compute_step above)
            "platform_moved": plat_moved > self.platform_move_tolerance * relax,
        }
        tips = [
            obs_d["fingertip_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        if self.fingertip_bridge_margin > 0.0 or self.pocket_margin > 0.0:
            # bridged/pocket override, lane twin of compute_step above:
            # the pocket relaxation is per-tip (cube AND tip in pocket)
            # and anneals on its own pocket_anneal_end schedule
            cube_in_pocket = transport_dist < self.pocket_radius
            if self.pocket_anneal_end > 0.0:
                pocket_bridge = jnp.clip(
                    1.0 - ts["spawn_difficulty"][0]
                    / self.pocket_anneal_end,
                    0.0, 1.0,
                )
            else:
                pocket_bridge = jnp.zeros_like(bridge)
            tip_violation = None
            for t in tips:
                tip_xy = jnp.sqrt(
                    (t[0] - target[0]) ** 2 + (t[1] - target[1]) ** 2
                )
                m = self.fingertip_bridge_margin * bridge + jnp.where(
                    cube_in_pocket & (tip_xy < self.pocket_radius),
                    self.pocket_margin * pocket_bridge, 0.0,
                )
                v = t[2] < self.fingertip_threshold - m
                tip_violation = v if tip_violation is None else (
                    tip_violation | v
                )
            failures["hitting_ground"] = (
                (obs_d["hand_pose"][2] < self.handbase_threshold)
                | tip_violation
            )

        r = {}
        dmin = d_f2o[0]
        for d in d_f2o[1:]:
            dmin = jnp.minimum(dmin, d)
        r["fingerpad_proximity"] = jnp.exp(-self.proximity_decay * dmin)
        r["finger_contact"] = jnp.minimum(n_on, 3.0) / 3.0
        held = (n_on_i >= 2) & (box_pos[2] > self.box_z + 0.02)
        carrying = held & ~at_pose
        r["lift"] = carrying.astype(f32)
        r["transport"] = carrying.astype(f32) * jnp.exp(
            -self.transport_decay * transport_dist
        )
        r["transport_delta"] = ts["prev_transport_dist"][0] - transport_dist
        r["place"] = jnp.exp(-self.place_decay * (xy_err + z_err))
        r["stacked_hold"] = stacked.astype(f32)
        r["release"] = at_pose.astype(f32) * (
            1.0 - jnp.minimum(n_on, 3.0) / 3.0
        )
        # under-box clearance penalty twin
        half = self.box_size / 2.0 * self.under_box_footprint_factor
        near_ground = (box_pos[2] < self.under_box_ground_z).astype(f32)
        under = ctx.zero
        for t in tips:
            in_fp = (
                (jnp.abs(t[0] - box_pos[0]) < half)
                & (jnp.abs(t[1] - box_pos[1]) < half)
            ).astype(f32)
            under = under + in_fp * jnp.clip(
                self.under_box_margin - t[2], 0.0, None
            )
        r["under_box_penalty"] = under * near_ground
        # dense platform-drift penalty, lane twin (compute_step above):
        # rides the bridge anneal, zero at difficulty 0
        r["platform_drift_penalty"] = jnp.maximum(
            plat_moved - self.drift_free_margin, 0.0
        ) * (1.0 - bridge)

        ts_new = {
            "platform_spawn_xy": spawn_xy,
            "hold_duration_steps": (steps,),
            "prev_transport_dist": (transport_dist,),
            "spawn_difficulty": ts["spawn_difficulty"],
        }
        # all four task states are provided by reset_task, so the sampled
        # reset rows carry them verbatim
        reset_ts = {k: ctx.reset_ts[k] for k in ts_new}
        return SimpleNamespace(
            task_obs=obs, ts_new=ts_new, success=successes,
            failure=failures, rewards=r, reset_ts=reset_ts,
        )

    # ------------------------------------------------------------------
    def reset_task(
        self, key, num_envs, default_dof_pos, difficulty=None
    ) -> TaskReset:
        n = num_envs
        (
            k_box, k_yaw, k_dir, k_dist, k_pyaw, k_trans, k_rot, k_fing,
            k_rev, k_rjit, k_rfing, k_band, k_btop,
        ) = jax.random.split(key, 13)
        f32 = jnp.float32

        # per-env difficulty band (see __init__); collapses at difficulty
        # 1.0 so eval and full-difficulty training stay exact. A
        # band_top_fraction of envs spawn EXACTLY at the controller's
        # difficulty so the strict top-of-band setting has real
        # probability mass — these are the episodes the eval-matched
        # promotion gate (train.py promote_strict) counts.
        if (
            self.curriculum_enabled and difficulty is not None
            and self.difficulty_band > 0.0
        ):
            d0 = jnp.asarray(difficulty, f32)
            band = jnp.where(d0 < 1.0, self.difficulty_band, 0.0)
            banded = jnp.clip(
                d0 - jax.random.uniform(k_band, (n,)) * band, 0.0, 1.0
            )
            at_top = (
                jax.random.uniform(k_btop, (n,)) < self.band_top_fraction
            )
            difficulty = jnp.where(at_top, d0, banded)

        scale = curriculum_scale(
            difficulty, self.curriculum_min_fraction, self.curriculum_enabled
        )
        scale_col = scale[:, None] if getattr(scale, "ndim", 0) == 1 else scale

        # pick cube: under the hand, like BlindGrasping
        xy = (jax.random.uniform(k_box, (n, 2)) * 2 - 1) * self.box_xy_range
        box_pos = jnp.concatenate(
            [xy, jnp.full((n, 1), self.box_z, dtype=f32)], axis=-1
        )
        yaw = (jax.random.uniform(k_yaw, (n,)) * 2 - 1) * math.pi * scale
        box_quat = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.sin(yaw / 2), jnp.cos(yaw / 2)],
            axis=-1,
        )

        # platform cube: random direction, curriculum-scaled distance
        theta = jax.random.uniform(k_dir, (n,)) * 2.0 * math.pi
        mag = self.plat_dist_min + (
            jax.random.uniform(k_dist, (n,))
            * (self.plat_dist_max - self.plat_dist_min)
        ) * scale
        plat_xy = jnp.stack(
            [mag * jnp.cos(theta), mag * jnp.sin(theta)], axis=-1
        )
        pyaw = (jax.random.uniform(k_pyaw, (n,)) * 2 - 1) * math.pi
        box2_pos = jnp.concatenate(
            [plat_xy, jnp.full((n, 1), self.plat_size / 2.0, dtype=f32)],
            axis=-1,
        )
        box2_quat = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.sin(pyaw / 2), jnp.cos(pyaw / 2)],
            axis=-1,
        )

        # hand base + finger randomization (BlindGrasping-style amplitudes)
        dof = jnp.tile(default_dof_pos[None], (n, 1))
        trans = (
            (jax.random.uniform(k_trans, (n, 3)) * 2 - 1)
            * self.hand_translation_range * scale_col
        )
        rot = (
            (jax.random.uniform(k_rot, (n, 3)) * 2 - 1)
            * self.hand_rotation_range * scale_col
        )
        dof = dof.at[:, 0:3].set(trans).at[:, 3:6].set(rot)
        fingers = (
            jax.random.uniform(k_fing, (n, 20)) * self.finger_range * scale_col
        )
        dof = dof.at[:, 6:26].set(fingers)

        # reverse-spawn curriculum (see __init__): the cube starts ON the
        # platform top with the hand CAGING it — fingertips in contact at
        # the stack pose (round-3 redesign: the original hovering variant
        # made reverse episodes a do-nothing success, and the policy
        # collapsed to total avoidance — BASELINE.md BoxStacking notes).
        # With contact at spawn, success requires actively withdrawing the
        # fingers below the annealed allowance: exactly the release skill
        # forward exploration never reaches. The fraction anneals linearly
        # to zero at difficulty 1.0 (eval unaffected) and must stay BELOW
        # the promotion threshold (cfg default 0.25 < 0.3) so reverse
        # successes alone can never promote the curriculum.
        if self.curriculum_enabled:
            d = (
                jnp.asarray(difficulty, f32)
                if difficulty is not None else jnp.asarray(1.0, f32)
            )
            rev_p = self.reverse_spawn_fraction * (1.0 - d)
            rev = jax.random.uniform(k_rev, (n,)) < rev_p
            jit_xy = (jax.random.uniform(k_rjit, (n, 2)) * 2 - 1) * 0.005
            rev_box_pos = jnp.concatenate(
                [
                    plat_xy + jit_xy,
                    jnp.full(
                        (n, 1),
                        self.plat_size + self.box_size / 2.0 - 0.0008,
                        dtype=f32,
                    ),
                ],
                axis=-1,
            )
            box_pos = jnp.where(rev[:, None], rev_box_pos, box_pos)
            box_quat = jnp.where(
                rev[:, None],
                jnp.asarray([0.0, 0.0, 0.0, 1.0], f32), box_quat,
            )
            # caged hand posture (measured FK, dexhand021 at the task's
            # initialHandPos z=0.22: fingertip cluster sits at base-DOF
            # origin + (0.177, 0.017, -0.03)): base translation puts the
            # tips at the cube on the platform, fingers pre-curled 0.35 rad
            # -> 2-3 pads touch the cube at spawn (validated in
            # tests/test_box_stacking.py reverse-spawn test)
            stack_z = self.plat_size + self.box_size / 2.0
            rev_dof = jnp.zeros_like(dof)
            rev_dof = rev_dof.at[:, 0].set(plat_xy[:, 0] - 0.177)
            rev_dof = rev_dof.at[:, 1].set(plat_xy[:, 1] - 0.017)
            rev_dof = rev_dof.at[:, 2].set(stack_z - 0.19)
            rev_fing = 0.35 + (
                jax.random.uniform(k_rfing, (n, 20)) * 2 - 1
            ) * 0.05
            rev_dof = rev_dof.at[:, 6:26].set(rev_fing)
            dof = jnp.where(rev[:, None], rev_dof, dof)

        ts = self.init_task_states(n)
        ts["platform_spawn_xy"] = plat_xy
        ts["spawn_difficulty"] = jnp.broadcast_to(
            jnp.asarray(
                difficulty if difficulty is not None else 1.0, f32
            ),
            (n,),
        )
        # same stack-point definition as compute_step: platform center z +
        # (platform + cube)/2
        stack_pt = box2_pos.at[:, 2].add(
            (self.plat_size + self.box_size) / 2.0
        )
        ts["prev_transport_dist"] = jnp.linalg.norm(
            stack_pt - box_pos, axis=-1
        )
        return TaskReset(
            dof_pos=dof,
            box_pos=box_pos,
            box_quat=box_quat,
            box2_pos=box2_pos,
            box2_quat=box2_quat,
            task_states=ts,
        )
