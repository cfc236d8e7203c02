"""DexHand environment engine: the functional core + stateful wrapper.

TPU-native re-design of the reference's L1/L2 layers (`VecTask` +
`DexHandBase` + `StepProcessor`; SURVEY §1, §3.3): instead of a component
graph mutating Isaac Gym buffers, the whole control step is one pure function

    step(state, actions) -> (state', obs, reward, done, extras)

compiled under a single `jit`: action pipeline -> K physics steps -> obs dict
-> pre-action rule -> termination -> rewards -> masked auto-reset.

Step-ordering parity with the reference's hot loop
(dexhand_base.py:893-942 + step_processor.py:37-131):
1. pre-physics: process_actions consuming the previous step's
   `active_rule_targets` (dexhand_base.py:864-877)
2. physics: `physics_steps_per_control` simulator steps
3. post-physics: observations -> pre-action rule (stored for step N+1) ->
   episode count increment -> termination -> rewards -> termination rewards ->
   auto-reset of done envs -> extras. Returned observations for done envs are
   the terminal ones; the new episode's first observation appears at the next
   step (the reference's inline auto-reset, step_processor.py:109-111).

control_dt semantics: the reference *measures* physics-steps-per-control in a
worst-case init cycle and fixes control_dt = physics_dt x N forever after
(docs/control-dt-timing-diagram.md:68-99; measured N = 4 for both shipped
tasks). Here N is configured per task (`physics_steps_per_control`, default 4)
and resets are pure state substitutions, so every control cycle costs exactly
N physics steps -- the same timing-consistency invariant the reference
enforces with its unconditional reset-step (reset_manager.py:176-180), without
the measurement machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import NUM_DOFS
from dexrobot_isaac_tpu.envs import action as action_mod
from dexrobot_isaac_tpu.envs import observations as obs_mod
from dexrobot_isaac_tpu.envs import rewards as rew_mod
from dexrobot_isaac_tpu.envs import termination as term_mod
from dexrobot_isaac_tpu.envs.tasks.api import DexTask
from dexrobot_isaac_tpu.envs.types import EnvState
from dexrobot_isaac_tpu.models.dexhand021 import HandModel
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import DRSample, PhysicsState


@dataclasses.dataclass
class EnvComponents:
    """Everything static the step function closes over."""

    num_envs: int
    model: HandModel
    engine: HandPhysics
    pipeline: action_mod.ActionPipeline
    obs_cfg: obs_mod.ObsConfig
    reward_cfg: rew_mod.RewardConfig
    term_cfg: term_mod.TerminationConfig
    task: DexTask
    physics_steps_per_control: int
    control_dt: float
    spawn_pos: np.ndarray           # (3,)
    default_dof_pos: np.ndarray     # (26,)
    clip_observations: float
    clip_actions: float
    dr_ranges: Optional[Dict[str, Any]] = None   # None => DR disabled
    initial_difficulty: float = 1.0  # curriculum start (1.0 = full ranges)
    num_obs: int = -1               # filled after first trace

    @property
    def num_actions(self) -> int:
        return self.pipeline.num_actions


class DexHandEnv:
    """Stateful wrapper exposing the reference's env API surface
    (`step/reset/observation_space/action_space`; vec_task.py:44-170)."""

    def __init__(self, comps: EnvComponents, seed: int = 42):
        self.comps = comps
        # set to the mesh axis name when stepping inside shard_map: sampling
        # keys get the shard index folded in so per-env randomization
        # decorrelates across shards (parallel/distributed.py)
        self.axis_name: Optional[str] = None
        self.num_envs = comps.num_envs
        self.num_actions = comps.num_actions
        self.control_dt = comps.control_dt
        self._spawn_const = np.asarray(comps.spawn_pos, dtype=np.float32)
        self._spawn = np.tile(self._spawn_const[None], (comps.num_envs, 1))
        self._default_dof = np.asarray(comps.default_dof_pos, dtype=np.float32)
        self._control_step = comps.engine.make_control_step(
            comps.physics_steps_per_control
        )
        self._step_jit = jax.jit(self.step_fn, donate_argnums=0)
        self._reset_jit = jax.jit(self.reset_fn)
        self.state: Optional[EnvState] = None
        self.obs_slices: Dict[str, Tuple[int, int]] = {}
        self._seed = seed
        self._criteria_names = None
        self.num_states = 0   # set during trace when critic keys configured
        # probe obs dim with an abstract trace (no device compute); the trace
        # also captures obs slices and the produced criterion names
        shape = jax.eval_shape(
            self.reset_fn, jax.random.key(0)
        )
        # the buffer is [policy obs | privileged critic states]
        self.num_obs = int(shape[1].shape[-1]) - self.num_states
        comps.num_obs = self.num_obs
        # fail fast if an active criterion has no implementation
        # (reference termination_manager.py:98-118)
        if self._criteria_names is not None:
            comps.term_cfg.validate(*self._criteria_names)

    # ------------------------------------------------------------------
    # functional core
    # ------------------------------------------------------------------
    def _observe(
        self,
        phys: PhysicsState,
        kin,
        state_like: Dict[str, jnp.ndarray],
        task_states: Dict[str, jnp.ndarray],
    ):
        """Shared obs computation (default obs + task obs + pre-action rule).

        Mirrors compute_observations + apply_pre_action_rule + concat
        (step_processor.py:47-77)."""
        c = self.comps
        obs_dict, new_duration, contact_binary = obs_mod.compute_default_observations(
            c.obs_cfg,
            kin,
            phys.q,
            state_like["prev_dof_pos"],
            state_like["full_dof_targets"],
            state_like["active_prev_targets"],
            state_like["prev_actions"],
            state_like["body_contact_force"],
            state_like["contact_duration_steps"],
            state_like["prev_contact_binary"],
            state_like["episode_step_count"],
        )
        # box2_contact_force is only passed to tasks in has_box2 scenes, so
        # single-object task signatures stay untouched
        extra_kwargs = {}
        if state_like.get("box2_contact_force") is not None:
            extra_kwargs["box2_contact_force"] = state_like["box2_contact_force"]
        tstep = c.task.compute_step(
            obs_dict,
            task_states,
            phys,
            kin,
            state_like["body_contact_force"],
            state_like["box_contact_force"],
            c.control_dt,
            **extra_kwargs,
        )
        obs_dict.update(tstep.task_obs)

        # pre-action rule: default identity on active_prev_targets
        # (rules.py:78-95); output consumed next step
        if c.task.pre_action_rule is not None:
            active_rule = c.task.pre_action_rule(
                state_like["active_prev_targets"], obs_dict
            )
        else:
            active_rule = state_like["active_prev_targets"]
        obs_dict["active_rule_targets"] = active_rule

        obs_buf = obs_mod.concat_selected_observations(c.obs_cfg, obs_dict)
        if np.isfinite(c.clip_observations):
            obs_buf = jnp.clip(obs_buf, -c.clip_observations, c.clip_observations)
        # asymmetric actor-critic: append the privileged critic ("states")
        # slice after the policy slice. The actor trunk consumes
        # [:num_obs], the critic trunk [num_obs:] (rl/networks.py). Keeping
        # one buffer leaves every step/rollout signature unchanged.
        if c.obs_cfg.critic_observation_keys:
            critic_buf = obs_mod.concat_selected_observations(
                c.obs_cfg, obs_dict, keys=c.obs_cfg.critic_observation_keys
            )
            if np.isfinite(c.clip_observations):
                critic_buf = jnp.clip(
                    critic_buf, -c.clip_observations, c.clip_observations
                )
            self.num_states = int(critic_buf.shape[-1])
            obs_buf = jnp.concatenate([obs_buf, critic_buf], axis=-1)
        # capture per-key dims once (shapes are static under tracing); feeds
        # the semantic index-lookup API (reference obs-index API parity)
        if not self.obs_slices:
            self.obs_slices = obs_mod.observation_slices(c.obs_cfg, obs_dict)
        if self._criteria_names is None:
            self._criteria_names = (
                set(tstep.success_criteria),
                {"hitting_ground", *tstep.failure_criteria},
            )
        return obs_dict, obs_buf, tstep, active_rule, new_duration, contact_binary

    def _check_reset_vals(self, reset_vals) -> None:
        """Fail fast (at build/trace time) when the scene has a second free
        body but the task's reset_task omits its pose: silently falling
        through would leave reset envs with the platform at its current
        (possibly knocked-over) pose while velocities are zeroed — and the
        initial reset would build an inconsistent PhysicsState (None box2
        pose with zeroed box2 velocities) that crashes in the engine."""
        if self.comps.engine.params.has_box2 and (
            reset_vals.box2_pos is None or reset_vals.box2_quat is None
        ):
            raise ValueError(
                f"task {self.comps.task.name!r} configures a has_box2 scene "
                "but reset_task did not provide box2_pos/box2_quat"
            )

    def step_fn(self, state: EnvState, actions: jnp.ndarray):
        c = self.comps
        n = state.physics.q.shape[0]  # LOCAL batch under shard_map
        key, reset_key, dr_key = jax.random.split(state.rng, 3)
        if self.axis_name is not None:
            shard = jax.lax.axis_index(self.axis_name)
            reset_key = jax.random.fold_in(reset_key, shard)
            dr_key = jax.random.fold_in(dr_key, shard)

        # --- pre-physics: action pipeline (SURVEY §2.3) ---
        if np.isfinite(c.clip_actions):
            actions = jnp.clip(actions, -c.clip_actions, c.clip_actions)
        full_targets, active_targets = action_mod.process_actions(
            c.pipeline, actions, state.active_prev_targets, state.active_rule_targets
        )

        # --- physics: N lockstep steps (one fused Pallas kernel on TPU) ---
        # spawn is broadcast from the LOCAL batch size: under shard_map the
        # per-shard state is smaller than num_envs
        spawn = jnp.broadcast_to(self._spawn_const[None], (n, 3))
        # the control step also returns the final-state FK (computed inside
        # the fused kernel on TPU) so no separate vmapped FK runs per step
        phys, info, kin = self._control_step(
            state.physics, full_targets, spawn, state.dr
        )

        # --- post-physics ---
        state_like = {
            "prev_dof_pos": state.prev_dof_pos,
            "full_dof_targets": full_targets,
            "active_prev_targets": active_targets,
            "prev_actions": actions,
            "body_contact_force": info.body_contact_force,
            "box_contact_force": info.box_contact_force,
            "box2_contact_force": info.box2_contact_force,
            "contact_duration_steps": state.contact_duration_steps,
            "prev_contact_binary": state.prev_contact_binary,
            "episode_step_count": state.episode_step_count,
        }
        (
            obs_dict, obs_buf, tstep, active_rule, new_duration, contact_binary
        ) = self._observe(phys, kin, state_like, state.task_states)

        new_count = state.episode_step_count + 1

        # --- termination (step_processor.py:83-89) ---
        failure_criteria = {
            **term_mod.builtin_failure_criteria(c.term_cfg, obs_dict),
            **tstep.failure_criteria,
        }
        (
            should_reset, term_info, term_reward, term_components,
            new_sflags, new_fflags,
        ) = term_mod.evaluate_termination(
            c.term_cfg,
            new_count,
            tstep.success_criteria,
            failure_criteria,
            state.success_flags,
            state.failure_flags,
        )

        # --- rewards (step_processor.py:94-104) ---
        hand_vel = kin.body_linvel[:, c.obs_cfg.hand_body_index]
        hand_ang_vel = kin.body_angvel[:, c.obs_cfg.hand_body_index]
        dof_vel = jnp.concatenate(
            [obs_dict["base_dof_vel"], obs_dict["all_finger_dof_vel"]], axis=-1
        )
        common, rtrack = rew_mod.compute_common_reward_terms(
            c.reward_cfg, obs_dict, phys.q, dof_vel, hand_vel, hand_ang_vel,
            state.prev_finger_dof_vel, state.prev_hand_vel,
            state.prev_hand_ang_vel, state.prev_contacts,
        )
        total, components = rew_mod.compute_total_reward(
            c.reward_cfg, common, tstep.reward_terms
        )
        rew = total + term_reward
        components.update(term_components)

        # consecutive successes: +1 on any step with a success anywhere,
        # zeroed on any step without one, capped
        # (termination_manager.py:330-338)
        any_success = term_info["success"].any()
        if self.axis_name is not None:
            # "anywhere" means across ALL shards: the scalar state leaf has a
            # replicated out-spec, so it must be globally consistent
            any_success = jax.lax.pmax(
                any_success.astype(jnp.int32), self.axis_name
            ) > 0
        consecutive = jnp.where(
            any_success,
            jnp.minimum(
                state.consecutive_successes + 1,
                c.term_cfg.max_consecutive_successes,
            ),
            0,
        )

        # --- auto-reset of done envs (masked; reset_manager.py:92-190) ---
        reset_vals = c.task.reset_task(
            reset_key, n, self._default_dof, difficulty=state.difficulty
        )
        self._check_reset_vals(reset_vals)
        done = should_reset
        m1 = done[:, None]

        reset_active = action_mod.extract_active_targets(
            c.pipeline, reset_vals.dof_pos
        )
        new_phys = PhysicsState(
            q=jnp.where(m1, reset_vals.dof_pos, phys.q),
            qd=jnp.where(m1, 0.0, phys.qd),
            box_pos=(
                jnp.where(m1, reset_vals.box_pos, phys.box_pos)
                if reset_vals.box_pos is not None else phys.box_pos
            ),
            box_quat=(
                jnp.where(m1, reset_vals.box_quat, phys.box_quat)
                if reset_vals.box_quat is not None else phys.box_quat
            ),
            box_linvel=jnp.where(m1, 0.0, phys.box_linvel),
            box_angvel=jnp.where(m1, 0.0, phys.box_angvel),
            box2_pos=(
                jnp.where(m1, reset_vals.box2_pos, phys.box2_pos)
                if phys.box2_pos is not None
                and reset_vals.box2_pos is not None else phys.box2_pos
            ),
            box2_quat=(
                jnp.where(m1, reset_vals.box2_quat, phys.box2_quat)
                if phys.box2_quat is not None
                and reset_vals.box2_quat is not None else phys.box2_quat
            ),
            box2_linvel=(
                jnp.where(m1, 0.0, phys.box2_linvel)
                if phys.box2_linvel is not None else None
            ),
            box2_angvel=(
                jnp.where(m1, 0.0, phys.box2_angvel)
                if phys.box2_angvel is not None else None
            ),
        )

        if c.dr_ranges:
            dr_new = DRSample.sample(dr_key, n, c.dr_ranges)
            new_dr = jax.tree.map(
                lambda new, cur: jnp.where(done, new, cur), dr_new, state.dr
            )
        else:
            new_dr = state.dr

        task_states = dict(tstep.task_states)
        if reset_vals.task_states:
            for k, v in reset_vals.task_states.items():
                cur = task_states[k]
                mk = done.reshape(done.shape + (1,) * (cur.ndim - 1))
                task_states[k] = jnp.where(mk, v, cur)

        new_state = EnvState(
            physics=new_phys,
            full_dof_targets=jnp.where(m1, reset_vals.dof_pos, full_targets),
            active_prev_targets=jnp.where(m1, reset_active, active_targets),
            active_rule_targets=jnp.where(m1, reset_active, active_rule),
            prev_actions=jnp.where(m1, 0.0, actions),
            prev_dof_pos=jnp.where(m1, reset_vals.dof_pos, phys.q),
            contact_duration_steps=jnp.where(m1, 0, new_duration),
            prev_contact_binary=jnp.where(m1, 0.0, contact_binary),
            episode_step_count=jnp.where(done, 0, new_count),
            body_contact_force=jnp.where(m1[..., None], 0.0, info.body_contact_force),
            prev_finger_dof_vel=jnp.where(m1, 0.0, rtrack["prev_finger_dof_vel"]),
            prev_hand_vel=jnp.where(m1, 0.0, rtrack["prev_hand_vel"]),
            prev_hand_ang_vel=jnp.where(m1, 0.0, rtrack["prev_hand_ang_vel"]),
            prev_contacts=jnp.where(m1, False, rtrack["prev_contacts"]),
            success_flags={
                k: jnp.where(done, False, v) for k, v in new_sflags.items()
            },
            failure_flags={
                k: jnp.where(done, False, v) for k, v in new_fflags.items()
            },
            consecutive_successes=consecutive,
            task_states=task_states,
            dr=new_dr,
            rng=key,
            difficulty=state.difficulty,
        )

        extras = {
            "consecutive_successes": consecutive,
            "episode_length": new_count,
            "reward_components": components,
            **term_info,
        }
        if "spawn_difficulty" in state.task_states:
            # eval-matched curriculum gating (train.py promote_strict):
            # success among episodes spawned EXACTLY at the controller's
            # difficulty. Uses the PRE-step task state — spawn_difficulty
            # is constant through an episode and re-sampled only at reset,
            # so this is the ending episode's spawn value.
            strict = (
                state.task_states["spawn_difficulty"]
                >= state.difficulty - 1e-4
            )
            extras["success_strict"] = term_info["success"] & strict
            extras["done_strict"] = done & strict
        if self.axis_name is not None:
            # scalar diagnostics must be replicated across shards
            extras = jax.tree.map(
                lambda v: jax.lax.pmean(v, self.axis_name)
                if getattr(v, "ndim", 1) == 0 else v,
                extras,
            )
        return new_state, obs_buf, rew, done, extras

    def reset_fn(self, key: jax.Array, num_envs: Optional[int] = None):
        """Full reset of all envs + initial observation
        (dexhand_base.py:805-838).

        `num_envs` overrides the batch size for per-shard construction under
        shard_map (parallel/distributed.py make_sharded_reset): each process
        builds only its local slice of the global env batch. With axis_name
        set, the shard index is folded into the sampling keys so reset
        randomization decorrelates across shards while the carried
        EnvState.rng stays replicated (same invariant as step_fn)."""
        c = self.comps
        n = int(num_envs) if num_envs is not None else c.num_envs
        key, task_key, dr_key = jax.random.split(key, 3)
        if self.axis_name is not None:
            shard = jax.lax.axis_index(self.axis_name)
            task_key = jax.random.fold_in(task_key, shard)
            dr_key = jax.random.fold_in(dr_key, shard)
        difficulty = jnp.asarray(c.initial_difficulty, dtype=jnp.float32)
        reset_vals = c.task.reset_task(
            task_key, n, self._default_dof, difficulty=difficulty
        )
        self._check_reset_vals(reset_vals)

        phys = PhysicsState(
            q=reset_vals.dof_pos,
            qd=jnp.zeros((n, NUM_DOFS), dtype=jnp.float32),
            box_pos=(
                reset_vals.box_pos if reset_vals.box_pos is not None
                else jnp.zeros((n, 3), dtype=jnp.float32)
            ),
            box_quat=(
                reset_vals.box_quat if reset_vals.box_quat is not None
                else jnp.zeros((n, 4), dtype=jnp.float32).at[:, 3].set(1.0)
            ),
            box_linvel=jnp.zeros((n, 3), dtype=jnp.float32),
            box_angvel=jnp.zeros((n, 3), dtype=jnp.float32),
            box2_pos=(
                reset_vals.box2_pos if c.engine.params.has_box2 else None
            ),
            box2_quat=(
                reset_vals.box2_quat if c.engine.params.has_box2 else None
            ),
            box2_linvel=(
                jnp.zeros((n, 3), dtype=jnp.float32)
                if c.engine.params.has_box2 else None
            ),
            box2_angvel=(
                jnp.zeros((n, 3), dtype=jnp.float32)
                if c.engine.params.has_box2 else None
            ),
        )
        spawn = jnp.broadcast_to(self._spawn_const[None], (n, 3))
        kin = jax.vmap(c.engine.fk)(phys.q, phys.qd, spawn)
        n_contact = c.obs_cfg.num_contact_bodies
        reset_active = action_mod.extract_active_targets(
            c.pipeline, reset_vals.dof_pos
        )
        b = c.model.num_bodies
        state_like = {
            "prev_dof_pos": reset_vals.dof_pos,
            "full_dof_targets": reset_vals.dof_pos,
            "active_prev_targets": reset_active,
            "prev_actions": jnp.zeros((n, c.num_actions), dtype=jnp.float32),
            "body_contact_force": jnp.zeros((n, b, 3), dtype=jnp.float32),
            "box_contact_force": jnp.zeros((n, 3), dtype=jnp.float32),
            "box2_contact_force": (
                jnp.zeros((n, 3), dtype=jnp.float32)
                if c.engine.params.has_box2 else None
            ),
            "contact_duration_steps": jnp.zeros((n, n_contact), dtype=jnp.int32),
            "prev_contact_binary": jnp.zeros((n, n_contact), dtype=jnp.float32),
            "episode_step_count": jnp.zeros((n,), dtype=jnp.int32),
        }
        task_states = c.task.init_task_states(n)
        if reset_vals.task_states:
            task_states.update(reset_vals.task_states)
        (
            obs_dict, obs_buf, tstep, active_rule, new_duration, contact_binary
        ) = self._observe(phys, kin, state_like, task_states)

        state = EnvState(
            physics=phys,
            full_dof_targets=state_like["full_dof_targets"],
            active_prev_targets=reset_active,
            active_rule_targets=active_rule,
            prev_actions=state_like["prev_actions"],
            prev_dof_pos=state_like["prev_dof_pos"],
            contact_duration_steps=jnp.zeros((n, n_contact), dtype=jnp.int32),
            prev_contact_binary=jnp.zeros((n, n_contact), dtype=jnp.float32),
            episode_step_count=jnp.zeros((n,), dtype=jnp.int32),
            body_contact_force=state_like["body_contact_force"],
            prev_finger_dof_vel=jnp.zeros((n, 20), dtype=jnp.float32),
            prev_hand_vel=jnp.zeros((n, 3), dtype=jnp.float32),
            prev_hand_ang_vel=jnp.zeros((n, 3), dtype=jnp.float32),
            prev_contacts=jnp.zeros((n, n_contact), dtype=bool),
            # flag keys must match what evaluate_termination will track: with
            # empty active_* lists ALL produced criteria are active
            # (termination_manager.py:160-170 "empty means use all available")
            success_flags={
                k: jnp.zeros(n, dtype=bool)
                for k in tstep.success_criteria
                if not c.term_cfg.active_success_criteria
                or k in c.term_cfg.active_success_criteria
            },
            failure_flags={
                k: jnp.zeros(n, dtype=bool)
                for k in {
                    **term_mod.builtin_failure_criteria(c.term_cfg, obs_dict),
                    **tstep.failure_criteria,
                }
                if not c.term_cfg.active_failure_criteria
                or k in c.term_cfg.active_failure_criteria
            },
            consecutive_successes=jnp.zeros((), dtype=jnp.int32),
            task_states=tstep.task_states,
            dr=(
                DRSample.sample(dr_key, n, c.dr_ranges)
                if c.dr_ranges else DRSample.nominal(n)
            ),
            rng=key,
            difficulty=difficulty,
        )
        return state, obs_buf

    # ------------------------------------------------------------------
    # fused single-kernel step (envs/fused_step.py)
    # ------------------------------------------------------------------
    def make_fused(self, block: Optional[int] = None, interpret: bool = False,
                   backend: str = "pallas"):
        """Build the fused single-Pallas-kernel step for this env. Returns a
        namespace with `step_fn(FusedEnvState, actions)`, `pack`/`unpack`
        (EnvState <-> FusedEnvState), `reset(key)`, and `comp_names` (the
        reward-component packing order). Raises
        fused_step.FusedUnsupported when this configuration has no lane
        implementation — callers fall back to `step_fn` (the XLA reference
        path, which this kernel is parity-tested against)."""
        from dexrobot_isaac_tpu.envs.fused_step import build_fused_step

        return build_fused_step(
            self, block=block, interpret=interpret, backend=backend
        )

    # ------------------------------------------------------------------
    # stateful API (reference Env ABC surface, vec_task.py:44-170)
    # ------------------------------------------------------------------
    def reset(self):
        self.state, obs = self._reset_jit(jax.random.key(self._seed))
        # record semantic obs slices once (host-side, for the lookup API)
        return obs

    def toggle_random_actions(self):
        """Toggle random-action override (parity: the reference's SPACE-key
        debug override, dexhand_base.py:854-862)."""
        self._random_actions = not getattr(self, "_random_actions", False)
        return self._random_actions

    def step(self, actions):
        if self.state is None:
            self.reset()
        if getattr(self, "_random_actions", False):
            self._np_rng = getattr(self, "_np_rng", np.random.default_rng(0))
            actions = jnp.asarray(
                self._np_rng.uniform(-1, 1, (self.num_envs, self.num_actions)),
                dtype=jnp.float32,
            )
        self.state, obs, rew, done, extras = self._step_jit(self.state, actions)
        return obs, rew, done, extras

    def seed(self, seed: int):
        self._seed = seed

    def set_difficulty(self, value: float):
        """Set the curriculum difficulty on the wrapper's own state. External
        training loops holding their own EnvState should instead replace the
        `difficulty` leaf (see train.py's curriculum controller) -- same
        shape/dtype, so no recompilation."""
        if self.state is not None:
            self.state = dataclasses.replace(
                self.state,
                difficulty=jnp.asarray(float(value), dtype=jnp.float32),
            )

    # ------------------------------------------------------------------
    # semantic observation index lookup (parity: reference index-lookup API,
    # observation_encoder.py:999-1200)
    # ------------------------------------------------------------------
    def get_obs_slice(self, key: str) -> Tuple[int, int]:
        """(start, end) slice of `key` within the policy observation tensor."""
        if key not in self.obs_slices:
            raise KeyError(
                f"'{key}' is not in policy_observation_keys "
                f"(available: {sorted(self.obs_slices)})"
            )
        return self.obs_slices[key]

    def get_obs_index_for_base_joint(self, joint_name: str, obs_type: str = "pos") -> int:
        """Index of a base DOF within the policy tensor."""
        from dexrobot_isaac_tpu.constants import BASE_JOINT_NAMES

        key = {"pos": "base_dof_pos", "vel": "base_dof_vel",
               "target": "base_dof_target"}[obs_type]
        start, _ = self.get_obs_slice(key)
        return start + BASE_JOINT_NAMES.index(joint_name)

    def get_obs_index_for_finger_control(self, control_index: int, obs_type: str = "pos") -> int:
        """Index of an active finger control (0-11) within the policy tensor."""
        key = {"pos": "active_finger_dof_pos", "vel": "active_finger_dof_vel",
               "target": "active_finger_dof_target"}[obs_type]
        start, _ = self.get_obs_slice(key)
        return start + control_index

    @property
    def observation_space(self):
        return _Space((self.num_obs,))

    @property
    def action_space(self):
        return _Space((self.num_actions,), low=-1.0, high=1.0)

    def close(self):
        pass


@dataclasses.dataclass
class _Space:
    shape: Tuple[int, ...]
    low: float = -np.inf
    high: float = np.inf
