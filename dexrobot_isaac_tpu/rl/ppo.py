"""PPO learner: rollout + GAE + clipped-surrogate updates, fully on-device.

TPU-native replacement for the external `rl_games` a2c_continuous trainer the
reference delegates to (SURVEY §2.9; train.py:110-120 builds a Runner around
it). Hyperparameter semantics follow cfg/train/BaseTaskPPO.yaml:33-72:

- gamma 0.99 / GAE tau 0.95, horizon 16, minibatch = num_envs, mini_epochs 4
- adaptive LR on KL with threshold 0.008 (rl_games schedule: kl > 2*thr =>
  lr/1.5, kl < 0.5*thr => lr*1.5, clamped [1e-6, 1e-2])
- e_clip 0.2 ratio clipping, clipped value loss, critic_coef 4, entropy 0,
  bounds loss 1e-4 on mu outside [-1.1, 1.1], grad-norm clip 1.0
- obs + value running-stat normalization, value bootstrap on timeouts

One `train_iteration` = horizon-step rollout (lax.scan over the jitted env
step) + GAE + mini_epochs x num_minibatches updates (lax.scan over shuffled
minibatches) -- a single XLA program, so the whole PPO epoch runs without
host round-trips. Scale-out: shard the env-state/obs batch along the mesh
'data' axis and keep params replicated; jit then inserts psum gradient
reductions automatically (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dexrobot_isaac_tpu.rl.networks import ActorCritic
from dexrobot_isaac_tpu.rl.running_stats import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_actions: int
    num_obs: int
    num_envs: int
    # asymmetric actor-critic: width of the privileged critic slice the env
    # appends after the policy obs (env.num_states); 0 => symmetric
    num_states: int = 0
    horizon_length: int = 16
    minibatch_size: Optional[int] = None   # None => num_envs (reference parity)
    mini_epochs: int = 4
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"          # adaptive | fixed
    # When adaptive, WHERE the LR is adjusted (rl_games a2c_common.train_epoch):
    #   "standard"      - after each mini-epoch, on that epoch's mean KL
    #                     (reference default: cfg/train/BaseTaskPPO.yaml:55)
    #   "legacy"        - after every minibatch, on that minibatch's KL
    #   "per_iteration" - once per train iteration on the final epoch's mean KL
    schedule_type: str = "standard"
    kl_threshold: float = 0.008
    # Adaptive-LR clamp. Defaults are rl_games parity (AdaptiveScheduler
    # min_lr/max_lr). The 1e-2 ceiling is dangerous on long runs: as the
    # policy converges KL falls below threshold, the LR ratchets x1.5 to the
    # rail, and one oversized update can destroy a converged policy
    # (observed: 68% -> 0% success at iter ~22k). Overlays that train long
    # should set lr_ceiling ~1e-3.
    lr_floor: float = 1e-6
    lr_ceiling: float = 1e-2
    e_clip: float = 0.2
    grad_norm: float = 1.0
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 1e-4
    clip_value: bool = True
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    value_bootstrap: bool = True
    # Optional stability guard for timeout-heavy tasks: clip the NORMALIZED
    # value prediction at +/- this many sigma before every denormalized use
    # (timeout bootstrap + GAE). Breaks the value-variance feedback runaway
    # root-caused on BoxStacking (BASELINE.md) — but it also flattens
    # legitimately-extreme values (e.g. sparse success bonuses are >5 sigma
    # early in training, and a 5.0 clip measurably stalled BlindGrasping's
    # curriculum), so it is OFF by default (None = rl_games parity).
    value_clip_sigma: Optional[float] = None
    # Adaptive-LR floor recovery (BASELINE.md round-2 item): rl_games'
    # AdaptiveScheduler only clamps to [lr_floor, lr_ceiling] — after a KL
    # spike the LR rides the floor while oversized updates keep shredding
    # the policy (the round-2 DR leg died this way: KL spike at the 1e-3
    # ceiling -> LR wedged at 1e-6). With kl_skip_factor=N, any minibatch
    # whose measured policy drift already exceeds N * kl_threshold SKIPS its
    # parameter/optimizer update (the gradient is computed but not applied),
    # bounding per-iteration KL growth so the scheduler can ratchet back.
    # None = rl_games parity (no gate).
    kl_skip_factor: Optional[float] = None
    truncate_grads: bool = True
    # Minibatch shuffling per mini-epoch (rl_games parity = "permutation").
    # "rotation" replaces the full 131k-element sort-based permutation (TPU
    # sorts are expensive) with a per-epoch random circular shift: samples
    # still mix across minibatches between epochs at negligible cost —
    # REJECTED as default (BASELINE.md): composition varies only by offset,
    # too little decorrelation, BlindGrasping's curriculum never promoted.
    # "affine" is the middle ground: a per-epoch random affine bijection
    # i -> (k*i + c) mod N with k drawn from multipliers coprime to N —
    # genuinely fresh minibatch composition every epoch (stride-k sampling
    # across the whole batch) at gather cost, with the permutation's
    # 131k-element radix sort eliminated.
    shuffle: str = "permutation"   # permutation | affine | perm_roll | rotation
    units: Tuple[int, ...] = (512, 256, 128)
    network_dtype: str = "float32"   # "bfloat16" puts the MLP on the MXU fast path
    reward_shaper_scale: float = 1.0

    @property
    def obs_width(self) -> int:
        """Total width of the env obs buffer: policy obs + critic states."""
        return self.num_obs + self.num_states

    @property
    def batch_size(self) -> int:
        return self.horizon_length * self.num_envs

    @property
    def minibatch(self) -> int:
        return self.minibatch_size or self.num_envs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPOState:
    """Learner state threaded through train iterations."""

    params: Any
    opt_state: Any
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    lr: jnp.ndarray            # scalar, adaptive
    epoch: jnp.ndarray         # scalar int
    rng: jax.Array


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray         # normalized-space value prediction
    reward: jnp.ndarray        # shaped reward (+ bootstrap)
    done: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


def _gaussian_log_prob(mu, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mu) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1,
    )


def _policy_kl(mu, sigma, mu_old, sigma_old):
    """rl_games policy_kl: mean KL between diagonal Gaussians."""
    c1 = jnp.log(sigma / sigma_old + 1e-5)
    c2 = (sigma_old**2 + (mu_old - mu) ** 2) / (2.0 * sigma**2 + 1e-5)
    return jnp.mean(jnp.sum(c1 + c2 - 0.5, axis=-1))


class PPOLearner:
    """Builds the jitted train_iteration around a functional env."""

    def __init__(
        self,
        cfg: PPOConfig,
        env_step: Callable,      # (env_state, actions) -> (env_state, obs, rew, done, extras)
        seed: int = 42,
        axis_name: Optional[str] = None,
    ):
        """axis_name: when set, the learner assumes it runs inside shard_map
        over that mesh axis (env batch sharded, params replicated) and inserts
        the pmean collectives for gradients/statistics explicitly. When None,
        all reductions are local (single device, or GSPMD handles it)."""
        self.cfg = cfg
        self.env_step = env_step
        self.axis_name = axis_name
        self.network = ActorCritic(
            num_actions=cfg.num_actions,
            units=tuple(cfg.units),
            compute_dtype=jnp.dtype(cfg.network_dtype),
            num_states=cfg.num_states,
        )
        self._seed = seed
        # donate only the learner state: obs may alias a leaf of env_state at
        # call sites, and donating both trips XLA's donated-buffer reuse check
        self.train_iteration = jax.jit(self._train_iteration, donate_argnums=0)

    def make_chunked_train_step(self, chunk: int):
        """jit(lax.scan) over `chunk` train iterations: ONE dispatch (and, at
        log time, one sync) per chunk instead of per iteration. On a remote
        TPU the per-iteration dispatch is a host round trip; chunking
        amortizes it. Returns fn(ppo, env_state, obs) ->
        (ppo, env_state, obs, metrics[chunk, ...], extras[chunk, T, N, ...]).
        Stacked extras reshape to (chunk*T, N) in chronological order for the
        DeviceBreakdown reducer."""

        def body(carry, _):
            ppo, env_state, obs = carry
            ppo, env_state, obs, metrics, extras = self._train_iteration(
                ppo, env_state, obs
            )
            return (ppo, env_state, obs), (metrics, extras)

        def run(ppo, env_state, obs):
            (ppo, env_state, obs), (metrics, extras) = jax.lax.scan(
                body, (ppo, env_state, obs), None, length=chunk
            )
            return ppo, env_state, obs, metrics, extras

        return jax.jit(run, donate_argnums=0)

    # ------------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None) -> PPOState:
        cfg = self.cfg
        key = jax.random.key(self._seed) if key is None else key
        key, init_key = jax.random.split(key)
        params = self.network.init(
            init_key, jnp.zeros((1, cfg.obs_width), dtype=jnp.float32)
        )
        self._tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(cfg.grad_norm)
                if cfg.truncate_grads else optax.identity(),
                optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
            )
        )(learning_rate=cfg.learning_rate)
        opt_state = self._tx.init(params)
        return PPOState(
            params=params,
            opt_state=opt_state,
            obs_rms=RunningMeanStd.create((cfg.obs_width,)),
            value_rms=RunningMeanStd.create(()),
            lr=jnp.asarray(cfg.learning_rate, jnp.float32),
            epoch=jnp.asarray(0, jnp.int32),
            rng=key,
        )

    def _pmean(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.pmean(x, self.axis_name)

    # ------------------------------------------------------------------
    def _forward(self, params, obs_rms, obs):
        x = obs_rms.normalize(obs) if self.cfg.normalize_input else obs
        return self.network.apply(params, x)

    def act(self, state: PPOState, obs, key):
        """Sample actions for rollout."""
        mu, log_std, value = self._forward(state.params, state.obs_rms, obs)
        sigma = jnp.exp(log_std)
        noise = jax.random.normal(key, mu.shape)
        action = mu + sigma * noise
        log_prob = _gaussian_log_prob(mu, log_std, action)
        return action, log_prob, value, mu, sigma

    def act_deterministic(self, state: PPOState, obs):
        """Greedy action for evaluation (rl_games player semantics)."""
        mu, _, _ = self._forward(state.params, state.obs_rms, obs)
        return jnp.clip(mu, -1.0, 1.0)

    # ------------------------------------------------------------------
    def _rollout(self, ppo: PPOState, env_state, obs, key):
        cfg = self.cfg

        def step(carry, _):
            env_state, obs, key = carry
            key, act_key = jax.random.split(key)
            action, log_prob, value, mu, sigma = self.act(ppo, obs, act_key)
            action_c = jnp.clip(action, -1.0, 1.0)
            env_state, next_obs, reward, done, extras = self.env_step(
                env_state, action_c
            )
            reward = reward * cfg.reward_shaper_scale
            if cfg.value_bootstrap:
                # rl_games: bootstrap value on timeout terminations
                # (cfg.value_clip_sigma optionally guards the feedback loop
                # through value_rms — see PPOConfig)
                timeout = extras["timeout"].astype(jnp.float32)
                if cfg.normalize_value:
                    v_denorm = ppo.value_rms.denormalize(
                        self._clip_v(value)
                    )
                else:
                    v_denorm = value
                reward = reward + cfg.gamma * v_denorm * timeout
            t = Transition(obs, action, log_prob, value, reward, done, mu, sigma)
            return (env_state, next_obs, key), (t, self._slim_extras(extras))

        (env_state, obs, key), (traj, extras) = jax.lax.scan(
            step, (env_state, obs, key), None, length=cfg.horizon_length
        )
        return env_state, obs, key, traj, extras

    def _slim_extras(self, extras):
        """Keep only the extras the training loop consumes, packing the
        reward-component dict into ONE (N, C) array.

        The env's extras tree carries ~50 leaves (component dict, per-reason
        masks, rate scalars) for API parity with the reference's `extras`
        (step_processor.py:221-232). Stacking all of them per rollout step
        costs ~45 extra device kernels per step; everything the trainer uses
        is the component values + the 3 termination masks (DeviceBreakdown),
        so the rest is dropped here and dead-code-eliminated out of the
        compiled rollout entirely. `self.comp_names` records the static
        packing order (captured at trace time)."""
        if "reward_components_packed" in extras:
            # fused-kernel env (envs/fused_step.py): components arrive
            # already packed as (N, C); the packing order is the same
            # sorted-key order (fused.comp_names — the caller sets
            # self.comp_names from it before training starts)
            packed = extras["reward_components_packed"]
        elif "reward_components" in extras:
            comp_names = tuple(sorted(extras["reward_components"]))
            self.comp_names = comp_names
            packed = jnp.stack(
                [extras["reward_components"][k] for k in comp_names], axis=-1
            )
        else:  # synthetic envs in tests may not provide components
            packed = None
        slim = {
            k: extras[k]
            for k in ("success", "failure", "timeout",
                      "success_strict", "done_strict")
            if k in extras
        }
        if packed is not None:
            slim["reward_components_packed"] = packed
        return slim

    def _clip_v(self, v):
        """Optional sigma-clip on normalized value predictions
        (cfg.value_clip_sigma; None = rl_games parity, no clip)."""
        s = self.cfg.value_clip_sigma
        return v if s is None else jnp.clip(v, -s, s)

    def _gae(self, ppo: PPOState, traj: Transition, last_value):
        cfg = self.cfg
        values = traj.value
        if cfg.normalize_value:
            values = ppo.value_rms.denormalize(self._clip_v(values))
            last_value = ppo.value_rms.denormalize(self._clip_v(last_value))

        def scan_fn(carry, t):
            next_value, adv = carry
            value, reward, done = t
            not_done = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * next_value * not_done - value
            adv = delta + cfg.gamma * cfg.tau * not_done * adv
            return (value, adv), adv

        _, advantages = jax.lax.scan(
            scan_fn,
            (last_value, jnp.zeros_like(last_value)),
            (values, traj.reward, traj.done),
            reverse=True,
        )
        returns = advantages + values
        return advantages, returns

    # ------------------------------------------------------------------
    def _update_minibatch(self, carry, mb):
        ppo_params, opt_state, lr, obs_rms, value_rms, kl_sum = carry
        cfg = self.cfg
        obs, action, old_log_prob, old_value_norm, advantage, return_norm, \
            mu_old, sigma_old = mb

        def loss_fn(params):
            x = obs_rms.normalize(obs) if cfg.normalize_input else obs
            mu, log_std, value = self.network.apply(params, x)
            sigma = jnp.exp(log_std)
            log_prob = _gaussian_log_prob(mu, log_std, action)
            ratio = jnp.exp(log_prob - old_log_prob)
            surr1 = advantage * ratio
            surr2 = advantage * jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip)
            a_loss = -jnp.mean(jnp.minimum(surr1, surr2))

            if cfg.clip_value:
                v_clipped = old_value_norm + jnp.clip(
                    value - old_value_norm, -cfg.e_clip, cfg.e_clip
                )
                v_loss = jnp.maximum(
                    (value - return_norm) ** 2, (v_clipped - return_norm) ** 2
                )
            else:
                v_loss = (value - return_norm) ** 2
            c_loss = 0.5 * jnp.mean(v_loss)

            entropy = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1))
            mu_excess = jnp.clip(jnp.abs(mu) - 1.1, 0.0, None)
            b_loss = jnp.mean(jnp.sum(mu_excess**2, axis=-1))

            total = (
                a_loss
                + cfg.critic_coef * c_loss
                - cfg.entropy_coef * entropy
                + cfg.bounds_loss_coef * b_loss
            )
            return total, (mu, sigma)

        grads, (mu, sigma) = jax.grad(loss_fn, has_aux=True)(ppo_params)
        grads = jax.tree.map(self._pmean, grads)
        new_updates, new_opt_state = self._tx.update(
            grads, _set_lr(opt_state, lr), ppo_params
        )
        new_params = optax.apply_updates(ppo_params, new_updates)
        # kl measures drift accumulated BEFORE this minibatch's update (mu /
        # sigma come from the pre-update params): when it already exceeds the
        # skip gate, applying yet another step can only push further out —
        # keep the old params/optimizer state instead (see kl_skip_factor)
        kl = self._pmean(_policy_kl(mu, sigma, mu_old, sigma_old))
        if cfg.kl_skip_factor is not None:
            skip = kl > cfg.kl_skip_factor * cfg.kl_threshold
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(skip, b, a), new, old
            )
            ppo_params = keep(new_params, ppo_params)
            opt_state = keep(new_opt_state, opt_state)
        else:
            ppo_params, opt_state = new_params, new_opt_state
        if cfg.lr_schedule == "adaptive" and cfg.schedule_type == "legacy":
            lr = self._adapt_lr(lr, kl)
        return (ppo_params, opt_state, lr, obs_rms, value_rms, kl_sum + kl), kl

    def _train_iteration(self, ppo: PPOState, env_state, obs):
        """One PPO epoch: rollout + GAE + minibatch updates + adaptive LR."""
        cfg = self.cfg
        key, roll_key, perm_key = jax.random.split(ppo.rng, 3)
        if self.axis_name is not None:
            shard = jax.lax.axis_index(self.axis_name)
            roll_key = jax.random.fold_in(roll_key, shard)
            perm_key = jax.random.fold_in(perm_key, shard)

        env_state, obs, _, traj, roll_extras = self._rollout(
            ppo, env_state, obs, roll_key
        )
        _, _, last_value, _, _ = self.act(
            ppo, obs, jax.random.key(0)
        )
        advantages, returns = self._gae(ppo, traj, last_value)

        # Running stats are updated from this rollout but take effect NEXT
        # iteration: the minibatch updates must see the SAME normalizer the
        # rollout's log-probs/mu were computed under, otherwise normalizer
        # drift puts a floor under the measured KL and the adaptive LR decays
        # forever. (Moments are globally consistent under shard_map via
        # pmean.)
        obs_rms = ppo.obs_rms
        value_rms = ppo.value_rms
        new_obs_rms = (
            obs_rms.update_with_moments(
                *self._batch_moments(traj.obs.reshape(-1, cfg.obs_width))
            )
            if cfg.normalize_input else obs_rms
        )
        new_value_rms = (
            value_rms.update_with_moments(
                *self._batch_moments(returns.reshape(-1))
            )
            if cfg.normalize_value else value_rms
        )
        returns_norm = (
            value_rms.normalize(returns, clip=np.inf)
            if cfg.normalize_value else returns
        )
        old_values_norm = traj.value
        if cfg.normalize_advantage:
            adv_mean = self._pmean(advantages.mean())
            adv_var = self._pmean(((advantages - adv_mean) ** 2).mean())
            advantages = (advantages - adv_mean) / (jnp.sqrt(adv_var) + 1e-8)

        # flatten (T, N_local, ...) -> (T*N_local, ...). Shapes are LOCAL under
        # shard_map; the minibatch COUNT is global so every shard steps its
        # local slice of each global minibatch in lockstep with pmean'd grads.
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        adv_flat = advantages.reshape(-1)
        ret_flat = returns_norm.reshape(-1)
        val_flat = old_values_norm.reshape(-1)

        local_batch = flat.obs.shape[0]
        n_mb = max(1, cfg.batch_size // cfg.minibatch)
        local_mb = local_batch // n_mb

        if cfg.shuffle in ("rotation", "perm_roll"):
            # ONE permutation gather per iteration de-structures the
            # (t, env)-ordered flat batch (a bare roll would otherwise make
            # every minibatch a single-timestep slice of all envs); the
            # per-epoch shuffle is then a cheap random roll. Replaces the
            # rl_games-parity per-epoch 131k-element sort + random gather,
            # measured (round-4 tools/bench_update_anatomy.py) at
            # ~4.6 ms/epoch of the update.
            #   rotation:  STATIC permutation, never refreshed — measured
            #              learning-NEGATIVE on BlindGrasping (round 2,
            #              BASELINE.md): too little decorrelation.
            #   perm_roll: FRESH random permutation each iteration (one
            #              sort + gather), epochs vary by roll — epochs of
            #              one iteration see rolled variants, successive
            #              iterations are fully re-randomized.
            if cfg.shuffle == "perm_roll":
                perm_key, sp_key = jax.random.split(perm_key)
                sp = jax.random.permutation(sp_key, local_batch)
            else:
                sp = self._static_perm(local_batch)
            flat = jax.tree.map(lambda x: x[sp], flat)
            adv_flat, ret_flat, val_flat = (
                adv_flat[sp], ret_flat[sp], val_flat[sp]
            )

        def epoch_fn(carry, ekey):
            params, opt_state, lr, kl_last = carry
            data = (flat.obs, flat.action, flat.log_prob, val_flat, adv_flat,
                    ret_flat, flat.mu, flat.sigma)
            if cfg.shuffle in ("rotation", "perm_roll"):
                # per-epoch random circular shift over the once-per-iteration
                # permuted batch (see below): composition varies across
                # epochs at roll cost, no sort, no per-epoch gather
                shift = jax.random.randint(ekey, (), 0, local_batch)
                reindex = lambda x: jnp.roll(x, shift, axis=0)
            elif cfg.shuffle == "affine":
                # per-epoch random affine index bijection i -> (k*i+c) mod N:
                # minibatch j becomes a stride-k sweep of the whole batch, so
                # composition is genuinely re-drawn each epoch (unlike
                # rotation) without the permutation's device sort. k comes
                # from a static table of multipliers coprime to N (numpy
                # trace constant), c is uniform. Products are exact mod N
                # because N is a power of two and uint32 wraps mod 2^32.
                mults = self._affine_mults(local_batch)
                kk, kc = jax.random.split(ekey)
                k = mults[jax.random.randint(kk, (), 0, mults.shape[0])]
                c = jax.random.randint(
                    kc, (), 0, local_batch, dtype=jnp.uint32
                )
                idx = (
                    (k * jnp.arange(local_batch, dtype=jnp.uint32) + c)
                    & jnp.uint32(local_batch - 1)
                ).astype(jnp.int32)
                reindex = lambda x: x[idx]
            else:
                perm = jax.random.permutation(ekey, local_batch)
                reindex = lambda x: x[perm]
            mb_data = jax.tree.map(
                lambda x: reindex(x).reshape(
                    (n_mb, local_mb) + x.shape[1:]
                ),
                data,
            )
            (params, opt_state, lr, _, _, kl_sum), _ = jax.lax.scan(
                self._update_minibatch,
                (params, opt_state, lr, obs_rms, value_rms, jnp.asarray(0.0)),
                mb_data,
            )
            kl_avg = kl_sum / n_mb
            if cfg.lr_schedule == "adaptive" and cfg.schedule_type == "standard":
                lr = self._adapt_lr(lr, kl_avg)
            return (params, opt_state, lr, kl_avg), None

        epoch_keys = jax.random.split(perm_key, cfg.mini_epochs)
        (params, opt_state, lr, kl), _ = jax.lax.scan(
            epoch_fn,
            (ppo.params, ppo.opt_state, ppo.lr, jnp.asarray(0.0)),
            epoch_keys,
        )

        if cfg.lr_schedule == "adaptive" and cfg.schedule_type == "per_iteration":
            lr = self._adapt_lr(lr, kl)

        new_ppo = PPOState(
            params=params,
            opt_state=opt_state,
            obs_rms=new_obs_rms,
            value_rms=new_value_rms,
            lr=lr,
            epoch=ppo.epoch + 1,
            rng=key,
        )
        metrics = {
            "kl": kl,
            "lr": lr,
            "reward_mean": self._pmean(traj.reward.mean()),
            "value_mean": self._pmean(traj.value.mean()),
            "advantage_std": jnp.sqrt(self._pmean(jnp.square(advantages).mean())),
            "episode_done_frac": self._pmean(
                traj.done.astype(jnp.float32).mean()
            ),
        }
        return new_ppo, env_state, obs, metrics, roll_extras

    def _affine_mults(self, n: int):
        """Static table of 64 odd multipliers for the affine shuffle (numpy
        trace constant — never a device array, tunnel lowering safety).
        Requires n a power of two so `& (n-1)` realizes mod n and oddness
        realizes coprimality."""
        if n & (n - 1):
            raise ValueError(
                f"shuffle=affine requires a power-of-two local batch, got {n}"
                " (horizon_length * num_envs_per_shard); use"
                " shuffle=permutation"
            )
        cached = getattr(self, "_affine_mults_np", None)
        if cached is None or cached[0] != n:
            rng = np.random.default_rng(self._seed ^ 0xA55E)
            # spread over [n/8, n) so strides are large and varied; odd =>
            # coprime with 2^k. n < 16 degenerates to tiny tables in tests —
            # allow repeats there.
            lo = max(1, n // 8)
            mults = (rng.integers(lo, max(lo + 1, n), 64) | 1) % max(n, 2)
            mults = np.maximum(mults, 1).astype(np.uint32)
            self._affine_mults_np = (n, mults)
        return jnp.asarray(self._affine_mults_np[1])

    def _static_perm(self, n: int):
        """Fixed random permutation as a numpy trace constant (never a
        device array — tunnel lowering safety)."""
        if getattr(self, "_static_perm_np", None) is None or \
                len(self._static_perm_np) != n:
            self._static_perm_np = np.random.default_rng(
                self._seed
            ).permutation(n)
        return self._static_perm_np

    def _adapt_lr(self, lr, kl):
        """rl_games AdaptiveScheduler.update: +/-1.5x on KL vs threshold."""
        cfg = self.cfg
        lr = jnp.where(kl > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
        lr = jnp.where(kl < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
        return jnp.clip(lr, cfg.lr_floor, cfg.lr_ceiling)

    def _batch_moments(self, batch):
        """Per-batch mean/var/count with cross-shard reduction when sharded."""
        n_local = batch.shape[0]
        mean = self._pmean(batch.mean(axis=0))
        var = self._pmean(((batch - mean) ** 2).mean(axis=0))
        count = jnp.asarray(n_local, jnp.float32)
        if self.axis_name is not None:
            count = jax.lax.psum(count, self.axis_name)
        return mean, var, count


def _set_lr(opt_state, lr):
    """Override the injected learning_rate hyperparameter."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)
