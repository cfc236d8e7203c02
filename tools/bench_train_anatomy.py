"""Training-iteration anatomy on TPU: where does full-PPO time go?

Times, at BlindGrasping 8192 envs on the fused path:
  1. env-step only (scan of fused kernel, no policy)
  2. rollout only (act + env step, scan over horizon)
  3. full train_iteration (rollout + GAE + update)
  4. chunked train_iteration (dispatch_chunk=8)
with best-of-N windows (the tunnel chip is load-shared; see BASELINE.md
methodology note).

Run: python tools/bench_train_anatomy.py [num_envs] [shuffles] [chunks] [backend]
  num_envs  default 8192
  shuffles  comma list of minibatch shuffles to sweep (default: permutation)
  chunks    comma list of dispatch_chunk values (default: 8)
  backend   step backend (default: fused)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _sync(leaf):
    """Host-fetch one element as the timing barrier: over the axon tunnel
    jax.block_until_ready has been observed returning BEFORE device
    completion (round 4: an 8.1B env-steps/s artifact in this very sweep,
    corrected by a fetch). A value fetch cannot resolve early."""
    import jax.numpy as jnp

    return float(jnp.asarray(leaf).ravel()[0])


def main() -> int:
    import jax
    import jax.numpy as jnp

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
    from dexrobot_isaac_tpu.utils.config import load_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    shuffles = (sys.argv[2] if len(sys.argv) > 2 else "permutation").split(",")
    # argv[4]: fused backend override — "hybrid" runs the same lane math
    # without the Mosaic compile, making the tool usable on CPU
    backend = sys.argv[4] if len(sys.argv) > 4 else None
    cfg = load_config(["task=BlindGrasping", f"numEnvs={n}"])
    env = make_env(cfg, seed=0)
    fused = env.make_fused(**({"backend": backend} if backend else {}))
    pcfg = PPOConfig(
        num_actions=env.num_actions, num_obs=env.num_obs,
        num_states=env.num_states, num_envs=n, shuffle=shuffles[0],
    )
    learner = PPOLearner(pcfg, fused.step_fn, seed=0)
    learner.comp_names = fused.comp_names
    ppo = learner.init_state()
    fs, obs = fused.reset(jax.random.key(0))
    T = pcfg.horizon_length

    def best_of(fn, args, reps=5):
        out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            _sync(jax.tree.leaves(out)[0])
            best = min(best, time.time() - t0)
        return best, out

    # 1. env-only scan (T steps)
    a = jnp.zeros((n, env.num_actions), jnp.float32)

    @jax.jit
    def env_only(fs):
        def body(s, _):
            s, o, r, d, e = fused.step_fn(s, a)
            return s, r[0]
        return jax.lax.scan(body, fs, None, length=T)

    t_env, (fs2, _) = best_of(env_only, (fs,))
    print(f"env-only scan       : {n*T/t_env:12,.0f} env-steps/s "
          f"({t_env*1e3:7.2f} ms / {T} steps)")

    # 2. rollout only (act + step)
    @jax.jit
    def rollout_only(ppo, fs, obs):
        fs, obs, key, traj, extras = learner._rollout(
            ppo, fs, obs, jax.random.key(1)
        )
        return fs, obs, traj.reward.sum()

    t_roll, _ = best_of(rollout_only, (ppo, fs, obs))
    print(f"rollout (act+step)  : {n*T/t_roll:12,.0f} env-steps/s "
          f"({t_roll*1e3:7.2f} ms)")

    # 3. full train iteration
    step1 = jax.jit(learner._train_iteration)
    t_full, out = best_of(step1, (ppo, fs, obs))
    print(f"train_iteration     : {n*T/t_full:12,.0f} env-steps/s "
          f"({t_full*1e3:7.2f} ms; update+gae = "
          f"{(t_full-t_roll)*1e3:.2f} ms)")

    # 4. chunked dispatch at increasing depths (argv[3]: comma-separated,
    # default "8" — e.g. "8,16,32" sweeps whether deeper chunks keep
    # amortizing the per-iteration host round trip)
    chunks = [int(c) for c in (
        sys.argv[3] if len(sys.argv) > 3 else "8"
    ).split(",")]
    for shuffle in shuffles:
        lrn = learner
        if shuffle != shuffles[0]:
            lrn = PPOLearner(
                PPOConfig(
                    num_actions=env.num_actions, num_obs=env.num_obs,
                    num_states=env.num_states, num_envs=n, shuffle=shuffle,
                ),
                fused.step_fn, seed=0,
            )
            lrn.comp_names = fused.comp_names
            lrn.init_state()  # builds the optimizer (_tx); PPOState reused
        for chunk in chunks:
            cstep = lrn.make_chunked_train_step(chunk)
            # the chunked step donates the learner state (donate_argnums=0):
            # hand it a copy so the pristine ppo survives for the next
            # shuffle/chunk combination (fs/obs are never donated)
            ppo_c = jax.tree.map(
                lambda x: x.copy() if isinstance(x, jax.Array) else x, ppo,
            )
            fs_c, obs_c = fs, obs
            ppo2, fs3, obs3, m, e = cstep(ppo_c, fs_c, obs_c)
            _sync(m["kl"])
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                ppo2, fs3, obs3, m, e = cstep(ppo2, fs3, obs3)
                _sync(m["kl"])
                best = min(best, time.time() - t0)
            print(f"chunked x{chunk} [{shuffle}]: {n*T*chunk/best:12,.0f} "
                  f"env-steps/s ({best*1e3/chunk:7.2f} ms/iter)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
