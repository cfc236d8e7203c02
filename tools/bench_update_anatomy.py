"""PPO UPDATE anatomy on TPU: where do the ~43 ms of update+GAE go?

The training-iteration anatomy (tools/bench_train_anatomy.py) shows the
update+GAE half of the iteration is the gap to the full-PPO throughput
target. This tool isolates it: a near-zero-cost synthetic env (obs-sized
carry, one multiply) makes train_iteration ≈ rollout-MLP + update, then
sweeps the update's structural knobs to attribute the time:

  - mini_epochs 1/2/4        -> per-epoch cost vs fixed cost (GAE, stats)
  - shuffle permutation/affine/rotation -> sort vs gather vs roll
  - minibatch_size num_envs/2*num_envs  -> minibatch-loop step overhead

Run: python tools/bench_update_anatomy.py [num_envs] (TPU; ~2 min)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    num_obs = 130
    num_actions = 18

    def env_step(state, actions):
        obs = state * 0.999 + 0.001 * jnp.sum(actions, axis=-1, keepdims=True)
        reward = obs[:, 0]
        done = jnp.zeros(obs.shape[0], dtype=bool)
        extras = {"timeout": jnp.zeros(obs.shape[0], dtype=bool)}
        return obs, obs, reward, done, extras

    obs0 = jnp.ones((n, num_obs), jnp.float32)

    def timed(tag, **over):
        cfg = PPOConfig(
            num_actions=num_actions, num_obs=num_obs, num_states=0,
            num_envs=n, **over,
        )
        lrn = PPOLearner(cfg, env_step, seed=0)
        ppo = lrn.init_state()
        it = lrn.train_iteration  # already jitted, donates the PPOState
        ppo, st, ob, m, _ = it(ppo, obs0, obs0)
        float(m["kl"])  # host fetch: the only reliable barrier over the
        # remote-TPU tunnel (block_until_ready has been observed returning
        # before device completion there — see the 8.1B env-steps/s
        # artifact in the round-4 anatomy log)
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            ppo, st, ob, m, _ = it(ppo, st, ob)
            float(m["kl"])
            best = min(best, time.time() - t0)
        print(f"{tag:42s}: {best * 1e3:7.2f} ms/iter")
        return best

    base = timed("baseline (perm, 4 epochs, mb=num_envs)")
    timed("mini_epochs=1", mini_epochs=1)
    timed("mini_epochs=2", mini_epochs=2)
    timed("shuffle=affine", shuffle="affine")
    timed("shuffle=rotation", shuffle="rotation")
    timed("shuffle=perm_roll", shuffle="perm_roll")
    timed("minibatch=2*num_envs", minibatch_size=2 * n)
    timed("minibatch=4*num_envs", minibatch_size=4 * n)
    timed("mini_epochs=1 + affine", mini_epochs=1, shuffle="affine")
    timed("normalize off", normalize_input=False, normalize_value=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
