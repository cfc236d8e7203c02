"""Reward-component observer: per-episode breakdowns split by termination type.

Parity with the reference's `RewardComponentObserver` (rl/reward_observer.py:
10-377): accumulates per-component episode sums per env, and when episodes
finish logs 5-level TensorBoard keys

    reward_breakdown/<all|success|failure|timeout>/<raw|weighted>/<episode|step>/<name>

plus `training/termination_rates/*`, windowed every `log_interval` finished
episodes.

Two consumption paths:

- `process_rollout`: host numpy over the full stacked (T, N) rollout extras.
  Exact per-episode lists, but fetching (T, N, n_components) floats from the
  device EVERY iteration costs ~20 MB/iter over the remote-TPU tunnel and
  was measured to throttle full PPO training ~10x (130k vs 1.3M env-steps/s
  at 8192 envs). Kept for tests and small CPU runs.
- `DeviceBreakdown` + `process_device_window`: TPU-native path. A jitted
  reducer folds each iteration's extras into per-env episode accumulators
  and tiny per-(termination-type, component) window totals ON DEVICE; the
  host fetches only those totals (a few hundred scalars) per logging window.
  Mean-of-per-episode-sums == windowed total / windowed count, so the TB
  output is identical to the host path.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

_TYPES = ("success", "failure", "timeout")


class RewardComponentObserver:
    def __init__(self, writer=None, log_interval: int = 100):
        self.writer = writer
        self.log_interval = log_interval
        self._acc: Dict[str, np.ndarray] = {}       # per-env running episode sums
        self._steps: Optional[np.ndarray] = None    # per-env episode step counts
        self._finished = defaultdict(list)          # (type, name) -> per-episode sums
        self._finished_steps = defaultdict(list)
        self._episodes_since_log = 0
        self._term_counts = defaultdict(int)
        self._global_step = 0

    def process_rollout(self, extras: Dict[str, np.ndarray]) -> None:
        """Consume stacked rollout extras: arrays shaped (T, N)."""
        comps = {
            k: np.asarray(v) for k, v in extras["reward_components"].items()
        }
        success = np.asarray(extras["success"])
        failure = np.asarray(extras["failure"])
        timeout = np.asarray(extras["timeout"])
        T, N = success.shape

        if self._steps is None:
            self._steps = np.zeros(N, dtype=np.int64)
            for k in comps:
                self._acc[k] = np.zeros(N, dtype=np.float64)
        for k in comps:
            if k not in self._acc:
                self._acc[k] = np.zeros(N, dtype=np.float64)

        for t in range(T):
            self._global_step += N
            for k, v in comps.items():
                self._acc[k] += v[t]
            self._steps += 1
            done = success[t] | failure[t] | timeout[t]
            if done.any():
                idx = np.nonzero(done)[0]
                types = np.where(
                    success[t, idx], "success",
                    np.where(failure[t, idx], "failure", "timeout"),
                )
                for j, env in enumerate(idx):
                    ttype = str(types[j])
                    self._term_counts[ttype] += 1
                    for k in comps:
                        self._finished[(ttype, k)].append(self._acc[k][env])
                        self._finished[("all", k)].append(self._acc[k][env])
                    self._finished_steps[ttype].append(self._steps[env])
                    self._finished_steps["all"].append(self._steps[env])
                for k in comps:
                    self._acc[k][idx] = 0.0
                self._steps[idx] = 0
                self._episodes_since_log += len(idx)

        if self._episodes_since_log >= self.log_interval:
            self._flush()

    def _flush(self) -> None:
        if self.writer is None:
            self._reset_window()
            return
        total = sum(self._term_counts.values())
        for ttype in ("all", "success", "failure", "timeout"):
            steps = self._finished_steps.get(ttype)
            if not steps:
                continue
            mean_len = float(np.mean(steps))
            for (tt, name), sums in list(self._finished.items()):
                if tt != ttype or not sums:
                    continue
                kind = "weighted" if name.endswith("_weighted") else "raw"
                base = name[:-9] if name.endswith("_weighted") else name
                ep_mean = float(np.mean(sums))
                self.writer.add_scalar(
                    f"reward_breakdown/{ttype}/{kind}/episode/{base}",
                    ep_mean, self._global_step,
                )
                self.writer.add_scalar(
                    f"reward_breakdown/{ttype}/{kind}/step/{base}",
                    ep_mean / max(mean_len, 1.0), self._global_step,
                )
        if total > 0:
            for ttype in ("success", "failure", "timeout"):
                self.writer.add_scalar(
                    f"training/termination_rates/{ttype}",
                    self._term_counts[ttype] / total, self._global_step,
                )
            self.writer.add_scalar(
                "training/episode_length",
                float(np.mean(self._finished_steps["all"])), self._global_step,
            )
        self._reset_window()

    def _reset_window(self) -> None:
        self._finished.clear()
        self._finished_steps.clear()
        self._term_counts.clear()
        self._episodes_since_log = 0

    # ------------------------------------------------------------------
    # device-side windowed path
    # ------------------------------------------------------------------
    def process_device_window(self, summary: Dict[str, Any]) -> None:
        """Emit the same TB keys from a fetched DeviceBreakdown window summary
        (`DeviceBreakdown.fetch_and_reset`)."""
        self._global_step = int(summary["global_step"])
        counts = np.asarray(summary["ep_count"], dtype=np.float64)   # (3,)
        step_sum = np.asarray(summary["step_sum"], dtype=np.float64)  # (3,)
        comp_sum = {
            k: np.asarray(v, dtype=np.float64)
            for k, v in summary["comp_sum"].items()
        }
        total = float(counts.sum())
        if self.writer is None or total == 0:
            return
        for ti, ttype in enumerate(("all",) + _TYPES):
            if ttype == "all":
                cnt, ssum = total, float(step_sum.sum())
                csel = {k: float(v.sum()) for k, v in comp_sum.items()}
            else:
                cnt, ssum = float(counts[ti - 1]), float(step_sum[ti - 1])
                csel = {k: float(v[ti - 1]) for k, v in comp_sum.items()}
            if cnt == 0:
                continue
            mean_len = ssum / cnt
            for name, csum in csel.items():
                kind = "weighted" if name.endswith("_weighted") else "raw"
                base = name[:-9] if name.endswith("_weighted") else name
                ep_mean = csum / cnt
                self.writer.add_scalar(
                    f"reward_breakdown/{ttype}/{kind}/episode/{base}",
                    ep_mean, self._global_step,
                )
                self.writer.add_scalar(
                    f"reward_breakdown/{ttype}/{kind}/step/{base}",
                    ep_mean / max(mean_len, 1.0), self._global_step,
                )
        for ti, ttype in enumerate(_TYPES):
            self.writer.add_scalar(
                f"training/termination_rates/{ttype}",
                float(counts[ti]) / total, self._global_step,
            )
        self.writer.add_scalar(
            "training/episode_length", float(step_sum.sum()) / total,
            self._global_step,
        )


@dataclasses.dataclass
class DeviceBreakdown:
    """Device-resident reward-breakdown reducer.

    Holds per-env episode accumulators plus per-(type, component) window
    totals as a small pytree on device; `update` is jitted and donates its
    state, so per-iteration cost is one async dispatch and zero host
    transfer. Works under GSPMD sharding: the per-env leaves follow the
    extras' env-batch sharding, the window totals are replicated reductions.
    """

    state: Any
    _update_jit: Any
    comp_names: tuple

    @classmethod
    def create(cls, roll_extras, comp_names=None) -> "DeviceBreakdown":
        """`roll_extras` either carries the reward-component dict (env extras
        parity form) or a pre-packed `reward_components_packed` (T, N, C)
        array (the trainer's slimmed rollout extras; rl/ppo.py
        `_slim_extras`) — in the packed case `comp_names` must be supplied
        in the packing order."""
        import jax
        import jax.numpy as jnp

        if "reward_components_packed" in roll_extras:
            packed = roll_extras["reward_components_packed"]
            if comp_names is None:
                raise ValueError(
                    "packed rollout extras require comp_names (the static "
                    "packing order, e.g. PPOLearner.comp_names)"
                )
            comp_names = tuple(comp_names)
            n, c = packed.shape[1], packed.shape[2]
            if c != len(comp_names):
                raise ValueError(
                    f"comp_names has {len(comp_names)} entries but packed "
                    f"extras carry {c} components"
                )
        else:
            comps = roll_extras["reward_components"]
            comp_names = tuple(sorted(comps))
            n = comps[comp_names[0]].shape[1]
            c = len(comp_names)
        state = {
            # per-env running episode accumulators
            "comp_acc": jnp.zeros((n, c), dtype=jnp.float32),
            "step_acc": jnp.zeros((n,), dtype=jnp.int32),
            # window totals per termination type (success, failure, timeout)
            "ep_count": jnp.zeros((3,), dtype=jnp.int32),
            "step_sum": jnp.zeros((3,), dtype=jnp.float32),
            "comp_sum": jnp.zeros((3, c), dtype=jnp.float32),
            # strict-spawn episode totals [successes, dones] — fed by envs
            # whose tasks report spawn_difficulty (eval-matched curriculum
            # gating, train.py promote_strict); stays zero otherwise
            "ep_count_strict": jnp.zeros((2,), dtype=jnp.int32),
        }

        def update(st, extras):
            if "reward_components_packed" in extras:
                comp_t = extras["reward_components_packed"]  # (T, N, C)
            else:
                comp_t = jnp.stack(
                    [extras["reward_components"][k] for k in comp_names],
                    axis=-1,
                )  # (T, N, C)
            masks = jnp.stack(
                [extras["success"], extras["failure"], extras["timeout"]],
                axis=-1,
            )  # (T, N, 3) mutually exclusive

            def body(carry, xs):
                comp_acc, step_acc, ep_count, step_sum, comp_sum = carry
                ct, mt = xs                     # (N, C), (N, 3)
                comp_acc = comp_acc + ct
                step_acc = step_acc + 1
                done = mt.any(axis=-1)          # (N,)
                mf = mt.astype(jnp.float32)     # (N, 3)
                ep_count = ep_count + mt.sum(axis=0)
                step_sum = step_sum + (mf * step_acc[:, None]).sum(axis=0)
                comp_sum = comp_sum + jnp.einsum("nt,nc->tc", mf, comp_acc)
                comp_acc = jnp.where(done[:, None], 0.0, comp_acc)
                step_acc = jnp.where(done, 0, step_acc)
                return (comp_acc, step_acc, ep_count, step_sum, comp_sum), None

            (comp_acc, step_acc, ep_count, step_sum, comp_sum), _ = (
                jax.lax.scan(
                    body,
                    (st["comp_acc"], st["step_acc"], st["ep_count"],
                     st["step_sum"], st["comp_sum"]),
                    (comp_t, masks),
                )
            )
            ep_strict = st["ep_count_strict"]
            if "success_strict" in extras and "done_strict" in extras:
                ep_strict = ep_strict + jnp.stack([
                    extras["success_strict"].sum().astype(jnp.int32),
                    extras["done_strict"].sum().astype(jnp.int32),
                ])
            return {
                "comp_acc": comp_acc,
                "step_acc": step_acc,
                "ep_count": ep_count,
                "step_sum": step_sum,
                "comp_sum": comp_sum,
                "ep_count_strict": ep_strict,
            }

        return cls(
            state=state,
            _update_jit=jax.jit(update, donate_argnums=0),
            comp_names=comp_names,
        )

    def update(self, roll_extras) -> None:
        self.state = self._update_jit(self.state, roll_extras)

    def fetch_and_reset(self, global_step: int = 0) -> Dict[str, Any]:
        """Fetch the window totals to host and zero them (per-env episode
        accumulators are preserved across windows). `global_step` is the
        host-tracked env-step counter stamped into the summary."""
        import jax
        import jax.numpy as jnp

        totals = {
            "ep_count": self.state["ep_count"],
            "step_sum": self.state["step_sum"],
            "comp_sum": self.state["comp_sum"],
            "ep_count_strict": self.state["ep_count_strict"],
        }
        leaf = totals["ep_count"]
        if hasattr(leaf, "sharding") and not leaf.is_fully_addressable:
            # multi-host: all-gather the (tiny) window totals so every
            # process can read them — the curriculum controller's promotion
            # decision must be identical on all processes
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(leaf.sharding.mesh, PartitionSpec())
            totals = jax.jit(lambda t: t, out_shardings=repl)(totals)
        host = jax.device_get(totals)
        host["global_step"] = int(global_step)
        comp_sum_h = np.asarray(host["comp_sum"])
        host["comp_sum"] = {
            k: comp_sum_h[:, i] for i, k in enumerate(self.comp_names)
        }
        self.state = {
            **self.state,
            "ep_count": jnp.zeros((3,), dtype=jnp.int32),
            "step_sum": jnp.zeros((3,), dtype=jnp.float32),
            "comp_sum": jnp.zeros_like(self.state["comp_sum"]),
            "ep_count_strict": jnp.zeros((2,), dtype=jnp.int32),
        }
        return host
