"""Reward-component observer: per-episode breakdowns split by termination type.

Parity with the reference's `RewardComponentObserver` (rl/reward_observer.py:
10-377): accumulates per-component episode sums per env, and when episodes
finish logs 5-level TensorBoard keys

    reward_breakdown/<all|success|failure|timeout>/<raw|weighted>/<episode|step>/<name>

plus `training/termination_rates/*`, windowed every `log_interval` finished
episodes. Operates on host numpy over the stacked (T, N) rollout extras the
jitted train iteration returns.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np


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
