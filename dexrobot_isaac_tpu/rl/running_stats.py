"""Running mean/std normalization (rl_games RunningMeanStd equivalent).

The reference's PPO normalizes observations and value targets with running
statistics (`normalize_input: True`, `normalize_value: True`;
cfg/train/BaseTaskPPO.yaml:44-45). Implemented as an explicit pytree updated
with Chan's parallel algorithm so it stays correct under sharded batches
(per-shard partial moments combine exactly; jnp.mean/var over a sharded axis
already produce the global moments via XLA collectives).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar

    @staticmethod
    def create(shape) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype=jnp.float32),
            var=jnp.ones(shape, dtype=jnp.float32),
            count=jnp.asarray(1e-4, dtype=jnp.float32),
        )

    def update(self, batch: jnp.ndarray) -> "RunningMeanStd":
        """Update with a batch whose leading axes are reduced."""
        reduce_axes = tuple(range(batch.ndim - self.mean.ndim))
        b_mean = jnp.mean(batch, axis=reduce_axes)
        b_var = jnp.var(batch, axis=reduce_axes)
        b_count = jnp.asarray(
            np_prod(batch.shape[: batch.ndim - self.mean.ndim]), jnp.float32
        )
        return self.update_with_moments(b_mean, b_var, b_count)

    def update_with_moments(self, b_mean, b_var, b_count) -> "RunningMeanStd":
        """Chan's parallel update from precomputed batch moments (used for
        globally-consistent updates under shard_map)."""
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * (b_count / tot)
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * (self.count * b_count / tot)
        return RunningMeanStd(new_mean, m2 / tot, tot)

    def normalize(self, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
        out = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(out, -clip, clip)

    def denormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.sqrt(self.var + 1e-5) + self.mean


def np_prod(shape) -> float:
    out = 1.0
    for s in shape:
        out *= s
    return out
