"""Actor-critic network for PPO.

Parity with the reference's rl_games network config
(cfg/train/BaseTaskPPO.yaml:8-31): shared MLP [512, 256, 128] with ELU
(`separate: False`), linear mu head, state-independent learnable log-std
(`fixed_sigma: True`), value head. bfloat16-friendly: all matmuls hit the MXU
when run on TPU; parameters stay float32 for optimizer stability.

Asymmetric actor-critic (`num_states > 0`): the input is the concatenation
[policy obs | privileged critic states]; the actor trunk consumes the policy
slice and a SEPARATE critic trunk consumes the privileged slice (rl_games
central-value semantics — a capability the reference ships hyperparameters
for but never wires up; SURVEY §2.9).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    num_actions: int
    units: Sequence[int] = (512, 256, 128)
    sigma_init: float = 0.0  # log-std init => sigma = 1.0
    compute_dtype: jnp.dtype = jnp.float32
    # width of the privileged critic slice appended to the obs buffer;
    # 0 => symmetric shared-trunk network (reference parity)
    num_states: int = 0

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs.astype(self.compute_dtype)
        if self.num_states > 0:
            actor_in = x[..., : x.shape[-1] - self.num_states]
            critic_in = x[..., x.shape[-1] - self.num_states:]
            a = actor_in
            for i, u in enumerate(self.units):
                a = nn.Dense(u, dtype=self.compute_dtype, name=f"actor_{i}")(a)
                a = nn.elu(a)
            c = critic_in
            for i, u in enumerate(self.units):
                c = nn.Dense(u, dtype=self.compute_dtype, name=f"critic_{i}")(c)
                c = nn.elu(c)
            mu = nn.Dense(self.num_actions, dtype=self.compute_dtype, name="mu")(a)
            value = nn.Dense(1, dtype=self.compute_dtype, name="value")(c)
        else:
            for u in self.units:
                x = nn.Dense(u, dtype=self.compute_dtype)(x)
                x = nn.elu(x)
            mu = nn.Dense(self.num_actions, dtype=self.compute_dtype)(x)
            value = nn.Dense(1, dtype=self.compute_dtype)(x)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.sigma_init, jnp.float32),
            (self.num_actions,),
        )
        # clamp keeps sigma in [e^-5, e^2]: prevents exploration collapse on
        # one side and the entropy-bonus/adaptive-LR runaway (NaN losses) on
        # the other
        log_std = jnp.clip(log_std, -5.0, 2.0)
        return (
            mu.astype(jnp.float32),
            jnp.broadcast_to(log_std, mu.shape),
            value[..., 0].astype(jnp.float32),
        )
