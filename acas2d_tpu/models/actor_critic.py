"""Actor-critic policy network matching SB3's default MlpPolicy.

The reference trains `PPO('MlpPolicy', ...)` (training_main.py:44-48) whose
recorded architecture (SURVEY.md §2 C8, extracted from the committed
best_model.zip) is:

  * separate pi and vf towers, each Dense(64) -> tanh -> Dense(64) -> tanh
  * action head Dense(1), value head Dense(1)
  * orthogonal init: tower gains sqrt(2), action head gain 0.01, value head
    gain 1.0; zero biases
  * state-independent log-std parameter, initialized to 0
  * no observation normalization, no squashing

Implemented in flax.linen.  Obs dim is 8 and hidden 64 — the matmuls are
(B,8)x(8,64), (B,64)x(64,64): batched over thousands of envs they tile onto
the MXU; run them in f32 (bf16 buys nothing at this size and costs eval
noise).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _orth(gain: float):
    return nn.initializers.orthogonal(scale=gain)


class MlpTower(nn.Module):
    hidden: Sequence[int] = (64, 64)
    gain: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, kernel_init=_orth(self.gain),
                         bias_init=nn.initializers.zeros, name=f"dense_{i}")(x)
            x = nn.tanh(x)
        return x


class ActorCritic(nn.Module):
    """Returns (action_mean (..., act_dim), log_std (act_dim,), value (...,))."""
    act_dim: int = 1
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array, jax.Array]:
        pi_latent = MlpTower(self.hidden, name="pi_tower")(obs)
        vf_latent = MlpTower(self.hidden, name="vf_tower")(obs)
        mean = nn.Dense(self.act_dim, kernel_init=_orth(0.01),
                        bias_init=nn.initializers.zeros,
                        name="action_head")(pi_latent)
        value = nn.Dense(1, kernel_init=_orth(1.0),
                         bias_init=nn.initializers.zeros,
                         name="value_head")(vf_latent)
        log_std = self.param("log_std", nn.initializers.zeros, (self.act_dim,))
        # Numerical-stability clamp: long large-batch runs can drive the
        # entropy so low (sigma ~ 5e-3) that importance ratios overflow f32
        # and the run NaNs (observed at ~65M steps).  SB3's runs end before
        # collapse; inside the clamp range behavior is identical.
        # Straight-through: forward value is clipped but the gradient is the
        # identity, so the parameter is never frozen at the bound — the
        # optimizer (and any entropy bonus) can always pull it back inside.
        clipped = jnp.clip(log_std, -4.0, 2.0)
        log_std = log_std + jax.lax.stop_gradient(clipped - log_std)
        return mean, log_std, jnp.squeeze(value, -1)


# ------------------------------------------------- gaussian policy helpers

LOG_2PI = math.log(2.0 * math.pi)


def gaussian_log_prob(x, mean, log_std):
    """Sum over the action axis of the diagonal-gaussian log density
    (SB3 DiagGaussianDistribution.log_prob)."""
    var = jnp.exp(2 * log_std)
    lp = -0.5 * ((x - mean) ** 2 / var + 2 * log_std + LOG_2PI)
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(log_std):
    """Summed diagonal-gaussian entropy: 0.5*(1+log(2pi)) + log_std per dim."""
    return jnp.sum(0.5 * (1.0 + LOG_2PI) + log_std, axis=-1)


def sample_action(key, mean, log_std):
    """Reparameterized sample; NOT clipped — log-probs are taken of the raw
    sample, and the env receives a clipped copy (SB3 collect_rollouts
    clips to the action-space box before env.step)."""
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(log_std) * noise
