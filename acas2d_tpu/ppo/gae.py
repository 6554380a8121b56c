"""Generalized Advantage Estimation as a reverse lax.scan.

Matches SB3's RolloutBuffer.compute_returns_and_advantage semantics
(gamma 0.99, lambda 0.95, SURVEY.md §6): terminal steps (done=True) do not
bootstrap — with in-graph auto-reset every done is a true environment
terminal, mirroring the reference where timeouts are genuine terminals (the
old-gym env sets no truncation flag, SURVEY.md §2.2).

returns = advantages + values (the TD(lambda) value targets SB3 regresses
the critic onto).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(rewards: jax.Array, values: jax.Array, dones: jax.Array,
                last_value: jax.Array, gamma: float, gae_lambda: float
                ) -> Tuple[jax.Array, jax.Array]:
    """All inputs time-major: rewards/values/dones (T, B), last_value (B,).

    dones[t] marks that the transition at time t *ended* an episode, so
    values[t+1] (the reset state's value) must not leak across it.
    Returns (advantages (T,B), returns (T,B)).
    """
    not_done = 1.0 - dones.astype(values.dtype)

    def body(carry, inp):
        gae, next_value = carry
        reward, value, nd = inp
        delta = reward + gamma * next_value * nd - value
        gae = delta + gamma * gae_lambda * nd * gae
        return (gae, value), gae

    (_, _), adv_rev = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards[::-1], values[::-1], not_done[::-1]))
    advantages = adv_rev[::-1]
    return advantages, advantages + values
