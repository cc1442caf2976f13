"""Advantage estimation as reverse-time ``lax.scan``s.

Reproduces both recursions of the reference's ``AgentPPO.get_advantages``
(AgentPPO.py:207-232) — the V-trace-style variant and plain GAE — plus the
truncation bootstrapping (rewards at truncated steps get +V(s_t), undone
forced False; AgentPPO.py:211-214) and the backward cumulative-reward scan
(AgentBase.get_cumulative_rewards, AgentBase.py:226-237).

All functions take time-major arrays shaped ``(horizon_len, num_envs)`` and
are pure: they compile into a single fused scan on TPU instead of the
reference's Python ``for t in range(H-1, -1, -1)`` loop of kernel launches.
The scans unroll 8 steps per loop iteration: the bodies are a handful of
(N,)-elementwise ops, so unrolling amortises the TPU's per-op launch latency
without changing the math (profiled in scripts/profile_sol.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def apply_truncation_bootstrap(rewards: jax.Array, undones: jax.Array,
                               unmasks: jax.Array, values: jax.Array
                               ) -> Tuple[jax.Array, jax.Array]:
    """At truncated steps (unmask == 0): add V(s_t) to the reward and force
    undone to 0 (reference AgentPPO.py:211-214 — note the reference bootstraps
    with the value of the *current* state since the true next state is lost).
    Returns (rewards', undones').
    """
    truncated = 1.0 - unmasks
    rewards = rewards + truncated * values
    undones = undones * unmasks
    return rewards, undones


def gae_vtrace(rewards: jax.Array, undones: jax.Array, values: jax.Array,
               next_value: jax.Array, gamma: float, lam: float) -> jax.Array:
    """V-trace-style advantage recursion (reference AgentPPO.py:223-227):

        nv      = r[t] + gamma*undone[t]*next_value
        adv[t]  = nv - v[t] + gamma*undone[t]*lam*adv[t+1]
        next_value = v[t]

    rewards/undones/values: (H, N); next_value: (N,) = V(last_state).
    Returns advantages (H, N).
    """
    masks = undones * gamma

    def body(carry, xs):
        next_v, adv = carry
        r, m, v = xs
        nv = r + m * next_v
        adv = nv - v + m * lam * adv
        return (v, adv), adv

    (_, _), advantages = jax.lax.scan(
        body, (next_value, jnp.zeros_like(next_value)),
        (rewards, masks, values), reverse=True,
        unroll=min(8, rewards.shape[0]))
    return advantages


def gae_plain(rewards: jax.Array, undones: jax.Array, values: jax.Array,
              gamma: float, lam: float) -> jax.Array:
    """Plain-GAE variant as the reference writes it (AgentPPO.py:229-231):

        adv[t] = r[t] - v[t] + gamma*undone[t]*carry
        carry  = v[t] + lam*adv[t]

    with carry initialised to zero.  Returns advantages (H, N).
    """
    masks = undones * gamma

    def body(carry, xs):
        r, m, v = xs
        adv = r - v + m * carry
        carry = v + lam * adv
        return carry, adv

    _, advantages = jax.lax.scan(
        body, jnp.zeros_like(values[0]), (rewards, masks, values),
        reverse=True, unroll=min(8, rewards.shape[0]))
    return advantages


def cumulative_returns(rewards: jax.Array, undones: jax.Array,
                       next_value: jax.Array, gamma: float) -> jax.Array:
    """Backward discounted-return scan (reference AgentBase.py:226-237):
    ``ret[t] = r[t] + gamma*undone[t]*ret[t+1]`` seeded with ``next_value``.
    """
    masks = undones * gamma

    def body(next_ret, xs):
        r, m = xs
        ret = r + m * next_ret
        return ret, ret

    _, returns = jax.lax.scan(body, next_value, (rewards, masks),
                              reverse=True, unroll=min(8, rewards.shape[0]))
    return returns


def normalize_advantages(advantages: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Advantage normalization with the reference's strided std
    (AgentPPO.py:149): ``(adv - mean) / (adv[::4, ::4].std() + 1e-5)``.
    The stride subsamples for speed; kept for exact return parity.
    """
    mean = jnp.mean(advantages)
    sub = advantages[::4, ::4]
    n = sub.size
    # torch .std() uses the unbiased (n-1) estimator; match it.
    denom = jnp.maximum(n - 1, 1)
    std = jnp.sqrt(jnp.sum(jnp.square(sub - jnp.mean(sub))) / denom)
    return (advantages - mean) / (std + eps)
