"""Advantage estimation as reverse-time ``lax.scan``s.

Reproduces both recursions of the reference's ``AgentPPO.get_advantages``
(AgentPPO.py:207-232) — the V-trace-style variant and plain GAE — plus the
truncation bootstrapping (rewards at truncated steps get +V(s_t), undone
forced False; AgentPPO.py:211-214) and the backward cumulative-reward scan
(AgentBase.get_cumulative_rewards, AgentBase.py:226-237).

All functions take time-major arrays shaped ``(horizon_len, num_envs)`` and
are pure: they compile into a single fused scan on TPU instead of the
reference's Python ``for t in range(H-1, -1, -1)`` loop of kernel launches.

Every recursion here is a first-order LINEAR recurrence
``x_t = a_t * x_{t+1} + b_t``, so for horizons >= :data:`ASSOC_MIN_H` it is
evaluated with ``jax.lax.associative_scan`` — log2(H) levels of (H, N)
elementwise ops instead of H sequential steps, attacking the op-launch
latency the profiler shows dominating the update half (bench.py sol_bound
'op-latency').  The sequential unrolled scan is kept for short horizons and
as the reference form; both paths are bit-compatible to f32 reassociation
(tests/test_gae.py parity assertions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# horizon below which the sequential unrolled scan beats the associative
# form's extra full-array passes (levels ~ log2 H; at tiny H the sequential
# body is only a handful of fused ops anyway)
ASSOC_MIN_H = 16


def _linrec_reverse(a: jax.Array, b: jax.Array) -> jax.Array:
    """x_t = a_t * x_{t+1} + b_t with x_H = 0, all t at once.

    Composition of two adjacent steps is ``(a1, b1) . (a2, b2) =
    (a1*a2, b1 + a1*b2)`` — associative, so the whole suffix product is a
    depth-log2(H) ``associative_scan`` instead of an H-step scan."""

    def compose(upstream, earlier):
        # with reverse=True the FIRST argument is the already-combined
        # suffix (later timesteps), the SECOND the earlier element being
        # prepended: x = a_earlier * x_suffix + b_earlier
        au, bu = upstream
        ae, be = earlier
        return au * ae, be + ae * bu

    _, x = jax.lax.associative_scan(compose, (a, b), reverse=True, axis=0)
    return x


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
    if rewards.shape[0] >= ASSOC_MIN_H:
        # adv_t = (r_t + m_t*v_{t+1} - v_t) + (m_t*lam)*adv_{t+1}
        v_next = jnp.concatenate([values[1:], next_value[None]], axis=0)
        return _linrec_reverse(masks * lam, rewards + masks * v_next - values)

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
    if rewards.shape[0] >= ASSOC_MIN_H:
        # carry_t = (v_t*(1-lam) + lam*r_t) + (lam*m_t)*carry_{t+1};
        # adv_t   = r_t - v_t + m_t*carry_{t+1}
        carry = _linrec_reverse(lam * masks,
                                values * (1.0 - lam) + lam * rewards)
        carry_next = jnp.concatenate(
            [carry[1:], jnp.zeros_like(carry[:1])], axis=0)
        return rewards - values + masks * carry_next

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
    if rewards.shape[0] >= ASSOC_MIN_H:
        b = rewards.at[-1].add(masks[-1] * next_value)   # fold in the seed
        return _linrec_reverse(masks, b)

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

    The strided slice is evaluated as a MASKED reduction over the full
    array instead of ``advantages[::4, ::4]``: the lane-dim stride lowers
    to an XLA gather on TPU that the profiler measured at ~166 us/round on
    the (64, 4096) flagship config — the single most expensive op in the
    update half — while the iota-mask form fuses into a plain reduction.
    Same estimator (unbiased n-1, matching torch .std()), f32-reassociation
    equal (tests/test_gae.py::test_normalize_advantages_masked_parity).
    """
    mean = jnp.mean(advantages)
    h, w = advantages.shape
    mask = ((jnp.arange(h) % 4 == 0)[:, None]
            & (jnp.arange(w) % 4 == 0)[None, :]).astype(advantages.dtype)
    n = ((h + 3) // 4) * ((w + 3) // 4)
    sub_mean = jnp.sum(advantages * mask) / n
    denom = jnp.maximum(n - 1, 1)
    std = jnp.sqrt(
        jnp.sum(jnp.square(advantages - sub_mean) * mask) / denom)
    return (advantages - mean) / (std + eps)
