"""Shared H-term rehearsal machinery (PPO / DDPG / TD3 / SAC variants).

The reference's Hamiltonian-term is a README-headline feature ("~6x faster
than SB3 on Hopper", README.md:153) documented for PPO, SAC, TD3 AND DDPG
(docs/source/tutorial/hterm.rst "we have implemented the H-term into several
widely-used DRL algorithms, PPO, SAC, TD3, and DDPG"), but every
implementation is absent from the snapshot — only stale entry scripts
remain (``examples/plan_PPO_H.py:53-57``, ``examples/plan_DDPG_H.py:6``
importing the nonexistent ``AgentDDPGHterm``).

Semantics per the H-term paper: rehearse k-step sub-trajectories from
high-return experience, adding a return-weighted term to the actor
objective — a likelihood bonus for stochastic policies (PPO/SAC), an
action-regression penalty for deterministic ones (DDPG/TD3).

TPU-native redesign: a fixed-shape device-resident ring updated by
vectorized scatter; each rollout inserts every env's best window (per-env
argmax over a per-start quality signal ``q``) — no Python-side trajectory
splitting, no dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class HtermBuffer(NamedTuple):
    states: jax.Array    # (K, k, S)
    actions: jax.Array   # (K, k, A)
    masks: jax.Array     # (K, k)  within-episode validity (stops at terminal)
    returns: jax.Array   # (K,)    window quality label (GAE target for PPO,
    #                              discounted window return for off-policy)
    ptr: jax.Array       # ()
    count: jax.Array     # ()


def init_hterm_buffer(buffer_size: int, k_step: int, state_dim: int,
                      action_dim: int) -> HtermBuffer:
    K, k = buffer_size, k_step
    return HtermBuffer(
        states=jnp.zeros((K, k, state_dim)),
        actions=jnp.zeros((K, k, action_dim)),
        masks=jnp.zeros((K, k)),
        returns=jnp.zeros((K,)),
        ptr=jnp.zeros((), jnp.int32), count=jnp.zeros((), jnp.int32))


def insert_best_windows(h_buf: HtermBuffer, states, actions, undones,
                        unmasks, q, k_full: int) -> HtermBuffer:
    """Insert each env's best k-step window into the ring.

    ``q``: (Hq, N) quality per window start, Hq = H - k_step + 1 with
    k_step = min(k_full, H).  Window validity stops after the first episode
    boundary inside the window — terminal OR truncation (auto-reset splices
    a new episode either way); short horizons pad to ``k_full`` with the
    tail masked invalid so the scatter matches the buffer allocation.
    """
    horizon_len, num_envs = undones.shape
    K = h_buf.states.shape[0]
    k_step = min(k_full, horizon_len)
    t0 = jnp.argmax(q, axis=0)                              # (N,)
    labels = jnp.take_along_axis(q, t0[None], axis=0)[0]
    if num_envs > K:
        # more windows than ring slots: the modular scatter below would have
        # duplicate indices (nondeterministic winner in XLA) — keep the
        # top-K windows by label instead, deterministically
        labels, keep = jax.lax.top_k(labels, K)
        t0 = t0[keep]
        states = states[:, keep]
        actions = actions[:, keep]
        undones = undones[:, keep]
        unmasks = unmasks[:, keep]
        num_envs = K
    env_ids = jnp.arange(num_envs)[None, :]
    t_idx = jnp.minimum(t0[None, :] + jnp.arange(k_full)[:, None],
                        horizon_len - 1)                    # (k, N)
    w_states = states[t_idx, env_ids]                       # (k, N, S)
    w_actions = actions[t_idx, env_ids]                     # (k, N, A)
    stop = (undones * unmasks)[t_idx, env_ids]              # (k, N)
    in_range = (jnp.arange(k_full) < k_step)[:, None]
    w_masks = jnp.concatenate(
        [jnp.ones((1, num_envs)),
         jnp.cumprod(stop, axis=0)[:-1]], 0) * in_range
    slot = (h_buf.ptr + jnp.arange(num_envs)) % K
    return h_buf._replace(
        states=h_buf.states.at[slot].set(w_states.transpose(1, 0, 2)),
        actions=h_buf.actions.at[slot].set(w_actions.transpose(1, 0, 2)),
        masks=h_buf.masks.at[slot].set(w_masks.T),
        returns=h_buf.returns.at[slot].set(labels),
        ptr=(h_buf.ptr + num_envs) % K,
        count=jnp.minimum(h_buf.count + num_envs, K))


def return_bounds(h_buf: HtermBuffer) -> Tuple[jax.Array, jax.Array]:
    """Min/max quality over filled slots — the rehearsal-weight bounds."""
    K = h_buf.returns.shape[0]
    filled = jnp.arange(K) < h_buf.count
    r_min = jnp.min(jnp.where(filled, h_buf.returns, jnp.inf))
    r_max = jnp.max(jnp.where(filled, h_buf.returns, -jnp.inf))
    return r_min, r_max


def discounted_window_returns(rewards, undones, unmasks, gamma: float,
                              k_full: int):
    """(Hq, N) masked discounted return of every k-step window start:
    ``q[t] = sum_i gamma^i * r[t+i] * prod_{j<i} cont[t+j]`` — the
    off-policy window-quality signal (on-policy PPO uses GAE targets)."""
    horizon_len = rewards.shape[0]
    k_step = min(k_full, horizon_len)
    hq = horizon_len - k_step + 1
    cont = undones * unmasks
    q = jnp.zeros_like(rewards[:hq])
    m = jnp.ones_like(rewards[:hq])
    for i in range(k_step):  # static, k_step <= 16 typically
        q = q + (gamma ** i) * rewards[i:i + hq] * m
        m = m * cont[i:i + hq]
    return q


def rehearsal_sample(h_buf: HtermBuffer, key, h_batch: int,
                     r_min=None, r_max=None):
    """Sample ``h_batch`` windows; returns (states, actions, masks, weights,
    valid) with weights = min-max-normalized quality and valid = 1 for
    filled slots.  The caller's rehearsal objective is conventionally
    ``sum(term * w * valid) / max(sum(valid), 1)``."""
    ids = jax.random.randint(key, (h_batch,), 0,
                             jnp.maximum(h_buf.count, 1))
    if r_min is None or r_max is None:
        r_min, r_max = return_bounds(h_buf)
    w = (h_buf.returns[ids] - r_min) / (r_max - r_min + 1e-6)
    valid = (ids < h_buf.count).astype(jnp.float32)
    # empty ring: bounds are (inf, -inf) and w is NaN — zero it so the
    # valid-slot contract holds for callers that update before any harvest
    w = jnp.where(valid > 0, w, 0.0)
    return h_buf.states[ids], h_buf.actions[ids], h_buf.masks[ids], w, valid
