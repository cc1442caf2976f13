"""Device-resident replay ring buffer as a pytree.

Reproduces the reference ``ReplayBuffer`` contract
(``elegantrl/train/replay_buffer.py:11-223``):

- layout ``(max_size, num_seqs, dim)`` — one ring per env sequence;
- ring-pointer insert with wraparound (reference splits the write in two,
  :87-105; here a modular scatter does both cases branch-free);
- uniform sampling over flattened (t, seq) ids from ``cur_size - 1`` with
  ``next_state = states[ids0 + 1]`` (:120-134) — including the reference's
  seam artifact at the ring pointer, kept for parity;
- optional PER via a *batched* segment tree in arrays
  (:class:`elegantrl_tpu.ops.per.SegmentTree`) replacing the reference's
  per-seq Python ``SumTree`` pointer loops (:226-299).

Everything is functional: ``update``/``sample`` take and return a
:class:`BufferState`, so the whole off-policy round (insert + sample + SGD)
compiles into one XLA program and the multi-GB buffer is donated in place.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BufferState(NamedTuple):
    states: jax.Array    # (M, N, S)
    actions: jax.Array   # (M, N, A) float | (M, N) int32 when discrete
    rewards: jax.Array   # (M, N)
    undones: jax.Array   # (M, N)
    unmasks: jax.Array   # (M, N)
    ptr: jax.Array       # () int32
    size: jax.Array      # () int32, == cur_size
    per_tree: Optional[tuple] = None  # per-level segment-tree arrays, PER only
    cum_rewards: Optional[jax.Array] = None  # (M, N) for lambda_fit_cum_r


class ReplayBuffer:
    """Static buffer description + functional ops."""

    def __init__(self, max_size: int, state_dim: int, action_dim: int,
                 num_seqs: int = 1, if_use_per: bool = False,
                 if_discrete: bool = False, args=None):
        self.max_size = int(max_size)
        self.state_dim = int(state_dim)
        self.action_dim = int(action_dim)
        self.num_seqs = int(num_seqs)
        self.if_discrete = bool(if_discrete)
        self.if_use_per = bool(if_use_per)
        # bulk-tensor storage dtype: bf16 halves the ring's HBM residency and
        # sample-gather traffic (states + float actions; scalars stay f32)
        from ..agents.base import resolve_storage_dtype
        self.storage_dtype = resolve_storage_dtype(args) or jnp.float32
        self.per_alpha = float(getattr(args, 'per_alpha', 0.6))
        self.per_beta = float(getattr(args, 'per_beta', 0.4))
        self.if_use_cum_rewards = float(getattr(args, 'lambda_fit_cum_r', 0.0)) != 0.0
        if if_use_per:
            from ..ops.per import SegmentTree
            self.tree = SegmentTree(self.max_size, self.num_seqs)
        else:
            self.tree = None

    def init(self) -> BufferState:
        M, N, S = self.max_size, self.num_seqs, self.state_dim
        actions = (jnp.zeros((M, N), jnp.int32) if self.if_discrete
                   else jnp.zeros((M, N, self.action_dim), self.storage_dtype))
        return BufferState(
            states=jnp.zeros((M, N, S), self.storage_dtype),
            actions=actions,
            rewards=jnp.zeros((M, N), jnp.float32),
            undones=jnp.zeros((M, N), jnp.float32),
            unmasks=jnp.zeros((M, N), jnp.float32),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            per_tree=self.tree.init() if self.tree else None,
            cum_rewards=(jnp.zeros((M, N), jnp.float32)
                         if self.if_use_cum_rewards else None),
        )

    def update(self, buf: BufferState, items: Tuple[jax.Array, ...]) -> BufferState:
        """Insert a rollout ``(states, actions, rewards, undones, unmasks)``
        of shape (H, N, ...) at the ring pointer."""
        states, actions, rewards, undones, unmasks = items
        h = states.shape[0]
        idx = (buf.ptr + jnp.arange(h, dtype=jnp.int32)) % self.max_size
        new = BufferState(
            states=buf.states.at[idx].set(states),
            actions=buf.actions.at[idx].set(actions),
            rewards=buf.rewards.at[idx].set(rewards),
            undones=buf.undones.at[idx].set(undones),
            unmasks=buf.unmasks.at[idx].set(unmasks),
            ptr=(buf.ptr + h) % self.max_size,
            size=jnp.minimum(buf.size + h, self.max_size),
            per_tree=buf.per_tree,
            cum_rewards=buf.cum_rewards,
        )
        if self.tree is not None:
            # fresh samples get max priority (reference prob=10, :115)
            prob = jnp.full((h, self.num_seqs), 10.0)
            new = new._replace(per_tree=self.tree.update(new.per_tree, idx, prob))
        return new

    def sample(self, buf: BufferState, key: jax.Array, batch_size: int
               ) -> Tuple[jax.Array, ...]:
        """Uniform sample of ``batch_size`` transitions; returns
        (state, action, reward, undone, unmask, next_state, (ids0, ids1))."""
        sample_len = jnp.maximum(buf.size - 1, 1)
        ids = jax.random.randint(key, (batch_size,), 0, sample_len * self.num_seqs)
        ids0 = ids % sample_len
        ids1 = ids // sample_len
        return (
            buf.states[ids0, ids1],
            buf.actions[ids0, ids1],
            buf.rewards[ids0, ids1],
            buf.undones[ids0, ids1],
            buf.unmasks[ids0, ids1],
            buf.states[ids0 + 1, ids1],
            (ids0, ids1),
        )

    def sample_rows(self, buf: BufferState, key: jax.Array, batch_size: int
                    ) -> Tuple[jax.Array, ...]:
        """Row-stratified uniform sample: draw ``batch_size // num_seqs``
        whole time rows — each a CONTIGUOUS ``(num_seqs, dim)`` slab — and
        use every env column of those rows as the minibatch.

        Why this exists (TPU access-pattern redesign): the reference's
        per-sample iid draw (``elegantrl/train/replay_buffer.py:125-134``,
        mirrored by :meth:`sample`) gathers ``batch_size`` scattered
        24-byte rows, which on TPU lowers to a latency-bound gather — a
        device trace of the td3_hopper-shaped round measured the gathers at
        ~850 us/round, 65% of device time, vs ~150 us for the entire fused
        16-update kernel (SOL_BREAKDOWN.json, round 5).  Row draws replace
        the gather with ``R`` dynamic slices of contiguous rows.  Sampling
        semantics: each transition still appears with equal probability;
        the difference is that a minibatch's samples share time indices
        across the (independent) env axis instead of being fully iid.

        Learning-verified on every off-policy RESULTS.md row EXCEPT one
        measured limitation: SAC on host MuJoCo Hopper (64 envs, batch
        512 -> only R=8 distinct time rows per minibatch) plateaued
        deterministically at avgR ~740 where iid draws reach >3000 — the
        temporal minibatch diversity matters when R is small AND the task
        has a narrow optimum.  That config sets
        ``args.replay_row_sample = False`` (scripts/verify_learning.py
        ``_run_sac_mujoco_host``); every other row (R from 1@1024 envs to
        32@8 envs) learns to target on rows.

        Same return contract as :meth:`sample`.
        """
        n = self.num_seqs
        r = batch_size // n
        sample_len = jnp.maximum(buf.size - 1, 1)
        rows = jax.random.randint(key, (r,), 0, sample_len)
        ids0 = jnp.repeat(rows, n)
        ids1 = jnp.tile(jnp.arange(n, dtype=jnp.int32), r)

        def take(arr, row_ids):
            x = jnp.take(arr, row_ids, axis=0)       # (r, n, ...)
            return x.reshape((batch_size,) + arr.shape[2:])

        return (take(buf.states, rows),
                take(buf.actions, rows),
                take(buf.rewards, rows),
                take(buf.undones, rows),
                take(buf.unmasks, rows),
                take(buf.states, rows + 1),
                (ids0, ids1))

    def sample_for_per(self, buf: BufferState, key: jax.Array, batch_size: int):
        """PER sample (reference :136-166): per-seq stratified draws from the
        segment tree; importance weights ``(prio/min_prio)^-beta``.  Returns
        (state, action, reward, undone, unmask, next_state, is_weight,
        (ids0, ids1))."""
        assert batch_size % self.num_seqs == 0
        sub = batch_size // self.num_seqs
        ids0, prios = self.tree.sample(buf.per_tree, key, sub)  # (N, sub) each
        ids0 = jnp.minimum(ids0, buf.size - 2)
        ids1 = jnp.broadcast_to(jnp.arange(self.num_seqs)[:, None], ids0.shape)
        ids0, ids1 = ids0.reshape(-1), ids1.reshape(-1)

        min_prio = self.tree.min_leaf(buf.per_tree, buf.size)  # (N,) per-seq
        weights = jnp.power(
            prios / jnp.maximum(min_prio, 1e-8).reshape(self.num_seqs, 1),
            -self.per_beta).reshape(-1)
        return (
            buf.states[ids0, ids1],
            buf.actions[ids0, ids1],
            buf.rewards[ids0, ids1],
            buf.undones[ids0, ids1],
            buf.unmasks[ids0, ids1],
            buf.states[ids0 + 1, ids1],
            weights,
            (ids0, ids1),
        )

    def td_error_update_for_per(self, buf: BufferState, ids: Tuple[jax.Array, jax.Array],
                                td_error: jax.Array) -> BufferState:
        """Priority update ``prob = clip(td, 1e-8, 10)^alpha`` (reference :168-179)."""
        ids0, ids1 = ids
        prob = jnp.power(jnp.clip(td_error, 1e-8, 10.0), self.per_alpha)
        tree = self.tree.update_scattered(buf.per_tree, ids0, ids1, prob)
        return buf._replace(per_tree=tree)

    def update_cum_rewards(self, buf: BufferState, horizon_len: int,
                           cum_rewards: jax.Array) -> BufferState:
        """Write backward-discounted returns for the just-inserted span
        (reference ``update_cum_rewards``, replay_buffer.py:213-223).
        ``cum_rewards`` is (horizon_len, N) for the rows ending at ptr."""
        idx = (buf.ptr - horizon_len + jnp.arange(horizon_len, dtype=jnp.int32)
               ) % self.max_size
        return buf._replace(cum_rewards=buf.cum_rewards.at[idx].set(cum_rewards))

    def save_or_load_history(self, buf: BufferState, cwd: str, if_save: bool
                             ) -> BufferState:
        """Persist the buffer (reference :181-211) as one npz.  Every field
        is round-tripped, including the PER tree leaves (priorities survive a
        resume; interior nodes are rebuilt on load) and ``cum_rewards``."""
        path = os.path.join(cwd, 'replay_buffer.npz')
        if if_save:
            # widen bf16 storage to f32 for npz (lossless; re-cast on load)
            arrays = {k: np.asarray(jnp.asarray(v, jnp.float32)
                                    if v.dtype == jnp.bfloat16 else v)
                      for k, v in buf._asdict().items()
                      if v is not None and k != 'per_tree'}
            if buf.per_tree is not None:
                # persist only the (N, max_size) leaf slice; parents are a
                # deterministic function of the leaves
                arrays['per_leaves'] = np.asarray(self.tree.leaves(buf.per_tree))
            np.savez_compressed(path, **arrays)
            print(f"| buffer.save_or_load_history(): Save {path}", flush=True)
            return buf
        if os.path.isfile(path):
            d = np.load(path)
            print(f"| buffer.save_or_load_history(): Load {path}", flush=True)
            buf = buf._replace(
                states=jnp.asarray(d['states'], buf.states.dtype),
                actions=jnp.asarray(d['actions'], buf.actions.dtype),
                rewards=jnp.asarray(d['rewards']), undones=jnp.asarray(d['undones']),
                unmasks=jnp.asarray(d['unmasks']),
                ptr=jnp.asarray(d['ptr']), size=jnp.asarray(d['size']))
            if 'cum_rewards' in d.files and buf.cum_rewards is not None:
                buf = buf._replace(cum_rewards=jnp.asarray(d['cum_rewards']))
            if 'per_leaves' in d.files and self.tree is not None:
                buf = buf._replace(per_tree=self.tree.from_leaves(
                    jnp.asarray(d['per_leaves'])))
        return buf
