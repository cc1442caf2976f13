"""Batched wide segment tree for Prioritized Experience Replay.

The reference implements PER as one Python ``SumTree`` object per env
sequence with pointer-chasing loops for update and root-descent sampling
(``elegantrl/train/replay_buffer.py:226-299``) — inherently sequential and
host-bound.

TPU-native redesign, round 2: a BINARY tree is the wrong shape for a vector
machine.  Descending ``log2(cap)`` levels costs ~20 sequential gather ops of
a few hundred elements each — pure per-op overhead (measured 223-292 us per
sample and 440-590 us per priority update at (M=1e6, N=8, B=256) across two
binary layouts; ``scripts/bench_per_kernels.py``).  This version uses a
**fanout-``_FANOUT`` (256) tree with exactly 2 levels**:

- ``sums``   (num_seqs, n_chunks):  per-chunk priority totals
- ``leaves`` (num_seqs, cap):       the priorities

Sampling = inverse-CDF twice, each level ONE fused compare-and-count op
(``sum(cumsum(sums) < v)`` over 4096 chunks, then the same within one
256-wide chunk) — 6 XLA ops total instead of 20 gathers.  Updates scatter
the leaves then recompute only the touched chunk sums with one gather + one
segment-sum — 4 ops instead of 20 gather+scatter pairs.  Same stratified
proportional distribution as the reference's root descent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_FANOUT = 256


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


class SegmentTree:
    """Tree state = ``(sums (N, C), leaves (N, cap))`` with
    ``C = ceil(cap / 256)``; ``cap`` is max_size padded to a chunk multiple."""

    def __init__(self, max_size: int, num_seqs: int):
        self.max_size = int(max_size)
        self.num_seqs = int(num_seqs)
        self.n_chunks = max(1, _cdiv(self.max_size, _FANOUT))
        self.cap = self.n_chunks * _FANOUT

    def init(self) -> Tuple[jax.Array, jax.Array]:
        return (jnp.zeros((self.num_seqs, self.n_chunks), jnp.float32),
                jnp.zeros((self.num_seqs, self.cap), jnp.float32))

    def _refresh_chunks(self, sums: jax.Array, leaves: jax.Array,
                        chunk_ids: jax.Array, seq_ids=None) -> jax.Array:
        """Recompute ``sums`` for the given chunk ids (duplicates fine)."""
        blocks = leaves.reshape(self.num_seqs, self.n_chunks, _FANOUT)
        if seq_ids is None:     # same chunks for every seq
            new = jnp.sum(blocks[:, chunk_ids], axis=-1)      # (N, K)
            return sums.at[:, chunk_ids].set(new)
        new = jnp.sum(blocks[seq_ids, chunk_ids], axis=-1)    # (B,)
        return sums.at[seq_ids, chunk_ids].set(new)

    def update(self, tree: Tuple[jax.Array, jax.Array], data_ids: jax.Array,
               prob: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Set leaves ``data_ids`` (H,) to ``prob`` (H, num_seqs) for every
        sequence, then refresh the touched chunk sums."""
        sums, leaves = tree
        leaves = leaves.at[:, data_ids].set(prob.T)
        # unique-ish chunk list is static-shape-unfriendly; refreshing
        # duplicates recomputes the same value, so just use them all
        sums = self._refresh_chunks(sums, leaves, data_ids // _FANOUT)
        return sums, leaves

    def update_scattered(self, tree: Tuple[jax.Array, jax.Array],
                         ids0: jax.Array, ids1: jax.Array, prob: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
        """Set individual (data_id=ids0, seq=ids1) leaves to ``prob`` (B,)."""
        sums, leaves = tree
        leaves = leaves.at[ids1, ids0].set(prob)
        sums = self._refresh_chunks(sums, leaves, ids0 // _FANOUT, ids1)
        return sums, leaves

    def sample(self, tree: Tuple[jax.Array, jax.Array], key: jax.Array,
               sub_batch: int) -> Tuple[jax.Array, jax.Array]:
        """Stratified proportional sampling (reference ``important_sampling``,
        replay_buffer.py:284-299): per seq, draw ``sub_batch`` values
        ``(j + U) * total / sub_batch`` and inverse-CDF them through the two
        levels.  Returns (data_ids, priorities), each (num_seqs, sub_batch)."""
        sums, leaves = tree
        total = jnp.sum(sums, axis=1, keepdims=True)           # (N, 1)
        u = jax.random.uniform(key, (self.num_seqs, sub_batch))
        v = (jnp.arange(sub_batch)[None, :] + u) * (total / sub_batch)

        # level 1: which chunk — count how many chunk-CDF entries are < v
        cdf = jnp.cumsum(sums, axis=1)                         # (N, C)
        chunk = jnp.sum(cdf[:, None, :] < v[:, :, None],
                        axis=-1).astype(jnp.int32)             # (N, sub)
        chunk = jnp.minimum(chunk, self.n_chunks - 1)
        v = v - jnp.where(chunk > 0,
                          jnp.take_along_axis(cdf, jnp.maximum(chunk - 1, 0),
                                              axis=1), 0.0)

        # level 2: which leaf within the 256-wide chunk
        blocks = leaves.reshape(self.num_seqs, self.n_chunks, _FANOUT)
        block = jnp.take_along_axis(
            blocks, chunk[:, :, None], axis=1)                 # (N, sub, 256)
        bcdf = jnp.cumsum(block, axis=-1)
        off = jnp.sum(bcdf < v[:, :, None], axis=-1).astype(jnp.int32)
        off = jnp.minimum(off, _FANOUT - 1)

        ids = chunk * _FANOUT + off
        prios = jnp.take_along_axis(leaves, ids, axis=1)
        return ids, prios

    def from_leaves(self, leaves: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Rebuild from a (num_seqs, max_size) leaf slice (checkpoint
        restore)."""
        full = jnp.zeros((self.num_seqs, self.cap), jnp.float32)
        full = jax.lax.dynamic_update_slice_in_dim(full, leaves, 0, axis=1)
        sums = full.reshape(self.num_seqs, self.n_chunks, _FANOUT).sum(-1)
        return sums, full

    def leaves(self, tree: Tuple[jax.Array, jax.Array]) -> jax.Array:
        """(num_seqs, max_size) valid-leaf slice (for checkpointing)."""
        return tree[1][:, :self.max_size]

    def totals(self, tree: Tuple[jax.Array, jax.Array]) -> jax.Array:
        """Per-seq total priority (the binary tree's root values)."""
        return jnp.sum(tree[0], axis=1)

    def min_leaf(self, tree: Tuple[jax.Array, jax.Array], size: jax.Array
                 ) -> jax.Array:
        """Per-seq minimum priority over the ``size`` valid leaves
        (reference divides by ``tree[beg:end].min()``, :297)."""
        valid = jnp.arange(self.max_size)[None, :] < size
        return jnp.min(jnp.where(valid, tree[1][:, :self.max_size], jnp.inf),
                       axis=1)
