"""Batched segment (sum) tree for Prioritized Experience Replay.

The reference implements PER as one Python ``SumTree`` object per env
sequence with pointer-chasing loops for update and root-descent sampling
(``elegantrl/train/replay_buffer.py:226-299``) — inherently sequential and
host-bound.  TPU-native redesign: all ``num_seqs`` trees live in one
``(num_seqs, 2*capacity)`` array (1-indexed heap: children of node i are
2i and 2i+1, leaves at capacity + data_id).  Updates recompute parents
bottom-up with one gather+scatter per level; sampling descends all trees for
a whole batch in parallel with one gather per level.  Both are O(log2 cap)
fused device ops instead of O(batch * log cap) Python iterations.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class SegmentTree:
    def __init__(self, max_size: int, num_seqs: int):
        self.max_size = int(max_size)
        self.num_seqs = int(num_seqs)
        self.cap = _next_pow2(self.max_size)
        self.depth = self.cap.bit_length() - 1  # log2(cap)

    def init(self) -> jax.Array:
        return jnp.zeros((self.num_seqs, 2 * self.cap), jnp.float32)

    def _propagate(self, tree: jax.Array, seq_ids: jax.Array,
                   node_ids: jax.Array) -> jax.Array:
        """Recompute ancestors of (seq_ids, node_ids) pairs bottom-up.
        Duplicate parents are recomputed to the same value, so scatter-set
        with duplicates is safe."""
        ids = node_ids
        for _ in range(self.depth):
            parents = ids // 2
            left = tree[seq_ids, 2 * parents]
            right = tree[seq_ids, 2 * parents + 1]
            tree = tree.at[seq_ids, parents].set(left + right)
            ids = parents
        return tree

    def update(self, tree: jax.Array, data_ids: jax.Array, prob: jax.Array
               ) -> jax.Array:
        """Set leaves ``data_ids`` (H,) to ``prob`` (H, num_seqs) for every
        sequence, then fix ancestors."""
        h = data_ids.shape[0]
        leaves = self.cap + data_ids                      # (H,)
        tree = tree.at[:, leaves].set(prob.T)             # (N, H) scatter
        seq = jnp.broadcast_to(jnp.arange(self.num_seqs)[:, None], (self.num_seqs, h))
        nodes = jnp.broadcast_to(leaves[None, :], (self.num_seqs, h))
        return self._propagate(tree, seq.reshape(-1), nodes.reshape(-1))

    def update_scattered(self, tree: jax.Array, ids0: jax.Array,
                         ids1: jax.Array, prob: jax.Array) -> jax.Array:
        """Set individual (data_id=ids0, seq=ids1) leaves to ``prob`` (B,)."""
        leaves = self.cap + ids0
        tree = tree.at[ids1, leaves].set(prob)
        return self._propagate(tree, ids1, leaves)

    def sample(self, tree: jax.Array, key: jax.Array, sub_batch: int
               ) -> Tuple[jax.Array, jax.Array]:
        """Stratified proportional sampling (reference ``important_sampling``,
        replay_buffer.py:284-299): per seq, draw ``sub_batch`` values
        ``(j + U) * total / sub_batch`` and root-descend all trees at once.
        Returns (data_ids, priorities), each (num_seqs, sub_batch)."""
        total = tree[:, 1:2]                               # (N, 1)
        u = jax.random.uniform(key, (self.num_seqs, sub_batch))
        v = (jnp.arange(sub_batch)[None, :] + u) * (total / sub_batch)

        node = jnp.ones((self.num_seqs, sub_batch), jnp.int32)
        for _ in range(self.depth):
            left = 2 * node
            left_val = jnp.take_along_axis(tree, left, axis=1)
            go_left = v <= left_val
            node = jnp.where(go_left, left, left + 1)
            v = jnp.where(go_left, v, v - left_val)
        prios = jnp.take_along_axis(tree, node, axis=1)
        return node - self.cap, prios

    def from_leaves(self, leaves: jax.Array) -> jax.Array:
        """Rebuild a full tree from its (num_seqs, max_size) leaf slice —
        used on checkpoint restore.  Parents are recomputed level by level."""
        tree = self.init()
        tree = jax.lax.dynamic_update_slice_in_dim(tree, leaves, self.cap, axis=1)
        lo = self.cap
        while lo > 1:
            lo //= 2
            children = tree[:, 2 * lo:4 * lo]
            level = children[:, ::2] + children[:, 1::2]
            tree = jax.lax.dynamic_update_slice_in_dim(tree, level, lo, axis=1)
        return tree

    def min_leaf(self, tree: jax.Array, size: jax.Array) -> jax.Array:
        """Per-seq minimum priority over the ``size`` valid leaves
        (reference divides by ``tree[beg:end].min()``, :297)."""
        leaves = jax.lax.dynamic_slice_in_dim(tree, self.cap, self.max_size, axis=1)
        valid = jnp.arange(self.max_size)[None, :] < size
        return jnp.min(jnp.where(valid, leaves, jnp.inf), axis=1)
