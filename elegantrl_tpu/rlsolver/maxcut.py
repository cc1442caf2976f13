"""Massively-parallel MaxCut simulator (TPU-native).

Capability match for the reference's ``SimulatorMaxcut`` /
``SimulatorGraphMaxCut`` (``rlsolver/envs/env_mcpg_maxcut.py:19``,
``env_l2a_maxcut.py:18-114``): thousands of candidate solutions evaluated in
parallel, plus in-simulator local search.

TPU-native redesign: solutions are a ``(num_sims, num_nodes)`` 0/1 matrix and
the objective is one MXU matmul —

    cut(x) = x^T A (1 - x)            (A symmetric, counted once)

instead of the reference's per-edge gather/XOR reduction.  Per-node flip
*gains* for every sim come from the same product:

    gain_i = s_i * (A s)_i  with  s = 2x - 1   (flip improves iff gain > 0)

which powers vectorized greedy local search and simulated annealing sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import edges_to_adjacency


class MaxCutSimulator:
    """Batched MaxCut over a fixed graph. All methods are jit-compatible
    pure functions of (xs, key)."""

    def __init__(self, edges: np.ndarray, num_nodes: int):
        self.num_nodes = int(num_nodes)
        adj = edges_to_adjacency(edges, num_nodes)
        self.adj = jnp.asarray(adj)                       # (N, N) symmetric
        self.total_weight = float(adj.sum() / 2)
        self.num_edges = int((adj != 0).sum() // 2)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.5, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        """Cut value per sim: xs (S, N) in {0,1} -> (S,)."""
        ax = xs @ self.adj                                # (S, N) MXU matmul
        return jnp.sum(ax * (1.0 - xs), axis=-1)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """gain_i = cut(flip i) - cut(x), all nodes all sims at once."""
        s = 2.0 * xs - 1.0
        return s * (s @ self.adj)

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search(self, xs: jax.Array, key: jax.Array,
                     num_iters: int = 8) -> jax.Array:
        """Greedy best-improvement local search, vectorized over sims:
        each iteration flips every sim's highest-gain node (if improving).
        Replaces the reference's sequential per-node Python sweep
        (``mcpg.py:136-143``) with num_iters fused matvec rounds."""

        def body(xs, key_t):
            gains = self.flip_gains(xs)
            # random tie-break so parallel sims diverge
            noise = jax.random.uniform(key_t, gains.shape) * 1e-3
            best = jnp.argmax(gains + noise, axis=-1)     # (S,)
            improve = jnp.take_along_axis(gains, best[:, None], -1)[:, 0] > 0
            flip = jax.nn.one_hot(best, self.num_nodes) * improve[:, None]
            return jnp.abs(xs - flip), None

        xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_iters))
        return xs

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        """Parallel conditional-flip sweeps: every node whose flip improves
        AND that wins a random per-node coin flips simultaneously (the coin
        prevents neighbor oscillation).  Much faster convergence per FLOP on
        large graphs than one-flip-per-iteration."""

        def body(xs, key_t):
            gains = self.flip_gains(xs)
            coin = jax.random.bernoulli(key_t, 0.5, gains.shape)
            flip = ((gains > 0) & coin).astype(jnp.float32)
            return jnp.abs(xs - flip), None

        xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_sweeps))
        return xs

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        objs = self.obj(xs)
        i = jnp.argmax(objs)
        return objs[i], xs[i]
