"""Balanced graph partitioning: batched simulator (TPU-native).

Capability match for the reference's ``Problem.graph_partitioning``
(``rlsolver/methods/config.py:19``; routed to its Gurobi path).  Split the
nodes into two equal halves minimizing the cut.  Solutions are (num_sims, N)
0/1 side assignments; the penalized objective (maximized)

    obj(x) = -cut(x) - penalty * |sum(2x - 1)|

and exact per-node flip gains are fused matmul/elementwise ops, so the
generic ``simulated_annealing``/``genetic_algorithm`` drivers apply.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import edges_to_adjacency


class GraphPartitionSimulator:
    def __init__(self, edges: np.ndarray, num_nodes: int,
                 penalty: float = None):
        self.num_nodes = int(num_nodes)
        adj = np.asarray(edges_to_adjacency(edges, num_nodes))
        self.adj = jnp.asarray(adj)
        if penalty is None:
            # moving one node across changes imbalance by 2 and cut by at
            # most its weighted degree, so penalty > max_degree/2 makes every
            # imbalanced state improvable toward balance — the penalized
            # optimum is balanced on ANY edge-weight scale (a fixed constant
            # fails on weighted graphs: all-one-side becomes the optimum)
            penalty = max(1.0, float(adj.sum(axis=1).max()))
        self.penalty = float(penalty)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.5, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def cut(self, xs: jax.Array) -> jax.Array:
        ax = xs @ self.adj
        return jnp.sum(ax * (1.0 - xs), axis=-1)

    @partial(jax.jit, static_argnums=0)
    def imbalance(self, xs: jax.Array) -> jax.Array:
        return jnp.abs(jnp.sum(2.0 * xs - 1.0, axis=-1))

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        return -self.cut(xs) - self.penalty * self.imbalance(xs)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Exact obj delta for flipping each node, every sim at once."""
        s = 2.0 * xs - 1.0
        cut_gain = s * (s @ self.adj)          # delta CUT of flipping i
        bal = jnp.sum(s, axis=-1, keepdims=True)
        bal_new = jnp.abs(bal - 2.0 * s)       # flipping i changes sum by -2 s_i
        return -cut_gain - self.penalty * (bal_new - jnp.abs(bal))

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        from .methods import greedy_flip_sweeps
        return greedy_flip_sweeps(self, xs, key, num_sweeps)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Best BALANCED partition's cut (inf if none balanced)."""
        objs = jnp.where(self.imbalance(xs) <= (self.num_nodes % 2),
                         -self.cut(xs), -jnp.inf)
        i = jnp.argmax(objs)
        return -objs[i], xs[i]
