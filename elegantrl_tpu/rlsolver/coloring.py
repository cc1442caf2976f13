"""Graph-coloring simulator + solvers (TPU-native).

Capability match for the reference's ``Problem.graph_coloring``
(``rlsolver/methods/config.py:26``; the reference declares the problem in
its enum and solves it via its Gurobi MILP path, ``methods/gurobi.py:258``).
Here it gets the same massively-parallel-simulator treatment as MaxCut:
solutions are a ``(num_sims, num_nodes)`` int color matrix; conflict counts
for every node x every color across all sims come from one batched MXU
einsum over the one-hot coloring —

    C[s, n, k] = sum_m A[n, m] * onehot(x)[s, m, k]

powering vectorized min-conflict descent (argmin over colors) and Metropolis
annealing.  Objective: number of monochromatic edges (0 == proper coloring).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import edges_to_adjacency


class GraphColoringSimulator:
    """Batched K-coloring over a fixed graph; minimizes conflicts."""

    def __init__(self, edges: np.ndarray, num_nodes: int, num_colors: int):
        self.num_nodes = int(num_nodes)
        self.num_colors = int(num_colors)
        self.adj = jnp.asarray((edges_to_adjacency(edges, num_nodes) > 0)
                               .astype(np.float32))
        self.if_maximize = False

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.randint(key, (num_sims, self.num_nodes), 0,
                                  self.num_colors)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        """Monochromatic-edge count per sim: xs (S, N) int -> (S,)."""
        onehot = jax.nn.one_hot(xs, self.num_colors)          # (S, N, K)
        neigh = jnp.einsum('nm,smk->snk', self.adj, onehot)   # (S, N, K)
        return jnp.sum(onehot * neigh, axis=(1, 2)) / 2.0

    @partial(jax.jit, static_argnums=0)
    def color_conflicts(self, xs: jax.Array) -> jax.Array:
        """(S, N, K): conflicts node n would have under each color k."""
        onehot = jax.nn.one_hot(xs, self.num_colors)
        return jnp.einsum('nm,smk->snk', self.adj, onehot)

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search(self, xs: jax.Array, key: jax.Array,
                     num_sweeps: int = 16) -> jax.Array:
        """Parallel min-conflict sweeps: every node moves to its least
        conflicted color, gated by a per-node coin so adjacent nodes don't
        oscillate in lockstep (same trick as MaxCutSimulator's sweep)."""

        def body(xs, key_t):
            k_tie, k_coin = jax.random.split(key_t)
            conf = self.color_conflicts(xs)
            noise = jax.random.uniform(k_tie, conf.shape) * 1e-3
            best = jnp.argmin(conf + noise, axis=-1)          # (S, N)
            coin = jax.random.bernoulli(k_coin, 0.5, xs.shape)
            cur = jnp.take_along_axis(conf, xs[..., None], -1)[..., 0]
            new = jnp.take_along_axis(conf, best[..., None], -1)[..., 0]
            xs = jnp.where(coin & (new < cur), best, xs)
            return xs, None

        xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_sweeps))
        return xs

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        objs = self.obj(xs)
        i = jnp.argmin(objs)
        return objs[i], xs[i]


def color_graph(sim: GraphColoringSimulator, key: jax.Array,
                num_sims: int = 512, num_sweeps: int = 64
                ) -> Tuple[jax.Array, jax.Array]:
    """Random restarts + min-conflict descent.  Returns (conflicts, colors);
    conflicts == 0 means a proper ``num_colors``-coloring was found."""
    k1, k2 = jax.random.split(key)
    xs = sim.rand_xs(k1, num_sims)
    xs = sim.local_search(xs, k2, num_sweeps=num_sweeps)
    return sim.best(xs)


def chromatic_upper_bound(sim_factory, edges: np.ndarray, num_nodes: int,
                          key: jax.Array, k_max: int = 16,
                          num_sims: int = 256) -> int:
    """Smallest K <= k_max for which a proper coloring is found (binary
    descent over K re-using the batched solver)."""
    for k in range(2, k_max + 1):
        sim = sim_factory(edges, num_nodes, k)
        conflicts, _ = color_graph(sim, jax.random.fold_in(key, k),
                                   num_sims=num_sims)
        if float(conflicts) == 0.0:
            return k
    return k_max + 1
