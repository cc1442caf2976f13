"""Maximal Independent Set (MIS) simulator + solvers (TPU-native).

Capability match for the reference's MIS problem support
(``rlsolver/methods/config.py:17-30`` Problem enum; iSCO MIS env
``rlsolver/envs/env_isco_mis.py``).  Same batched-tensor pattern as
:mod:`.maxcut`: solutions are (num_sims, num_nodes) 0/1, the penalized
objective

    obj(x) = sum_i x_i - penalty * sum_{(i,j) in E} x_i x_j

is one MXU matmul, and local search greedily adds free nodes / drops
conflicted ones in vectorized sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import edges_to_adjacency


class MISSimulator:
    def __init__(self, edges: np.ndarray, num_nodes: int, penalty: float = 2.0):
        self.num_nodes = int(num_nodes)
        self.adj = jnp.asarray((edges_to_adjacency(edges, num_nodes) > 0)
                               .astype(np.float32))
        self.penalty = float(penalty)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.15, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        """Penalized size; equals |S| exactly when S is independent."""
        conflicts = jnp.sum((xs @ self.adj) * xs, axis=-1) / 2.0
        return jnp.sum(xs, axis=-1) - self.penalty * conflicts

    @partial(jax.jit, static_argnums=0)
    def num_conflicts(self, xs: jax.Array) -> jax.Array:
        return jnp.sum((xs @ self.adj) * xs, axis=-1) / 2.0

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Penalized-objective delta of flipping each node: adding node i
        gains ``1 - penalty * (selected neighbors)``, removing the mirror."""
        nbr_sel = xs @ self.adj
        return (1.0 - 2.0 * xs) * (1.0 - self.penalty * nbr_sel)

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search(self, xs: jax.Array, key: jax.Array,
                     num_sweeps: int = 16) -> jax.Array:
        """Alternating repair/grow sweeps: drop selected nodes with selected
        neighbors (random half, to break symmetric conflicts), then add nodes
        with no selected neighbors."""

        def body(xs, key_t):
            nbr_sel = xs @ self.adj                      # selected neighbors
            conflicted = (xs > 0.5) & (nbr_sel > 0.5)
            coin = jax.random.bernoulli(key_t, 0.5, xs.shape)
            xs = jnp.where(conflicted & coin, 0.0, xs)
            nbr_sel = xs @ self.adj
            free = (xs < 0.5) & (nbr_sel < 0.5)
            xs = jnp.where(free, 1.0, xs)
            return xs, None

        xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_sweeps))
        # The grow step adds all conflict-free nodes at once, so two adjacent
        # free nodes can both enter in the same sweep; drop every node still
        # conflicted so the returned sets are always independent (both
        # endpoints of a violated edge are conflicted, hence both removed).
        nbr_sel = xs @ self.adj
        return jnp.where((xs > 0.5) & (nbr_sel > 0.5), 0.0, xs)

    # generic-driver entry point (methods.greedy_local_search)
    local_search_sweep = local_search

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # only count independent solutions
        objs = jnp.where(self.num_conflicts(xs) == 0,
                         jnp.sum(xs, axis=-1), -jnp.inf)
        i = jnp.argmax(objs)
        return objs[i], xs[i]


class VertexCoverSimulator:
    """Minimum vertex cover in complement space: a set is a cover iff its
    complement is independent, so every operation delegates to
    :class:`MISSimulator` on ``1 - xs``.  Solutions returned by this class
    are COVER indicator vectors; ``obj`` is a maximized penalized objective
    (``-|cover| - penalty * uncovered_edges``) so the generic drivers
    (SA/GA/greedy) work unchanged, and ``best`` reports the smallest valid
    cover with its (positive) size."""

    def __init__(self, edges: np.ndarray, num_nodes: int, penalty: float = 2.0):
        self._mis = MISSimulator(edges, num_nodes, penalty=penalty)
        self.num_nodes = self._mis.num_nodes
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return 1.0 - self._mis.rand_xs(key, num_sims)

    def obj(self, xs: jax.Array) -> jax.Array:
        return self._mis.obj(1.0 - xs) - self.num_nodes

    def num_uncovered(self, xs: jax.Array) -> jax.Array:
        """Edges with neither endpoint in the cover."""
        return self._mis.num_conflicts(1.0 - xs)

    def flip_gains(self, xs: jax.Array) -> jax.Array:
        # flipping cover bit i flips complement bit i; the objectives
        # differ by the constant N, so the gains are identical
        return self._mis.flip_gains(1.0 - xs)

    def local_search(self, xs: jax.Array, key: jax.Array,
                     num_sweeps: int = 16) -> jax.Array:
        return 1.0 - self._mis.local_search(1.0 - xs, key,
                                            num_sweeps=num_sweeps)

    # generic-driver entry point (methods.greedy_local_search)
    local_search_sweep = local_search

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Smallest VALID cover's size (inf if no sim covers every edge)."""
        sizes = jnp.where(self.num_uncovered(xs) == 0,
                          jnp.sum(xs, axis=-1), jnp.inf)
        i = jnp.argmin(sizes)
        return sizes[i], xs[i]


def greedy_mis(sim: MISSimulator, key: jax.Array, num_sims: int = 512,
               num_sweeps: int = 32) -> Tuple[jax.Array, jax.Array]:
    k1, k2 = jax.random.split(key)
    xs = sim.rand_xs(k1, num_sims)
    xs = sim.local_search(xs, k2, num_sweeps=num_sweeps)
    return sim.best(xs)
