"""TSP: batched tour construction and 2-opt local search (TPU-native).

Capability match for the reference's TSP support (iSCO TSP env
``rlsolver/envs/env_isco_tsp.py``, the attention-model AM_TSP tree, TSPLIB
data dir).  Same batched-tensor pattern as the other simulators: a
population of tours ``(num_sims, N)`` improves in lockstep —

- nearest-neighbor construction: a masked argmin scan, all sims at once;
- 2-opt: per iteration every sim evaluates the FULL (N, N) move-delta
  matrix with gathered distance lookups (one fused program) and applies its
  best improving segment reversal via index arithmetic (no dynamic shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def random_cities(num_cities: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).uniform(0, 1, (num_cities, 2)).astype(np.float32)


class TSPSimulator:
    def __init__(self, cities: np.ndarray):
        self.cities = jnp.asarray(cities, jnp.float32)
        self.num_cities = int(cities.shape[0])
        diff = self.cities[:, None, :] - self.cities[None, :, :]
        self.dist = jnp.sqrt(jnp.sum(jnp.square(diff), -1))   # (N, N)
        self.if_maximize = False

    def rand_tours(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.vmap(lambda k: jax.random.permutation(k, self.num_cities))(
            jax.random.split(key, num_sims)).astype(jnp.int32)

    @partial(jax.jit, static_argnums=0)
    def tour_length(self, tours: jax.Array) -> jax.Array:
        nxt = jnp.roll(tours, -1, axis=-1)
        return jnp.sum(self.dist[tours, nxt], axis=-1)

    @partial(jax.jit, static_argnums=(0, 2))
    def nearest_neighbor(self, key: jax.Array, num_sims: int) -> jax.Array:
        """Greedy construction from random start cities, batched."""
        starts = jax.random.randint(key, (num_sims,), 0, self.num_cities)
        visited0 = jax.nn.one_hot(starts, self.num_cities, dtype=jnp.bool_)

        def body(carry, _):
            cur, visited = carry
            d = self.dist[cur]                                  # (S, N)
            d = jnp.where(visited, jnp.inf, d)
            nxt = jnp.argmin(d, axis=-1).astype(jnp.int32)
            visited = visited | jax.nn.one_hot(nxt, self.num_cities,
                                               dtype=jnp.bool_)
            return (nxt, visited), nxt

        (_, _), rest = jax.lax.scan(body, (starts.astype(jnp.int32), visited0),
                                    None, length=self.num_cities - 1)
        return jnp.concatenate([starts[None].astype(jnp.int32), rest],
                               axis=0).T                        # (S, N)

    @partial(jax.jit, static_argnums=(0, 2))
    def two_opt(self, tours: jax.Array, num_iters: int = 64) -> jax.Array:
        """Best-improvement 2-opt, one move per sim per iteration."""
        n = self.num_cities
        pos = jnp.arange(n)

        def body(tours, _):
            nxt = jnp.roll(tours, -1, axis=-1)
            a, b = tours, nxt                                   # edge i: (a_i, b_i)
            # delta(i, j) = d(a_i, a_j) + d(b_i, b_j) - d(a_i, b_i) - d(a_j, b_j)
            d_aa = self.dist[a[:, :, None], a[:, None, :]]      # (S, N, N)
            d_bb = self.dist[b[:, :, None], b[:, None, :]]
            cur = self.dist[a, b]                               # (S, N)
            delta = d_aa + d_bb - cur[:, :, None] - cur[:, None, :]
            # valid only for i < j-1 (non-adjacent edges)
            valid = (pos[None, :, None] < pos[None, None, :] - 1)
            delta = jnp.where(valid, delta, jnp.inf)
            flat = delta.reshape(delta.shape[0], -1)
            best = jnp.argmin(flat, axis=-1)
            gain = jnp.take_along_axis(flat, best[:, None], -1)[:, 0]
            i, j = best // n, best % n
            # reverse positions i+1..j where improving
            improve = gain < -1e-6
            i = jnp.where(improve, i, 0)
            j = jnp.where(improve, j, 0)
            rev = jnp.where((pos[None, :] >= i[:, None] + 1)
                            & (pos[None, :] <= j[:, None]),
                            j[:, None] + i[:, None] + 1 - pos[None, :],
                            pos[None, :])
            return jnp.take_along_axis(tours, rev, axis=-1), None

        tours, _ = jax.lax.scan(body, tours, None, length=num_iters)
        return tours

    def best(self, tours: jax.Array) -> Tuple[jax.Array, jax.Array]:
        lens = self.tour_length(tours)
        i = jnp.argmin(lens)
        return lens[i], tours[i]


def tsp_solve(cities: np.ndarray, key: jax.Array, num_sims: int = 256,
              num_iters: int = 128) -> Tuple[float, jax.Array]:
    """NN construction + 2-opt polishing over a batch of starts."""
    sim = TSPSimulator(cities)
    k1, _ = jax.random.split(key)
    tours = sim.nearest_neighbor(k1, num_sims)
    tours = sim.two_opt(tours, num_iters)
    length, tour = sim.best(tours)
    return float(length), tour
