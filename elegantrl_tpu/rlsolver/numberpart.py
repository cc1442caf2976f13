"""Number partitioning: batched simulator (TPU-native).

Capability match for the reference's ``Problem.number_partitioning``
(``rlsolver/methods/config.py:20``).  Partition a multiset ``a`` into two
halves minimizing ``|sum(A) - sum(B)|``.  Solutions are (num_sims, N) 0/1
side assignments; objective and flip gains are elementwise, so the generic
``simulated_annealing``/``genetic_algorithm`` drivers apply unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NumberPartitionSimulator:
    """Maximizes ``-|a.(2x-1)|`` (0 == perfect partition)."""

    def __init__(self, numbers: np.ndarray):
        self.numbers = jnp.asarray(numbers, jnp.float32)
        self.num_nodes = int(len(numbers))
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.5, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def imbalance(self, xs: jax.Array) -> jax.Array:
        return jnp.abs((2.0 * xs - 1.0) @ self.numbers)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        return -self.imbalance(xs)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """obj delta for flipping each element, every sim at once."""
        diff = ((2.0 * xs - 1.0) @ self.numbers)[:, None]      # (S, 1)
        delta = -2.0 * (2.0 * xs - 1.0) * self.numbers[None, :]
        return jnp.abs(diff) - jnp.abs(diff + delta)

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        from .methods import greedy_flip_sweeps
        # gains near a perfect partition can be tiny — keep the tie noise
        # well below them
        return greedy_flip_sweeps(self, xs, key, num_sweeps, tie_noise=1e-6)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        objs = self.obj(xs)
        i = jnp.argmax(objs)
        return objs[i], xs[i]
