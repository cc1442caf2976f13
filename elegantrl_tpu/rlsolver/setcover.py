"""Set cover: batched simulator (TPU-native).

Capability match for the reference's ``Problem.set_cover``
(``rlsolver/methods/config.py:25``).  Given a membership matrix M
(num_sets, num_elems), pick the fewest sets covering every element.
Solutions are (num_sims, num_sets) 0/1; coverage counts are one matmul,
so objective and exact flip gains vectorize over all sims and sets.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SetCoverSimulator:
    """Maximizes ``-(#sets) - penalty * #uncovered``."""

    def __init__(self, membership: np.ndarray, penalty: float = None):
        self.m = jnp.asarray((np.asarray(membership) > 0).astype(np.float32))
        self.num_nodes = int(self.m.shape[0])        # = num_sets
        self.num_elems = int(self.m.shape[1])
        # penalty > num_sets guarantees any full cover beats any non-cover
        self.penalty = float(penalty if penalty is not None
                             else self.num_nodes + 1.0)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.5, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def num_uncovered(self, xs: jax.Array) -> jax.Array:
        cover_counts = xs @ self.m                    # (S, E)
        return jnp.sum(cover_counts < 0.5, axis=-1).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        return -jnp.sum(xs, axis=-1) - self.penalty * self.num_uncovered(xs)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Exact obj delta for flipping each set, every sim at once:
        adding set j newly covers elems with count 0 that j contains;
        removing it uncovers elems with count 1 that j contains."""
        counts = xs @ self.m                          # (S, E)
        newly_covered = (counts < 0.5).astype(jnp.float32) @ self.m.T  # (S, sets)
        newly_uncovered = (jnp.abs(counts - 1.0) < 0.5
                           ).astype(jnp.float32) @ self.m.T
        sign = 1.0 - 2.0 * xs                          # +1 add, -1 drop
        d_uncov = jnp.where(sign > 0, -newly_covered, newly_uncovered * xs)
        return -sign - self.penalty * d_uncov

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        from .methods import greedy_flip_sweeps
        return greedy_flip_sweeps(self, xs, key, num_sweeps)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Smallest FULL cover's size (inf if no sim covers everything)."""
        sizes = jnp.where(self.num_uncovered(xs) == 0,
                          jnp.sum(xs, axis=-1), jnp.inf)
        i = jnp.argmin(sizes)
        return sizes[i], xs[i]
