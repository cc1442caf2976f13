"""Binary integer linear programming (BILP): batched penalized simulator.

Capability match for the reference's ``Problem.bilp``
(``rlsolver/methods/config.py:22``; routed to its Gurobi path).  Maximize
``c.x`` subject to ``A x <= b`` over x in {0,1}^n with a linear penalty on
constraint violation.  Constraint slacks are one matmul; exact flip gains
vectorize over all sims and variables, so the generic SA/GA drivers apply.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BILPSimulator:
    """max c.x  s.t.  A x <= b, x binary — penalized:
    ``obj = c.x - penalty * sum(relu(A x - b))``."""

    def __init__(self, c: np.ndarray, a: np.ndarray, b: np.ndarray,
                 penalty: float = None):
        self.c = jnp.asarray(c, jnp.float32)           # (n,)
        self.a = jnp.asarray(a, jnp.float32)           # (m, n)
        self.b = jnp.asarray(b, jnp.float32)           # (m,)
        self.num_nodes = int(self.c.shape[0])
        if penalty is None:
            # with continuous slacks a LINEAR penalty can trade a small
            # violation for a large c_j; sum|c| makes that trade lose unless
            # the violation is < c_j / sum|c| of a unit
            penalty = 2.0 * float(np.sum(np.abs(np.asarray(c)))) + 1.0
        self.penalty = float(penalty)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        return jax.random.bernoulli(key, 0.25, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def violation(self, xs: jax.Array) -> jax.Array:
        slack = xs @ self.a.T - self.b[None, :]        # (S, m)
        return jnp.sum(jnp.maximum(slack, 0.0), axis=-1)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        return xs @ self.c - self.penalty * self.violation(xs)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Exact obj delta for flipping each variable, every sim at once."""
        slack = xs @ self.a.T - self.b[None, :]        # (S, m)
        sign = 1.0 - 2.0 * xs                          # (S, n)
        # new slack for flipping var j: slack + sign_j * A[:, j]
        new_pen = jnp.maximum(slack[:, None, :]
                              + sign[:, :, None] * self.a.T[None, :, :], 0.0)
        d_pen = jnp.sum(new_pen, -1) - jnp.sum(jnp.maximum(slack, 0.0),
                                               -1, keepdims=True)
        return sign * self.c[None, :] - self.penalty * d_pen

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        from .methods import greedy_flip_sweeps
        return greedy_flip_sweeps(self, xs, key, num_sweeps)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Best FEASIBLE objective (-inf if no sim is feasible)."""
        objs = jnp.where(self.violation(xs) <= 1e-6, xs @ self.c, -jnp.inf)
        i = jnp.argmax(objs)
        return objs[i], xs[i]
