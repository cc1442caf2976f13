"""Cardinality-constrained portfolio selection: batched QUBO simulator.

Capability match for the reference's ``Problem.portfolio_allocation``
(``rlsolver/methods/config.py:27``).  Markowitz selection of exactly ``k``
assets maximizing ``mu.x - lam * x^T Sigma x`` with a quadratic cardinality
penalty — the standard QUBO form.  The quadratic term and the exact flip
gains are one covariance matvec per sweep, all sims at once.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PortfolioSimulator:
    """max mu.x - lam x'Sx - penalty (sum x - k)^2  over x in {0,1}^n."""

    def __init__(self, mu: np.ndarray, sigma: np.ndarray, k: int,
                 risk_lambda: float = 1.0, penalty: float = None):
        self.mu = jnp.asarray(mu, jnp.float32)         # (n,)
        self.sigma = jnp.asarray(sigma, jnp.float32)   # (n, n) symmetric PSD
        self.k = int(k)
        self.lam = float(risk_lambda)
        self.num_nodes = int(self.mu.shape[0])
        if penalty is None:
            penalty = float(np.max(np.abs(np.asarray(mu)))) + 1.0
        self.penalty = float(penalty)
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        p = self.k / max(self.num_nodes, 1)
        return jax.random.bernoulli(key, p, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        risk = jnp.sum((xs @ self.sigma) * xs, axis=-1)
        card = jnp.square(jnp.sum(xs, axis=-1) - self.k)
        return xs @ self.mu - self.lam * risk - self.penalty * card

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Exact obj delta for flipping each asset, every sim at once.
        For x_j: 0->1, risk changes by 2 (Sigma x)_j + Sigma_jj; 1->0 by
        -2 (Sigma x)_j + Sigma_jj (using symmetric Sigma)."""
        sign = 1.0 - 2.0 * xs
        sx = xs @ self.sigma                            # (S, n)
        diag = jnp.diagonal(self.sigma)[None, :]
        d_risk = sign * 2.0 * sx + diag
        n_sel = jnp.sum(xs, axis=-1, keepdims=True)
        d_card = jnp.square(n_sel + sign - self.k) - jnp.square(n_sel - self.k)
        return (sign * self.mu[None, :] - self.lam * d_risk
                - self.penalty * d_card)

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        from .methods import greedy_flip_sweeps
        return greedy_flip_sweeps(self, xs, key, num_sweeps)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Best exactly-k selection's mean-variance value (-inf if none)."""
        value = xs @ self.mu - self.lam * jnp.sum((xs @ self.sigma) * xs, -1)
        objs = jnp.where(jnp.sum(xs, -1) == self.k, value, -jnp.inf)
        i = jnp.argmax(objs)
        return objs[i], xs[i]
