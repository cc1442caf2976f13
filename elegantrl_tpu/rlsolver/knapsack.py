"""0/1 knapsack: batched simulator, heuristic solvers, exact DP (TPU-native).

Capability match for the reference's ``Problem.knapsack``
(``rlsolver/methods/config.py:24``; the reference routes it to its
Gurobi/QUBO path).  Same batched pattern as the other simulators: solutions
are (num_sims, num_items) 0/1; the penalized objective and per-item flip
gains are fused elementwise ops, so the generic ``simulated_annealing`` and
``genetic_algorithm`` drivers work unchanged.  ``knapsack_dp`` is the exact
O(N*W) dynamic program with the capacity axis vectorized (one ``lax.scan``
over items, each step a shifted elementwise max over the whole value table)
— used as ground truth in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KnapsackSimulator:
    """max v.x  s.t.  w.x <= capacity, x in {0,1}^N.

    Penalized objective = ``v.x - penalty * relu(w.x - C) - B * (w.x > C)``
    where ``B = sum(v) + 1``.  The step term makes EVERY infeasible solution
    strictly worse than the (always feasible) empty set, so the penalized
    optimum is guaranteed feasible regardless of value/weight scales; the
    linear term with ``penalty >= 2 * max(v_i/w_i)`` keeps a slope toward
    feasibility (dropping any item from a still-infeasible state is a
    positive flip gain).  Flip gains are exact discrete deltas, so the step
    costs nothing."""

    def __init__(self, values: np.ndarray, weights: np.ndarray,
                 capacity: float, penalty: float = None):
        self.values = jnp.asarray(values, jnp.float32)
        self.weights = jnp.asarray(weights, jnp.float32)
        self.capacity = float(capacity)
        self.num_nodes = int(len(values))   # generic-driver naming
        if penalty is None:
            penalty = 2.0 * float(np.max(np.asarray(values)
                                         / np.maximum(np.asarray(weights), 1e-9)))
        self.penalty = float(penalty)
        self.infeasible_penalty = float(np.sum(np.asarray(values))) + 1.0
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        p = min(0.5, self.capacity / max(float(jnp.sum(self.weights)), 1e-9))
        return jax.random.bernoulli(key, p, (num_sims, self.num_nodes)
                                    ).astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        value = xs @ self.values
        over = jnp.maximum(xs @ self.weights - self.capacity, 0.0)
        return (value - self.penalty * over
                - self.infeasible_penalty * (over > 0.0))

    @partial(jax.jit, static_argnums=0)
    def feasible_value(self, xs: jax.Array) -> jax.Array:
        """v.x where feasible, -inf otherwise."""
        value = xs @ self.values
        return jnp.where(xs @ self.weights <= self.capacity + 1e-6,
                         value, -jnp.inf)

    @partial(jax.jit, static_argnums=0)
    def flip_gains(self, xs: jax.Array) -> jax.Array:
        """Exact objective delta for flipping each item, every sim at once."""
        w_tot = (xs @ self.weights)[:, None]                   # (S, 1)
        sign = 1.0 - 2.0 * xs                                  # +1 add, -1 drop
        new_w = w_tot + sign * self.weights[None, :]
        pen_old = jnp.maximum(w_tot - self.capacity, 0.0)
        pen_new = jnp.maximum(new_w - self.capacity, 0.0)
        return (sign * self.values[None, :]
                - self.penalty * (pen_new - pen_old)
                - self.infeasible_penalty
                * ((pen_new > 0.0).astype(jnp.float32)
                   - (pen_old > 0.0).astype(jnp.float32)))

    @partial(jax.jit, static_argnums=(0, 3))
    def local_search_sweep(self, xs: jax.Array, key: jax.Array,
                           num_sweeps: int = 4) -> jax.Array:
        """Greedy one-flip ascent: adds value while under capacity, repairs
        overweight states by dropping the least valuable item."""
        from .methods import greedy_flip_sweeps
        return greedy_flip_sweeps(self, xs, key, num_sweeps)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        objs = self.feasible_value(xs)
        i = jnp.argmax(objs)
        return objs[i], xs[i]


def knapsack_solve(sim: KnapsackSimulator, key: jax.Array,
                   num_sims: int = 256, num_generations: int = 64
                   ) -> Tuple[jax.Array, jax.Array]:
    """Memetic GA (population crossover + greedy flip local search); on
    random 64-item instances this reaches the exact DP optimum (see
    tests/test_rlsolver_extra.py).  Returns (feasible value, x)."""
    from .ga import genetic_algorithm
    _, x = genetic_algorithm(sim, key, pop_size=num_sims,
                             num_generations=num_generations)
    return sim.feasible_value(x[None])[0], x


def knapsack_dp(values: np.ndarray, weights: np.ndarray, capacity: int
                ) -> float:
    """Exact 0/1 knapsack optimum (integer weights).  The classic per-item
    recurrence with the whole (capacity+1,) table updated as one shifted
    elementwise max per item — O(N) fused device steps instead of O(N*W)
    scalar ops."""
    w = jnp.asarray(np.asarray(weights).astype(np.int32))
    v = jnp.asarray(values, jnp.float32)
    cap = int(capacity)

    def item(table, iv):
        wi, vi = iv
        # taking item i: value table shifted right by w_i plus v_i
        idx = jnp.arange(cap + 1) - wi
        shifted = jnp.where(idx >= 0, table[jnp.maximum(idx, 0)] + vi, -jnp.inf)
        return jnp.maximum(table, shifted), None

    table0 = jnp.zeros(cap + 1, jnp.float32)
    table, _ = jax.lax.scan(item, table0, (w, v))
    return float(table[cap])
