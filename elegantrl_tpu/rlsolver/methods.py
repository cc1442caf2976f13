"""Classical baselines for MaxCut, batched on-device.

Capability match for the reference's ``rlsolver/methods/*.py`` classical
suite — random walk (69 LoC), greedy (430), simulated_annealing (322) — each
re-stated as a jitted batched kernel over thousands of parallel candidate
solutions (the reference runs one solution at a time in Python loops).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .maxcut import MaxCutSimulator


def random_search(sim: MaxCutSimulator, key: jax.Array, num_sims: int = 1024,
                  num_rounds: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Best of num_sims * num_rounds uniform random solutions."""

    def body(carry, key_t):
        best_obj, best_x = carry
        xs = sim.rand_xs(key_t, num_sims)
        objs = sim.obj(xs)
        i = jnp.argmax(objs)
        better = objs[i] > best_obj
        best_obj = jnp.where(better, objs[i], best_obj)
        best_x = jnp.where(better, xs[i], best_x)
        return (best_obj, best_x), None

    init = (jnp.asarray(-jnp.inf), jnp.zeros(sim.num_nodes))
    (best_obj, best_x), _ = jax.lax.scan(body, init, jax.random.split(key, num_rounds))
    return best_obj, best_x


def greedy_local_search(sim: MaxCutSimulator, key: jax.Array,
                        num_sims: int = 1024, num_iters: int = 64
                        ) -> Tuple[jax.Array, jax.Array]:
    """Random restarts + greedy flip local search to a local optimum."""
    k1, k2 = jax.random.split(key)
    xs = sim.rand_xs(k1, num_sims)
    xs = sim.local_search_sweep(xs, k2, num_sweeps=num_iters)
    return sim.best(xs)


def simulated_annealing(sim: MaxCutSimulator, key: jax.Array,
                        num_sims: int = 1024, num_steps: int = 512,
                        t0: float = 2.0, t1: float = 1e-2
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batched Metropolis annealing: per step each sim proposes one random
    node flip and accepts with ``min(1, exp(gain / T))`` on a geometric
    temperature schedule (reference ``methods/simulated_annealing.py``
    behavior, vectorized)."""
    k_init, k_run = jax.random.split(key)
    xs = sim.rand_xs(k_init, num_sims)
    temps = t0 * (t1 / t0) ** (jnp.arange(num_steps) / max(num_steps - 1, 1))

    def body(carry, xt):
        xs, best_obj, best_x = carry
        temp, key_t = xt
        k_node, k_acc = jax.random.split(key_t)
        nodes = jax.random.randint(k_node, (xs.shape[0],), 0, sim.num_nodes)
        gains = jnp.take_along_axis(sim.flip_gains(xs), nodes[:, None], -1)[:, 0]
        accept = jax.random.uniform(k_acc, gains.shape) < jnp.exp(
            jnp.minimum(gains / temp, 0.0))
        accept = accept | (gains > 0)
        flip = jax.nn.one_hot(nodes, sim.num_nodes) * accept[:, None]
        xs = jnp.abs(xs - flip)

        objs = sim.obj(xs)
        i = jnp.argmax(objs)
        better = objs[i] > best_obj
        best_obj = jnp.where(better, objs[i], best_obj)
        best_x = jnp.where(better, xs[i], best_x)
        return (xs, best_obj, best_x), None

    init = (xs, jnp.asarray(-jnp.inf), jnp.zeros(sim.num_nodes))
    (xs, best_obj, best_x), _ = jax.lax.scan(
        body, init, (temps, jax.random.split(k_run, num_steps)))
    return best_obj, best_x
