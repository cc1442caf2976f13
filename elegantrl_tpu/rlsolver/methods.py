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


def _require_maximizer(sim, driver: str) -> None:
    """The batched binary drivers below maximize ``sim.obj``; simulators
    that declare ``if_maximize = False`` (tsp, coloring) have minimizing
    objectives AND non-binary solution encodings — reject them loudly
    instead of silently optimizing the wrong direction."""
    if not getattr(sim, 'if_maximize', True):
        raise ValueError(
            f"{driver} maximizes sim.obj over binary solutions; "
            f"{type(sim).__name__} declares if_maximize=False — use its "
            f"dedicated solver (local_search / two_opt) instead")


def greedy_flip_sweeps(sim, xs: jax.Array, key: jax.Array,
                       num_sweeps: int = 4,
                       tie_noise: float = 1e-4) -> jax.Array:
    """Shared one-flip greedy descent: each sweep, every sim flips its
    single best-gain variable when that gain is positive.  ``tie_noise``
    breaks exact gain ties randomly so parallel sims don't move in
    lockstep (it must stay far below the problem's minimum nonzero gain).
    This is the ``local_search_sweep`` implementation behind every binary
    simulator exposing ``flip_gains``."""

    def body(xs, key_t):
        gains = sim.flip_gains(xs)
        noise = jax.random.uniform(key_t, gains.shape) * tie_noise
        best = jnp.argmax(gains + noise, axis=-1)
        improve = jnp.take_along_axis(gains, best[:, None], -1)[:, 0] > 0
        flip = jax.nn.one_hot(best, sim.num_nodes) * improve[:, None]
        return jnp.abs(xs - flip), None

    xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_sweeps))
    return xs


def random_search(sim, key: jax.Array, num_sims: int = 1024,
                  num_rounds: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Best of num_sims * num_rounds uniform random solutions."""
    _require_maximizer(sim, 'random_search')

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


def random_walk(sim, key: jax.Array, num_sims: int = 1024,
                num_steps: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Batched random walk (reference ``methods/random_walk.py:21-40``):
    each step flips one uniformly-random node per sim *unconditionally*
    (no acceptance test) and the best objective ever visited is tracked.
    The reference walks one solution in a Python loop, re-evaluating the
    full objective per step; here ``num_sims`` walks advance in one fused
    scan and only the running best per step needs an objective sweep."""
    _require_maximizer(sim, 'random_walk')
    k_init, k_run = jax.random.split(key)
    xs = sim.rand_xs(k_init, num_sims)

    def body(carry, key_t):
        xs, best_obj, best_x = carry
        nodes = jax.random.randint(key_t, (xs.shape[0],), 0, sim.num_nodes)
        xs = jnp.abs(xs - jax.nn.one_hot(nodes, sim.num_nodes))
        objs = sim.obj(xs)
        i = jnp.argmax(objs)
        better = objs[i] > best_obj
        best_obj = jnp.where(better, objs[i], best_obj)
        best_x = jnp.where(better, xs[i], best_x)
        return (xs, best_obj, best_x), None

    # score the starting configurations too ("best ever visited")
    objs0 = sim.obj(xs)
    i0 = jnp.argmax(objs0)
    init = (xs, objs0[i0], xs[i0])
    (xs, best_obj, best_x), _ = jax.lax.scan(
        body, init, jax.random.split(k_run, num_steps))
    return best_obj, best_x


def greedy_local_search(sim, key: jax.Array,
                        num_sims: int = 1024, num_iters: int = 64
                        ) -> Tuple[jax.Array, jax.Array]:
    """Random restarts + greedy flip local search to a local optimum."""
    _require_maximizer(sim, 'greedy_local_search')
    k1, k2 = jax.random.split(key)
    xs = sim.rand_xs(k1, num_sims)
    xs = sim.local_search_sweep(xs, k2, num_sweeps=num_iters)
    return sim.best(xs)


def simulated_annealing(sim, key: jax.Array,
                        num_sims: int = 1024, num_steps: int = 512,
                        t0: float = 2.0, t1: float = 1e-2
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batched Metropolis annealing: per step each sim proposes one random
    node flip and accepts with ``min(1, exp(gain / T))`` on a geometric
    temperature schedule (reference ``methods/simulated_annealing.py``
    behavior, vectorized)."""
    _require_maximizer(sim, 'simulated_annealing')
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
