"""Batched genetic algorithm for binary combinatorial problems (TPU-native).

Capability match for the reference's ``rlsolver/methods/genetic_algorithm.py``
(249 LoC: tabu-search-seeded population, pairwise crossover, mutation,
sequential Python loops over individuals).  TPU-native redesign: the whole
population is one ``(pop_size, num_nodes)`` 0/1 matrix; selection, uniform
crossover, mutation and the (memetic) local-search step are fused batched
ops inside one ``lax.scan`` over generations — no per-individual Python.

Works with any simulator exposing ``rand_xs(key, n) / obj(xs) / num_nodes``
(MaxCut, MIS, knapsack, number partitioning); if the simulator also has
``local_search_sweep`` (or ``local_search``) the children are locally
improved each generation, the batched analog of the reference seeding every
individual with tabu search (genetic_algorithm.py:38-41).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def genetic_algorithm(sim, key: jax.Array, pop_size: int = 256,
                      num_generations: int = 64, elite_frac: float = 0.125,
                      mutate_p: float = 0.02, tournament_k: int = 2,
                      local_search_sweeps: int = 2
                      ) -> Tuple[jax.Array, jax.Array]:
    """Returns (best_obj, best_x).  Maximizes ``sim.obj``."""
    from .methods import _require_maximizer
    _require_maximizer(sim, 'genetic_algorithm')
    n = sim.num_nodes
    n_elite = max(1, int(pop_size * elite_frac))
    ls = None
    if local_search_sweeps > 0:
        if hasattr(sim, 'local_search_sweep'):
            ls = lambda xs, k: sim.local_search_sweep(  # noqa: E731
                xs, k, num_sweeps=local_search_sweeps)
        elif hasattr(sim, 'local_search'):
            ls = lambda xs, k: sim.local_search(        # noqa: E731
                xs, k, num_sweeps=local_search_sweeps)

    k_init, k_ls0, k_run = jax.random.split(key, 3)
    pop = sim.rand_xs(k_init, pop_size)
    if ls is not None:
        pop = ls(pop, k_ls0)

    def tournament(objs, key_t):
        """One parent index per child: best of ``tournament_k`` random
        candidates (batched tournament selection)."""
        cand = jax.random.randint(key_t, (pop_size, tournament_k), 0, pop_size)
        cand_objs = objs[cand]                              # (P, k)
        return cand[jnp.arange(pop_size), jnp.argmax(cand_objs, axis=-1)]

    def generation(carry, key_t):
        pop, objs = carry
        k_pa, k_pb, k_cx, k_mut, k_ls = jax.random.split(key_t, 5)

        pa = tournament(objs, k_pa)
        pb = tournament(objs, k_pb)
        mask = jax.random.bernoulli(k_cx, 0.5, (pop_size, n))
        children = jnp.where(mask, pop[pa], pop[pb])        # uniform crossover
        flip = jax.random.bernoulli(k_mut, mutate_p, (pop_size, n))
        children = jnp.abs(children - flip.astype(children.dtype))
        if ls is not None:
            children = ls(children, k_ls)

        child_objs = sim.obj(children)
        # elitism: the worst n_elite children are replaced by the best
        # n_elite parents, so the best solution never regresses
        elite_idx = jnp.argsort(-objs)[:n_elite]
        worst_idx = jnp.argsort(child_objs)[:n_elite]
        children = children.at[worst_idx].set(pop[elite_idx])
        child_objs = child_objs.at[worst_idx].set(objs[elite_idx])
        return (children, child_objs), jnp.max(child_objs)

    objs0 = sim.obj(pop)
    (pop, objs), _ = jax.lax.scan(
        generation, (pop, objs0), jax.random.split(k_run, num_generations))
    i = jnp.argmax(objs)
    return objs[i], pop[i]
