"""iSCO-style sampler: locally-balanced MCMC with temperature annealing.

Capability match for the reference's iSCO method
(``rlsolver/methods/iSCO/main_maxcut.py:19-46``): gradient-informed
path-auxiliary MCMC over binary solutions with Poisson-distributed path
lengths and a linear temperature anneal, batched over thousands of chains.

TPU-native form: per outer step each chain makes ``k`` gradient-informed
single-flip moves (k fixed to the Poisson mean — static shapes for XLA; the
reference samples k ~ Poisson per chain), where the flip proposal is the
locally-balanced weight ``softmax(gain / (2T))`` over all nodes and the move
is accepted by Metropolis on the true objective delta.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def isco_solve(sim, key: jax.Array, num_sims: int = 1024,
               num_steps: int = 256, path_length: int = 4,
               t0: float = 1.5, t1: float = 0.05) -> Tuple[jax.Array, jax.Array]:
    """``sim`` is any simulator exposing rand_xs/obj/flip_gains (MaxCut-style,
    gains = objective delta per single flip).  Returns (best_obj, best_x)."""
    k_init, k_run = jax.random.split(key)
    xs = sim.rand_xs(k_init, num_sims)
    temps = t0 + (t1 - t0) * (jnp.arange(num_steps) / max(num_steps - 1, 1))

    def inner_move(xs, temp, key_t):
        k_sel, k_acc = jax.random.split(key_t)
        gains = sim.flip_gains(xs)                      # (S, N)
        logits = gains / (2.0 * temp)
        nodes = jax.random.categorical(k_sel, logits, axis=-1)  # (S,)
        g = jnp.take_along_axis(gains, nodes[:, None], -1)[:, 0]
        # locally-balanced proposal is near-reversible; MH correction on gain
        accept = jax.random.uniform(k_acc, g.shape) < jnp.exp(
            jnp.minimum(g / temp, 0.0))
        accept = accept | (g > 0)
        flip = jax.nn.one_hot(nodes, xs.shape[-1]) * accept[:, None]
        return jnp.abs(xs - flip)

    def body(carry, xt):
        xs, best_obj, best_x = carry
        temp, key_t = xt
        keys = jax.random.split(key_t, path_length)
        for k in keys:  # fixed path length (Poisson mean), unrolled
            xs = inner_move(xs, temp, k)
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


def isco_mis_solve(sim, key: jax.Array, num_sims: int = 1024,
                   num_steps: int = 256, **kw) -> Tuple[jax.Array, jax.Array]:
    """iSCO on MIS (reference ``rlsolver/methods/iSCO/main_mis.py``,
    ``rlsolver/envs/env_isco_mis.py``): the generic binary sampler over the
    penalized-MIS flip gains, followed by a repair sweep so the returned set
    is strictly independent.  Returns (set_size, x)."""
    k_isco, k_rep = jax.random.split(key)
    _, best_x = isco_solve(sim, k_isco, num_sims=num_sims,
                           num_steps=num_steps, **kw)
    xs = sim.local_search(best_x[None], k_rep, num_sweeps=8)
    return jnp.sum(xs[0]), xs[0]


def isco_tsp_solve(sim, key: jax.Array, num_sims: int = 256,
                   num_steps: int = 512, t0: float = 0.5, t1: float = 0.01
                   ) -> Tuple[jax.Array, jax.Array]:
    """Permutation-space iSCO for TSP (reference
    ``rlsolver/methods/iSCO/main_tsp.py:20-45``,
    ``rlsolver/envs/env_isco_tsp.py:19-120``): locally-balanced 2-opt
    proposals — the move distribution over ALL (i, j) segment reversals is
    softmax(-delta_length / (2T)), sampled per chain, MH-accepted on the true
    delta — annealed from ``t0`` to ``t1``.

    TPU-native redesign: the reference walks K-nearest candidate lists with
    gather-heavy per-node bookkeeping and a path-auxiliary correction over
    Poisson-length move bundles; here the full n^2 delta table is computed as
    four batched gathers from the distance matrix (static shapes, one
    categorical over n^2 logits) and moves are single 2-opt steps with the
    same simple near-reversibility MH rule the binary sampler uses (the
    documented deviation shared by this module).  Returns (best_len, tour)."""
    n = sim.num_cities
    k_init, k_run = jax.random.split(key)
    tours = sim.rand_tours(k_init, num_sims)
    temps = t0 + (t1 - t0) * (jnp.arange(num_steps) / max(num_steps - 1, 1))
    pos = jnp.arange(n)
    # valid 2-opt pairs: 0 <= i < j < n, skipping the full-reversal i=0,j=n-1
    valid = (pos[:, None] < pos[None, :])
    valid = valid & ~((pos[:, None] == 0) & (pos[None, :] == n - 1))

    def deltas(tours):
        """delta(i, j) of reversing tour[i..j] (endpoints included):
        d(a,c) + d(b,d) - d(a,b) - d(c,d) with a=t[i-1], b=t[i], c=t[j],
        d=t[j+1] (cyclic)."""
        prv = jnp.roll(tours, 1, axis=-1)               # t[i-1] at slot i
        nxt = jnp.roll(tours, -1, axis=-1)              # t[j+1] at slot j
        d = sim.dist
        dac = d[prv[:, :, None], tours[:, None, :]]     # (S, i, j)
        dbd = d[tours[:, :, None], nxt[:, None, :]]
        dab = d[prv, tours][:, :, None]                 # (S, i, 1)
        dcd = d[tours, nxt][:, None, :]                 # (S, 1, j)
        return dac + dbd - dab - dcd

    def reverse_segment(tours, i, j):
        """Reverse positions i..j per chain (dynamic i<j, static shapes)."""
        p = pos[None, :]
        inside = (p >= i[:, None]) & (p <= j[:, None])
        mirrored = i[:, None] + j[:, None] - p
        src = jnp.where(inside, mirrored, p)
        return jnp.take_along_axis(tours, src, axis=-1)

    def body(carry, xt):
        tours, best_len, best_tour = carry
        temp, key_t = xt
        k_sel, k_acc = jax.random.split(key_t)
        dl = deltas(tours)                              # (S, n, n)
        logits = jnp.where(valid, -dl / (2.0 * temp), -jnp.inf)
        flat = jax.random.categorical(k_sel, logits.reshape(num_sims, -1),
                                      axis=-1)
        i, j = flat // n, flat % n
        g = jnp.take_along_axis(
            dl.reshape(num_sims, -1), flat[:, None], -1)[:, 0]
        accept = (g < 0) | (jax.random.uniform(k_acc, g.shape)
                            < jnp.exp(jnp.minimum(-g / temp, 20.0)))
        new_tours = reverse_segment(tours, i, j)
        tours = jnp.where(accept[:, None], new_tours, tours)
        lens = sim.tour_length(tours)
        b = jnp.argmin(lens)
        better = lens[b] < best_len
        best_len = jnp.where(better, lens[b], best_len)
        best_tour = jnp.where(better, tours[b], best_tour)
        return (tours, best_len, best_tour), None

    init = (tours, jnp.asarray(jnp.inf), tours[0])
    (tours, best_len, best_tour), _ = jax.lax.scan(
        body, init, (temps, jax.random.split(k_run, num_steps)))
    return best_len, best_tour
