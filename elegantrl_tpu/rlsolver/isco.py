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
