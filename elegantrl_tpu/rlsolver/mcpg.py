"""MCPG — Monte Carlo Policy Gradient for MaxCut (TPU-native).

Capability match for the reference's ``rlsolver/methods/mcpg.py``: a per-node
Bernoulli policy (their ``Simpler`` net: ``(sigmoid(lin(1)) - 0.5)*0.6 + 0.5``,
mcpg.py:169-183) drives Metropolis chains (``metro_sampling``, :88-118),
samples get local search (:120-167), and the policy ascends
advantage-weighted log-likelihood of the best samples.

TPU-native redesign: all chains step in lockstep — each Metropolis transfer
picks one random node per chain and accepts with the policy odds ratio, the
local search is the simulator's fused gain-sweep, and the policy-gradient
update is one fused backward over (num_chains, num_nodes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from .maxcut import MaxCutSimulator


def _policy_probs(theta: jax.Array) -> jax.Array:
    """Per-node flip probability, squashed to [0.2, 0.8] like the reference's
    ``Simpler.forward`` (mcpg.py:178-183)."""
    return (jax.nn.sigmoid(theta) - 0.5) * 0.6 + 0.5


def metro_sampling(probs: jax.Array, xs: jax.Array, key: jax.Array,
                   num_transfers: int) -> jax.Array:
    """Metropolis-Hastings toward the product-Bernoulli distribution
    ``probs`` (reference mcpg.py:88-118): per transfer, each chain proposes
    flipping one random node and accepts with the odds ratio."""
    num_chains, num_nodes = xs.shape

    def body(xs, key_t):
        k_node, k_acc = jax.random.split(key_t)
        nodes = jax.random.randint(k_node, (num_chains,), 0, num_nodes)
        p = probs[nodes]
        cur = jnp.take_along_axis(xs, nodes[:, None], -1)[:, 0]
        # prob of current value: p if x==1 else 1-p ; accept rate = (1-q)/q
        q = jnp.where(cur > 0.5, p, 1.0 - p)
        accept = jax.random.uniform(k_acc, (num_chains,)) < (1.0 - q) / q
        flip = jax.nn.one_hot(nodes, num_nodes) * accept[:, None]
        return jnp.abs(xs - flip), None

    xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_transfers))
    return xs


def mcpg_solve(sim: MaxCutSimulator, key: jax.Array,
               num_chains: int = 512, num_epochs: int = 30,
               num_transfers: int = 32, num_ls: int = 8,
               lr: float = 8e-2) -> Tuple[float, jax.Array, dict]:
    """Returns (best_obj, best_solution, info)."""
    num_nodes = sim.num_nodes
    theta = jnp.zeros(num_nodes)
    opt = optax.adam(lr)
    opt_state = opt.init(theta)

    k_init, key = jax.random.split(key)
    xs = sim.rand_xs(k_init, num_chains)
    best_obj = jnp.asarray(-jnp.inf)
    best_x = jnp.zeros(num_nodes)

    @jax.jit
    def epoch(theta, opt_state, xs, best_obj, best_x, key):
        k_metro, k_ls, key = jax.random.split(key, 3)
        probs = _policy_probs(theta)
        xs = metro_sampling(probs, xs, k_metro, num_transfers)
        xs_ls = sim.local_search_sweep(xs, k_ls, num_sweeps=num_ls)
        objs = sim.obj(xs_ls)

        i = jnp.argmax(objs)
        better = objs[i] > best_obj
        best_obj = jnp.where(better, objs[i], best_obj)
        best_x = jnp.where(better, xs_ls[i], best_x)

        # policy gradient: ascend advantage-weighted log-likelihood of the
        # locally-searched samples (reference's value-weighted update)
        adv = objs - jnp.mean(objs)
        adv = adv / (jnp.std(adv) + 1e-6)

        def loss_fn(th_):
            p = _policy_probs(th_)
            logp = (xs_ls * jnp.log(p + 1e-9)
                    + (1 - xs_ls) * jnp.log(1 - p + 1e-9)).sum(-1)
            return -jnp.mean(adv * logp)

        grads = jax.grad(loss_fn)(theta)
        updates, opt_state = opt.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, xs_ls, best_obj, best_x, key

    for _ in range(num_epochs):
        theta, opt_state, xs, best_obj, best_x, key = epoch(
            theta, opt_state, xs, best_obj, best_x, key)

    return float(best_obj), best_x, {'theta': theta}
