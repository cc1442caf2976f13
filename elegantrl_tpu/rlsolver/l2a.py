"""L2A — learn-to-anneal for MaxCut (TPU-native).

Capability match for the reference's ``rlsolver/methods/L2A`` (graph
transformer ``GraphTRS`` + policy nets steering an annealed sampler,
network.py:9-190): a graph-conditioned policy proposes per-node flip
probabilities that TEMPER a Metropolis sampler, and the policy is trained by
advantage-weighted likelihood on the sampler's locally-searched outcomes —
i.e. MCPG's training signal with L2A's instance-conditioned network, so one
trained policy transfers across instances of a graph distribution.

TPU-native form: the policy is an MPNN over the dense adjacency (same
batched-matmul pattern as :mod:`.s2v_dqn`); sampling, local search and the
policy gradient fuse into one jitted program per epoch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .maxcut import MaxCutSimulator


class L2AParams(NamedTuple):
    w_in: jax.Array    # (2[+E], D): [spin, normalized gain, pretrained] lift
    w_msg: jax.Array   # (D, D)
    w_self: jax.Array  # (D, D)
    w_out: jax.Array   # (D, 1)


def make_l2a(sim: MaxCutSimulator, embed_dim: int = 32, msg_rounds: int = 2,
             lr: float = 3e-3, node_embed=None):
    """``node_embed`` (N, E), optional: frozen per-node embeddings from a
    pretrained :mod:`.graph_trs` — the reference's PolicyTRS-consumes-
    GraphTRS-memory pattern (L2A/network.py:110-190); the policy then
    conditions on learned graph structure, not just the live spin/gain."""
    adj = sim.adj
    deg = jnp.sum(adj, axis=-1) + 1e-6
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    ortho = jax.nn.initializers.orthogonal()
    if node_embed is not None:
        node_embed = jax.lax.stop_gradient(jnp.asarray(node_embed))
    in_dim = 2 + (0 if node_embed is None else node_embed.shape[-1])

    def init(key) -> Tuple[L2AParams, tuple]:
        ks = jax.random.split(key, 4)
        params = L2AParams(
            w_in=ortho(ks[0], (in_dim, embed_dim)),
            w_msg=ortho(ks[1], (embed_dim, embed_dim)) * 0.5,
            w_self=ortho(ks[2], (embed_dim, embed_dim)) * 0.5,
            w_out=ortho(ks[3], (embed_dim, 1)) * 0.1)
        return params, optimizer.init(params)

    def flip_probs(params: L2AParams, xs):
        """(S, N) per-node flip probabilities in [0.2, 0.8] (the reference's
        Simpler squash, mcpg.py:178-183) conditioned on graph + solution."""
        feats = jnp.stack([2.0 * xs - 1.0, sim.flip_gains(xs) / deg], -1)
        if node_embed is not None:
            feats = jnp.concatenate(
                [feats, jnp.broadcast_to(node_embed,
                                         xs.shape + node_embed.shape[-1:])],
                axis=-1)
        h = jax.nn.relu(feats @ params.w_in)
        for _ in range(msg_rounds):
            msg = jnp.einsum('ij,sjd->sid', adj, h) / deg[None, :, None]
            h = jax.nn.relu(h @ params.w_self + msg @ params.w_msg)
        p = jax.nn.sigmoid((h @ params.w_out)[..., 0])
        return (p - 0.5) * 0.6 + 0.5

    def tempered_sample(params, xs, key, num_transfers: int):
        """Metropolis moves proposed from the policy's flip probabilities."""
        num_chains, n = xs.shape

        def body(xs, key_t):
            k_node, k_acc = jax.random.split(key_t)
            probs = flip_probs(params, xs)
            nodes = jax.random.categorical(
                k_node, jnp.log(probs + 1e-9), axis=-1)
            gains = jnp.take_along_axis(sim.flip_gains(xs), nodes[:, None], -1)[:, 0]
            accept = (gains > 0) | (jax.random.uniform(k_acc, (num_chains,))
                                    < jnp.exp(jnp.minimum(gains, 0.0)))
            flip = jax.nn.one_hot(nodes, n) * accept[:, None]
            return jnp.abs(xs - flip), None

        xs, _ = jax.lax.scan(body, xs, jax.random.split(key, num_transfers))
        return xs

    @partial(jax.jit, static_argnums=(3, 4, 5))
    def epoch(params, opt_state, key, num_chains: int, num_transfers: int,
              num_ls: int):
        k_init, k_samp, k_ls = jax.random.split(key, 3)
        xs = sim.rand_xs(k_init, num_chains)
        xs = tempered_sample(params, xs, k_samp, num_transfers)
        xs_ls = sim.local_search_sweep(xs, k_ls, num_sweeps=num_ls)
        objs = sim.obj(xs_ls)
        adv = (objs - jnp.mean(objs)) / (jnp.std(objs) + 1e-6)

        def loss_fn(p):
            probs = flip_probs(p, xs_ls)
            logp = (xs_ls * jnp.log(probs + 1e-9)
                    + (1 - xs_ls) * jnp.log(1 - probs + 1e-9)).sum(-1)
            return -jnp.mean(adv * logp)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        i = jnp.argmax(objs)
        return params, opt_state, objs[i], xs_ls[i]

    return init, epoch


def l2a_solve(sim: MaxCutSimulator, key: jax.Array, num_chains: int = 512,
              num_epochs: int = 30, num_transfers: int = 32, num_ls: int = 8,
              node_embed=None) -> Tuple[float, jax.Array]:
    init, epoch = make_l2a(sim, node_embed=node_embed)
    k_init, key = jax.random.split(key)
    params, opt_state = init(k_init)
    best_obj, best_x = -jnp.inf, jnp.zeros(sim.num_nodes)
    for _ in range(num_epochs):
        key, sub = jax.random.split(key)
        params, opt_state, obj, x = epoch(params, opt_state, sub,
                                          num_chains, num_transfers, num_ls)
        if float(obj) > float(best_obj):
            best_obj, best_x = obj, x
    return float(best_obj), best_x
