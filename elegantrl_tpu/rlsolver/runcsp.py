"""RUN-CSP-style amortized MaxCut solver (TPU-native).

Capability match for the reference's ``rlsolver/envs/Env_RUN-CSP.py`` slot
(the reference ships only a duplicated simulator there, no method code).
Method follows Toenshoff et al., "Graph Neural Networks for Maximum
Constraint Satisfaction" (RUN-CSP): a recurrent GNN with SHARED weights is
unrolled T message-passing steps; each node keeps a hidden state, emits a
soft assignment after every step, and the training loss is the
time-discounted expected number of violated constraints (for MaxCut: the
probability an edge is UNcut), so the network learns a convergent
assignment dynamic.  Unlike ``pignn.py`` (per-instance gradient descent)
this is an AMORTIZED solver: trained once on a distribution of instances,
then applied to unseen graphs in a single forward unroll.

TPU-native design: instances are a padded (G, n, n) dense pool; message
passing is batched adjacency matmuls on the MXU; K random hidden-state
inits per graph run as one vmapped batch (the paper's parallel runs); the
whole train step (unroll + loss + grad) is one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class RunCSPParams(NamedTuple):
    w_msg: jax.Array    # (d, d) neighbor message
    w_upd: jax.Array    # (2d, d) GRU-style candidate
    w_gate: jax.Array   # (2d, d) update gate
    w_out: jax.Array    # (d, 1) soft assignment head
    b_out: jax.Array    # (1,)


def init_runcsp(key: jax.Array, dim: int = 32) -> RunCSPParams:
    ks = jax.random.split(key, 4)
    g = jax.nn.initializers.glorot_uniform()
    return RunCSPParams(
        w_msg=g(ks[0], (dim, dim)),
        w_upd=g(ks[1], (2 * dim, dim)),
        w_gate=g(ks[2], (2 * dim, dim)),
        w_out=g(ks[3], (dim, 1)) * 0.5,
        b_out=jnp.zeros(1))


def _unroll(params: RunCSPParams, adj: jax.Array, h0: jax.Array, steps: int):
    """adj (..., n, n), h0 (..., n, d) -> (soft assignments per step
    (steps, ..., n), final h)."""
    norm = jnp.maximum(jnp.sum(jnp.abs(adj) > 0, -1, keepdims=True),
                       1.0).astype(h0.dtype)

    def body(h, _):
        msg = (adj @ (h @ params.w_msg)) / norm
        hm = jnp.concatenate([h, msg], -1)
        gate = jax.nn.sigmoid(hm @ params.w_gate)
        cand = jnp.tanh(hm @ params.w_upd)
        h = (1.0 - gate) * h + gate * cand
        p = jax.nn.sigmoid((h @ params.w_out + params.b_out)[..., 0])
        return h, p

    h, ps = jax.lax.scan(body, h0, None, length=steps)
    return ps, h


def _uncut_prob(adj: jax.Array, p: jax.Array) -> jax.Array:
    """Expected UNcut edge weight: sum_ij w_ij [p_i p_j + (1-p_i)(1-p_j)]/2
    — the MaxCut-as-CSP violation probability, batched."""
    # explicit per-graph contraction: p is (..., G, n) with arbitrary leading
    # axes (e.g. unroll steps), adj is (G, n, n) — a plain matmul would
    # broadcast the step axis against the graph axis (crash, or worse,
    # silently pair step t with graph t when steps == G)
    pq = jnp.einsum('...gn,gnm->...gm', p, adj)
    tot = jnp.sum(adj, (-2, -1)) / 2.0
    cut_soft = jnp.sum(p * jnp.sum(adj, -1) + (1.0 - 2.0 * p) * pq,
                       -1) / 2.0      # sum w_ij (p_i(1-p_j)+p_j(1-p_i))/2*2
    return tot - cut_soft


def make_runcsp(adjs: np.ndarray, dim: int = 32, steps: int = 24,
                lr: float = 2e-3, discount: float = 0.9):
    """Train pool ``adjs`` (G, n, n).  Returns (init_fn, train_fn, solve_fn).

    train_fn(state, key, iters) runs ``iters`` SGD steps (each: fresh random
    hidden inits for every pool graph, unroll, discounted violation loss).
    """
    pool = jnp.asarray(adjs, jnp.float32)
    g, n, _ = pool.shape
    optimizer = optax.adam(lr)
    # discount weights: later steps matter more (paper's convergence shaping)
    wts = discount ** jnp.arange(steps - 1, -1, -1, dtype=jnp.float32)
    wts = wts / jnp.sum(wts)

    def init_fn(key):
        params = init_runcsp(key, dim)
        return params, optimizer.init(params)

    def loss_fn(params, h0):
        ps, _ = _unroll(params, pool, h0, steps)     # (steps, G, n)
        viol = _uncut_prob(pool, ps)                 # (steps, G)
        return jnp.mean(jnp.sum(wts[:, None] * viol, 0))

    @partial(jax.jit, static_argnums=2)
    def train_fn(state, key, iters: int):
        def step(carry, k):
            params, opt = carry
            h0 = jax.random.normal(k, (g, n, dim)) * 0.5
            loss, grads = jax.value_and_grad(loss_fn)(params, h0)
            upd, opt = optimizer.update(grads, opt, params)
            return (optax.apply_updates(params, upd), opt), loss
        (params, opt), losses = jax.lax.scan(
            step, state, jax.random.split(key, iters))
        return (params, opt), losses[-1]

    return init_fn, train_fn


def runcsp_solve(params: RunCSPParams, adj: np.ndarray, key=None,
                 num_runs: int = 64, steps: int = 48,
                 ) -> Tuple[float, np.ndarray]:
    """Amortized inference on an UNSEEN graph: ``num_runs`` random hidden
    inits, unroll, round every step's assignment, return the best cut."""
    if key is None:
        key = jax.random.PRNGKey(0)
    a = jnp.asarray(adj, jnp.float32)[None]          # (1, n, n)
    n = a.shape[-1]
    dim = params.w_msg.shape[0]
    h0 = jax.random.normal(key, (num_runs, n, dim)) * 0.5

    @jax.jit
    def run(h0):
        ps, _ = _unroll(params, a, h0, steps)        # (steps, K, n)
        x = (ps > 0.5).astype(jnp.float32)
        ax = x @ a[0]
        cuts = jnp.sum(ax * (1.0 - x), -1)           # (steps, K)
        i = jnp.argmax(cuts)
        return cuts.reshape(-1)[i], x.reshape(-1, n)[i]

    best, x = run(h0)
    return float(best), np.asarray(x)
