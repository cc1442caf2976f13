"""Physics-inspired GNN solver for QUBO problems (PI-GNN, TPU-native).

Capability match for the reference's ``rlsolver/envs/Env_PI-GNN.py`` slot
(the reference ships only a duplicated simulator file under that name, no
method code).  Method follows Schuetz, Brubaker & Katzgraber,
"Combinatorial optimization with physics-inspired graph neural networks"
(Nature Machine Intelligence 4, 2022): relax binary assignments to node
probabilities ``p = GNN(embeddings, A_hat)``, minimize the differentiable
QUBO energy ``p^T Q p`` by gradient descent on a *single instance*, then
project ``x_i = [p_i > 0.5]``.

TPU-native design
-----------------
* ``num_replicas`` independent replicas (different embedding inits) train
  simultaneously through one vmapped parameter axis — ensemble parallelism
  instead of the paper's sequential restarts.
* GCN propagation is dense ``(N, N) @ (N, d)`` MXU matmuls (same layout as
  :class:`~elegantrl_tpu.rlsolver.maxcut.MaxCutSimulator`).
* The whole optimization is one ``lax.scan``; the best *projected* solution
  is tracked on-device every step, so only the final winner crosses the
  host boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def normalized_adjacency(adj: jax.Array) -> jax.Array:
    """Symmetric GCN propagation matrix ``D^-1/2 (A + I) D^-1/2``."""
    a = jnp.asarray(adj, jnp.float32)
    a = a + jnp.eye(a.shape[0], dtype=a.dtype)
    d = jnp.sum(a, axis=-1)
    inv_sqrt = jnp.where(d > 0, jax.lax.rsqrt(d), 0.0)
    return a * inv_sqrt[:, None] * inv_sqrt[None, :]


def maxcut_qubo(adj: jax.Array) -> jax.Array:
    """QUBO matrix with ``x^T Q x == -cut(x)`` for binary ``x``
    (diagonal absorbs the linear term via ``x_i^2 == x_i``)."""
    a = jnp.asarray(adj, jnp.float32)
    return a - jnp.diag(jnp.sum(a, axis=-1))


def mis_qubo(adj: jax.Array, penalty: float = 2.0) -> jax.Array:
    """QUBO with ``x^T Q x == -(|set| - penalty * conflicts)``."""
    a = jnp.asarray(adj, jnp.float32)
    return (penalty / 2.0) * a - jnp.eye(a.shape[0], dtype=a.dtype)


def _init_params(key: jax.Array, num_nodes: int, embed_dim: int,
                 hidden_dim: int) -> dict:
    k_e, k_w0, k_w1 = jax.random.split(key, 3)
    s0 = 1.0 / np.sqrt(embed_dim)
    s1 = 1.0 / np.sqrt(hidden_dim)
    return {
        'embed': jax.random.normal(k_e, (num_nodes, embed_dim)) * s0,
        'w0': jax.random.uniform(k_w0, (embed_dim, hidden_dim), minval=-s0,
                                 maxval=s0),
        'b0': jnp.zeros((hidden_dim,)),
        'w1': jax.random.uniform(k_w1, (hidden_dim, 1), minval=-s1,
                                 maxval=s1),
        'b1': jnp.zeros((1,)),
    }


def _forward(params: dict, a_hat: jax.Array) -> jax.Array:
    """Two-layer GCN over trainable node embeddings -> per-node prob (N,)."""
    h = jax.nn.relu(a_hat @ (params['embed'] @ params['w0']) + params['b0'])
    logits = a_hat @ (h @ params['w1']) + params['b1']
    return jax.nn.sigmoid(logits[:, 0])


def pignn_minimize(q: jax.Array, adj: jax.Array, key: jax.Array,
                   num_replicas: int = 16, embed_dim: int = None,
                   hidden_dim: int = None, num_steps: int = 500,
                   lr: float = 1e-2) -> Tuple[jax.Array, jax.Array]:
    """Minimize ``x^T Q x`` over binary ``x`` with a replicated PI-GNN.

    Returns ``(best_q_value, best_x)`` — the lowest projected QUBO energy
    seen at *any* step by *any* replica, and its 0/1 assignment.
    """
    q = jnp.asarray(q, jnp.float32)
    n = q.shape[0]
    if embed_dim is None:
        embed_dim = max(8, int(np.sqrt(n)))
    if hidden_dim is None:
        hidden_dim = max(4, embed_dim // 2)
    a_hat = normalized_adjacency(adj)

    params = jax.vmap(
        lambda k: _init_params(k, n, embed_dim, hidden_dim)
    )(jax.random.split(key, num_replicas))
    opt = optax.adam(lr)
    opt_state = jax.vmap(opt.init)(params)

    def loss_fn(p):
        probs = _forward(p, a_hat)
        return probs @ (q @ probs)

    def projected_energy(p):
        x = (_forward(p, a_hat) > 0.5).astype(jnp.float32)
        return x @ (q @ x), x

    @jax.jit
    def run(params, opt_state):
        best0_e, best0_x = jax.vmap(projected_energy)(params)

        def step(carry, _):
            params, opt_state, best_e, best_x = carry
            grads = jax.vmap(jax.grad(loss_fn))(params)
            updates, opt_state = jax.vmap(opt.update)(grads, opt_state)
            params = jax.vmap(optax.apply_updates)(params, updates)
            e, x = jax.vmap(projected_energy)(params)
            better = e < best_e
            best_e = jnp.where(better, e, best_e)
            best_x = jnp.where(better[:, None], x, best_x)
            return (params, opt_state, best_e, best_x), None

        (_, _, best_e, best_x), _ = jax.lax.scan(
            step, (params, opt_state, best0_e, best0_x), None,
            length=num_steps)
        i = jnp.argmin(best_e)
        return best_e[i], best_x[i]

    return run(params, opt_state)


def _polish(sim, x: jax.Array, key: jax.Array, sweeps: int) -> jax.Array:
    """Local-search polish of the projected solution using the simulator's
    fused flip sweeps.  The pure relaxation is known to underperform on
    locally-structured graphs (Angelini & Ricci-Tersenghi, Nat. Mach.
    Intell. 5, 2023); a few batched sweeps close most of that gap."""
    if sweeps <= 0:
        return x
    xs = x[None, :]
    if hasattr(sim, 'local_search_sweep'):
        xs = sim.local_search_sweep(xs, key, num_sweeps=sweeps)
    elif hasattr(sim, 'local_search'):
        xs = sim.local_search(xs, key, num_sweeps=sweeps)
    return xs[0]


def pignn_maxcut(sim, key: jax.Array, polish_sweeps: int = 4, **kwargs
                 ) -> Tuple[jax.Array, jax.Array]:
    """PI-GNN on a :class:`MaxCutSimulator`. Returns ``(best_cut, best_x)``.
    ``polish_sweeps=0`` gives the paper's pure projection."""
    q = maxcut_qubo(sim.adj)
    k_train, k_ls = jax.random.split(key)
    _, x = pignn_minimize(q, sim.adj, k_train, **kwargs)
    x = _polish(sim, x, k_ls, polish_sweeps)
    return sim.obj(x[None, :])[0], x


def pignn_mis(sim, key: jax.Array, polish_sweeps: int = 4, **kwargs
              ) -> Tuple[jax.Array, jax.Array]:
    """PI-GNN on a :class:`MISSimulator`. Returns ``(best_obj, best_x)``
    where ``best_obj`` is the simulator's penalized set size.
    ``polish_sweeps=0`` gives the paper's pure projection."""
    q = mis_qubo(sim.adj, penalty=float(sim.penalty))
    k_train, k_ls = jax.random.split(key)
    _, x = pignn_minimize(q, sim.adj, k_train, **kwargs)
    x = _polish(sim, x, k_ls, polish_sweeps)
    return sim.obj(x[None, :])[0], x
