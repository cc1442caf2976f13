"""S2V-DQN / ECO-DQN: graph-RL MaxCut solver (TPU-native).

Capability match for the reference's ``rlsolver/methods/eco_s2v`` suite
(S2V-DQN "Learning Combinatorial Optimization Algorithms over Graphs" and
ECO-DQN "Exploratory Combinatorial Optimization with RL"): an MPNN embeds
each node, a Q-head scores per-node actions, and an epsilon-greedy agent
flips nodes to maximise the cut, trained with n-step Q-learning over
parallel spin-system episodes (reference ``src/envs/spinsystem*.py``,
``src/networks/mpnn.py:8-138``).

TPU-native redesign: the message-passing rounds are dense adjacency matmuls
(MXU) batched over thousands of parallel episodes; the per-node observation
follows ECO-DQN (spin, immediate flip gain, steps-since-flip proxy); reward
is the ECO-DQN "improvement over best-so-far" signal; the whole
explore+update round is one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .maxcut import MaxCutSimulator

_OBS_DIM = 3  # per-node features: spin, normalized flip gain, best-flag


class S2VParams(NamedTuple):
    w_in: jax.Array    # (OBS, D) node-feature lift
    w_msg: jax.Array   # (D, D) neighbor aggregation
    w_self: jax.Array  # (D, D)
    w_q1: jax.Array    # (2D, D) q head layer 1
    w_q2: jax.Array    # (D, 1)


class S2VState(NamedTuple):
    params: S2VParams
    target: S2VParams
    opt: tuple


def _init_params(key, dim: int) -> S2VParams:
    ks = jax.random.split(key, 5)
    ortho = jax.nn.initializers.orthogonal()
    return S2VParams(
        w_in=ortho(ks[0], (_OBS_DIM, dim)),
        w_msg=ortho(ks[1], (dim, dim)) * 0.5,
        w_self=ortho(ks[2], (dim, dim)) * 0.5,
        w_q1=ortho(ks[3], (2 * dim, dim)),
        w_q2=ortho(ks[4], (dim, 1)) * 0.1,
    )


def make_s2v_dqn(sim: MaxCutSimulator, embed_dim: int = 64,
                 msg_rounds: int = 3, gamma: float = 0.95,
                 lr: float = 1e-3):
    """Returns (init, q_values, train_round) pure fns over S2VState."""
    adj = sim.adj
    deg = jnp.sum(adj, axis=-1) + 1e-6
    optimizer = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))

    def node_obs(xs):
        """(S, N, OBS): spin, normalized flip gain, is-best-gain flag."""
        gains = sim.flip_gains(xs) / deg
        best = (gains >= jnp.max(gains, axis=-1, keepdims=True)).astype(jnp.float32)
        return jnp.stack([2.0 * xs - 1.0, gains, best], axis=-1)

    def q_values(params: S2VParams, xs):
        """(S, N) per-node Q: MPNN over the dense adjacency."""
        h = jax.nn.relu(node_obs(xs) @ params.w_in)          # (S, N, D)
        for _ in range(msg_rounds):
            msg = jnp.einsum('ij,sjd->sid', adj, h) / deg[None, :, None]
            h = jax.nn.relu(h @ params.w_self + msg @ params.w_msg)
        pooled = jnp.mean(h, axis=1, keepdims=True)          # (S, 1, D)
        cat = jnp.concatenate(
            [h, jnp.broadcast_to(pooled, h.shape)], axis=-1)  # (S, N, 2D)
        return (jax.nn.relu(cat @ params.w_q1) @ params.w_q2)[..., 0]

    def init(key) -> S2VState:
        params = _init_params(key, embed_dim)
        return S2VState(params, jax.tree.map(jnp.copy, params),
                        optimizer.init(params))

    def explore_step(state: S2VState, xs, best_obj, key, eps: float):
        """One ECO-DQN step across all sims: flip eps-greedy node; reward =
        positive improvement over the best cut seen this episode."""
        k_eps, k_rand = jax.random.split(key)
        q = q_values(state.params, xs)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_rand, greedy.shape, 0, sim.num_nodes)
        explore = jax.random.uniform(k_eps, greedy.shape) < eps
        action = jnp.where(explore, rand, greedy)

        flip = jax.nn.one_hot(action, sim.num_nodes)
        xs2 = jnp.abs(xs - flip)
        obj2 = sim.obj(xs2)
        reward = jnp.maximum(obj2 - best_obj, 0.0) / sim.num_nodes
        best_obj = jnp.maximum(best_obj, obj2)
        return xs2, best_obj, action, reward

    @partial(jax.jit, static_argnums=(3, 4))
    def train_round(state: S2VState, key, eps, num_sims: int = 64,
                    horizon: int = 32):
        """Collect a horizon of transitions from fresh random states and run
        one n-step TD sweep over them (time-major scan)."""
        k_init, k_roll, key = jax.random.split(key, 3)
        xs = sim.rand_xs(k_init, num_sims)
        best = sim.obj(xs)

        def roll(carry, kt):
            xs, best = carry
            xs2, best2, action, reward = explore_step(state, xs, best, kt, eps)
            return (xs2, best2), (xs, action, reward, xs2)

        (_, _), (XS, A, R, XS2) = jax.lax.scan(
            roll, (xs, best), jax.random.split(k_roll, horizon))

        next_q = jnp.max(
            jax.lax.map(lambda x: q_values(state.target, x), XS2), axis=-1)
        labels = R + gamma * next_q                        # (H, S)

        def loss_fn(params):
            def q_of(x):
                return q_values(params, x)
            qs = jax.lax.map(q_of, XS)                      # (H, S, N)
            q_taken = jnp.take_along_axis(qs, A[..., None], axis=-1)[..., 0]
            return jnp.mean(jnp.square(q_taken - labels))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt = optimizer.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        target = jax.tree.map(lambda t, o: 0.99 * t + 0.01 * o,
                              state.target, params)
        return S2VState(params, target, opt), loss

    @partial(jax.jit, static_argnums=(2, 3))
    def solve(state: S2VState, key, num_sims: int = 256, horizon: int = 64
              ) -> Tuple[jax.Array, jax.Array]:
        """Greedy rollout; returns (best_obj, best_x)."""
        xs = sim.rand_xs(key, num_sims)
        best = sim.obj(xs)
        best_xs = xs

        def roll(carry, _):
            xs, best, best_xs = carry
            q = q_values(state.params, xs)
            action = jnp.argmax(q, axis=-1)
            xs = jnp.abs(xs - jax.nn.one_hot(action, sim.num_nodes))
            obj = sim.obj(xs)
            better = obj > best
            best = jnp.where(better, obj, best)
            best_xs = jnp.where(better[:, None], xs, best_xs)
            return (xs, best, best_xs), None

        (xs, best, best_xs), _ = jax.lax.scan(
            roll, (xs, best, best_xs), None, length=horizon)
        i = jnp.argmax(best)
        return best[i], best_xs[i]

    return init, q_values, train_round, solve


def s2v_dqn_solve(sim: MaxCutSimulator, key: jax.Array,
                  num_epochs: int = 60, embed_dim: int = 64,
                  num_sims: int = 64, horizon: int = 32
                  ) -> Tuple[float, jax.Array]:
    """Train an S2V-DQN on the instance and return its best greedy solution."""
    init, _, train_round, solve = make_s2v_dqn(sim, embed_dim=embed_dim)
    k_init, key = jax.random.split(key)
    state = init(k_init)
    for epoch in range(num_epochs):
        key, sub = jax.random.split(key)
        eps = max(0.05, 1.0 - epoch / max(num_epochs * 0.7, 1))
        state, loss = train_round(state, sub, eps, num_sims, horizon)
    key, sub = jax.random.split(key)
    obj, x = solve(state, sub)
    return float(obj), x
