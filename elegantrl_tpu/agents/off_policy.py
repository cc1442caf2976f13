"""Shared off-policy update loop.

The reference's ``AgentBase.update_net`` runs
``update_times = cur_size * repeat_times / batch_size`` sequential minibatch
updates per round (AgentBase.py:172-189).  ``cur_size`` grows during
training, so the trip count is *dynamic*: here it is a traced
``lax.fori_loop`` bound — no recompilation as the buffer fills, and the whole
loop stays on device.

Each agent supplies ``objectives_fn(agent_state, buf_state, key, update_t)
-> (agent_state, buf_state, (obj_critic, obj_actor, actor_updated))`` — one
critic+actor step (reference ``update_objectives``).  ``actor_updated`` is
1.0/0.0 so delayed/gated actor updates average like the reference's
``np.nanmean`` over non-NaN entries.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


_CHUNK = 16  # SGD steps per while-loop iteration (see note below)


def make_offpolicy_update(batch_size: int, repeat_times: float,
                          objectives_fn: Callable) -> Callable:
    def update(agent_state, buf_state, key):
        update_times = jnp.maximum(
            (buf_state.size.astype(jnp.float32) * repeat_times
             / batch_size).astype(jnp.int32), 1)

        # Two-level loop: an outer dynamic-bound fori over chunks of _CHUNK
        # statically-scanned SGD steps, each guarded by ``i < update_times``.
        # Bitwise-identical to a flat fori (same per-index rng, same count)
        # but with 16x fewer while-loop trips — dynamic while iterations are
        # far more expensive than scan iterations on some runtimes.
        def inner(carry, i):
            def do(carry):
                agent_state, buf_state, sums = carry
                k = jax.random.fold_in(key, i)
                agent_state, buf_state, (obj_c, obj_a, a_upd) = objectives_fn(
                    agent_state, buf_state, k, i)
                sums = sums + jnp.stack([obj_c, obj_a * a_upd, a_upd])
                return agent_state, buf_state, sums

            carry = jax.lax.cond(i < update_times, do, lambda c: c, carry)
            return carry, None

        def chunk_body(ci, carry):
            idx = ci * _CHUNK + jnp.arange(_CHUNK)
            carry, _ = jax.lax.scan(inner, carry, idx)
            return carry

        n_chunks = (update_times + _CHUNK - 1) // _CHUNK
        agent_state, buf_state, sums = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (agent_state, buf_state, jnp.zeros(3)))
        n = update_times.astype(jnp.float32)
        metrics = {'obj_critic': sums[0] / n,
                   'obj_actor': sums[1] / jnp.maximum(sums[2], 1.0)}
        return agent_state, buf_state, metrics

    return update


def cum_fit_term(buf_state, ids, q_values: jax.Array, lam: float) -> jax.Array:
    """Extra critic loss fitting the batch-mean cumulative return
    (reference ``lambda_fit_cum_r`` branch, e.g. AgentSAC.py:66-68):
    ``criterion(cum_reward_mean, q_values.mean(dim=0)).mean() * lam``.
    ``q_values``: (batch,) or (batch, num_ensembles)."""
    ids0, ids1 = ids
    cum_mean = jnp.mean(buf_state.cum_rewards[ids0, ids1])
    return lam * jnp.mean(jnp.square(jnp.mean(q_values, axis=0) - cum_mean))


def epsilon_greedy(key: jax.Array, q_action: jax.Array, action_dim: int,
                   explore_rate: float) -> jax.Array:
    """Per-env epsilon-greedy (reference flips one coin for the whole batch,
    QNetBase.get_action AgentDQN.py:182-187; per-env is the same marginal
    exploration rate with lower variance)."""
    k1, k2 = jax.random.split(key)
    rand_actions = jax.random.randint(k1, q_action.shape, 0, action_dim)
    explore = jax.random.uniform(k2, q_action.shape) < explore_rate
    return jnp.where(explore, rand_actions, q_action).astype(jnp.int32)
