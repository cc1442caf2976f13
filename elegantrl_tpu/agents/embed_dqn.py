"""Embed-DQN family: Q(s, a) via learned action embeddings (TPU-native).

Behavioral parity targets (reference ``elegantrl/agents/AgentEmbedDQN.py``):

- an ``nn.Embedding(action_dim, embedding_dim)`` with
  ``embedding_dim = max(8, sqrt(action_dim))`` and orthogonal init gain 0.5
  (:112-114) — here a plain (action_dim, embedding_dim) matrix;
- ``get_all_q_values`` tiles every discrete action against the state batch
  and evaluates the ensemble Q in one batched matmul (:139-150);
- AgentEmbedDQN: shared-trunk ``QEmbedTwin`` with 8 ensemble outputs (:153);
  AgentEnsembleDQN: linear (s,a)-encoder + 4 per-head decoders (:160-178);
- TD target ``r + undone * gamma * max_a mean_heads Q_tgt(s', a)`` (:53-54);
  TD error averaged over heads (:56-58).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nets import ensemble_init, mlp_apply, mlp_init, soft_update
from .base import AgentDef, grad_step, make_optimizer
from .off_policy import cum_fit_term, epsilon_greedy, make_offpolicy_update


class EmbedDQNState(NamedTuple):
    q: dict
    q_target: dict
    opt: tuple


def make_embed_dqn(net_dims, state_dim: int, action_dim: int, args,
                   buffer=None, ensemble: bool = False) -> AgentDef:
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    tau = float(getattr(args, 'soft_update_tau', 5e-3))
    explore_rate = float(getattr(args, 'explore_rate', 0.25))
    batch_size = int(getattr(args, 'batch_size', 64))
    repeat_times = float(getattr(args, 'repeat_times', 1.0))
    if_use_per = bool(getattr(args, 'if_use_per', False))
    lambda_fit_cum_r = float(getattr(args, 'lambda_fit_cum_r', 0.0))
    num_ensembles = int(getattr(args, 'num_ensembles', 4 if ensemble else 8))
    embedding_dim = max(8, int(action_dim ** 0.5))
    net_dims = tuple(net_dims)

    optimizer = make_optimizer(lr, clip_grad)

    def init(key):
        k_emb, k1, k2 = jax.random.split(key, 3)
        emb = jax.nn.initializers.orthogonal(scale=0.5)(
            k_emb, (action_dim, embedding_dim), jnp.float32)
        if ensemble:
            q = {'emb': emb,
                 'enc': mlp_init(k1, (state_dim + embedding_dim, net_dims[0])),
                 'heads': ensemble_init(
                     k2, num_ensembles,
                     lambda k: mlp_init(k, (*net_dims, 1), out_std=0.5))}
        else:
            q = {'emb': emb,
                 'mlp': mlp_init(k1, (state_dim + embedding_dim, *net_dims,
                                      num_ensembles), out_std=0.5)}
        return EmbedDQNState(q=q, q_target=jax.tree.map(jnp.copy, q),
                             opt=optimizer.init(q))

    def q_heads(q, state, action_emb):
        sa = jnp.concatenate([state, action_emb], axis=-1)
        if ensemble:
            enc = mlp_apply(q['enc'], sa)
            heads = jax.vmap(lambda hp: mlp_apply(hp, enc)[..., 0])(q['heads'])
            return jnp.moveaxis(heads, 0, -1)      # (..., E)
        return mlp_apply(q['mlp'], sa)             # (..., E)

    def all_q_values(q, state):
        """(batch, action_dim, E): tile all actions (reference :139-150)."""
        batch = state.shape[0]
        emb = jnp.broadcast_to(q['emb'][None], (batch, action_dim, embedding_dim))
        s = jnp.broadcast_to(state[:, None, :], (batch, action_dim, state.shape[-1]))
        return q_heads(q, s, emb)

    def mean_q(q, state):
        return jnp.mean(all_q_values(q, state), axis=-1)  # (batch, action_dim)

    def explore_action(s: EmbedDQNState, obs, key):
        greedy = jnp.argmax(mean_q(s.q, obs), axis=-1)
        return epsilon_greedy(key, greedy, action_dim, explore_rate), None

    def greedy_action(s: EmbedDQNState, obs):
        return jnp.argmax(mean_q(s.q, obs), axis=-1).astype(jnp.int32)

    def objectives(s: EmbedDQNState, buf_state, key, update_t):
        if if_use_per:
            (state, action, reward, undone, unmask, next_state, is_weight,
             is_ids) = buffer.sample_for_per(buf_state, key, batch_size)
        else:
            # row-stratified when the batch tiles the env axis (see
            # replay_buffer.py:sample_rows — gathers are the measured
            # off-policy bottleneck, SOL_BREAKDOWN.json r5)
            row_ok = (getattr(args, 'replay_row_sample', 'auto')
                      not in (False, 'false', '0')
                      and batch_size % buffer.num_seqs == 0
                      and batch_size >= buffer.num_seqs)
            (state, action, reward, undone, unmask, next_state,
             is_ids) = (buffer.sample_rows if row_ok
                        else buffer.sample)(buf_state, key, batch_size)
            is_weight = None

        next_q = jnp.max(mean_q(s.q_target, next_state), axis=-1)
        q_label = reward + undone * gamma * next_q

        def loss_fn(qp):
            a_emb = qp['emb'][action]               # (B, emb)
            qs = q_heads(qp, state, a_emb)          # (B, E)
            td = jnp.mean(jnp.square(qs - q_label[:, None]), axis=-1) * unmask
            obj = jnp.mean(td * is_weight) if if_use_per else jnp.mean(td)
            if lambda_fit_cum_r != 0.0:
                obj = obj + cum_fit_term(buf_state, is_ids, qs, lambda_fit_cum_r)
            return obj, (qs, td)

        (obj_critic, (qs, td)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s.q)
        q, opt = grad_step(optimizer, s.q, s.opt, grads)
        q_target = soft_update(s.q_target, q, tau)
        if if_use_per:
            buf_state = buffer.td_error_update_for_per(buf_state, is_ids, td)

        return (EmbedDQNState(q, q_target, opt), buf_state,
                (obj_critic, jnp.mean(qs), jnp.ones(())))

    update = make_offpolicy_update(batch_size, repeat_times, objectives)

    def cum_returns(s: EmbedDQNState, rollout, last_obs):
        # reference AgentEmbedDQN.get_cumulative_rewards (:73-83)
        from ..ops.gae import cumulative_returns as _cr
        next_v = jnp.max(mean_q(s.q_target, last_obs), axis=-1)
        return _cr(rollout.rewards, rollout.undones, next_v, gamma)

    return AgentDef(name='AgentEnsembleDQN' if ensemble else 'AgentEmbedDQN',
                    if_off_policy=True, if_discrete=True,
                    init=init, explore_action=explore_action,
                    greedy_action=greedy_action, env_action=lambda a: a,
                    update=update, cum_returns=cum_returns,
                    explore_view=lambda s: s.q,
                    explore_merge=lambda f, v: f._replace(q=v))


class AgentEmbedDQN:
    make = staticmethod(partial(make_embed_dqn, ensemble=False))


class AgentEnsembleDQN:
    make = staticmethod(partial(make_embed_dqn, ensemble=True))
