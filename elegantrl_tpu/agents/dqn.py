"""DQN family: DQN, DoubleDQN, DuelingDQN, D3QN (TPU-native).

Behavioral parity targets (reference ``elegantrl/agents/AgentDQN.py``):

- epsilon-greedy exploration with ``explore_rate`` (default 0.25);
- TD target ``r + undone * gamma * max_a Q_tgt(s')`` (AgentDQN.py:46-47);
- DoubleDQN: elementwise ``min`` of twin heads before the max (:107-108);
- Dueling: ``value - value.mean() + adv`` combine — used by the *greedy
  policy* path; the TD path of QNetDuel reads the value head directly,
  matching the reference's (quirky) ``get_q_value`` (:214-217) while
  QNetTwinDuel's TD path does combine (:258-263);
- shared act == cri aliasing: one Q-network, one optimizer, one target;
- soft target update every step with ``soft_update_tau``.

Q-networks are encoder + head MLPs evaluated as single fused matmuls.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nets import mlp_apply, mlp_init, soft_update
from .base import AgentDef, grad_step, make_optimizer
from .off_policy import cum_fit_term, epsilon_greedy, make_offpolicy_update


class DQNState(NamedTuple):
    q: dict        # params: {'enc': ..., 'val1': ..., 'adv1': ..., 'val2': ..., 'adv2': ...}
    q_target: dict
    opt: tuple


def make_dqn(net_dims, state_dim: int, action_dim: int, args,
             twin: bool = False, duel: bool = False,
             buffer=None) -> AgentDef:
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    tau = float(getattr(args, 'soft_update_tau', 5e-3))
    explore_rate = float(getattr(args, 'explore_rate', 0.25))
    batch_size = int(getattr(args, 'batch_size', 64))
    repeat_times = float(getattr(args, 'repeat_times', 1.0))
    if_use_per = bool(getattr(args, 'if_use_per', False))
    lambda_fit_cum_r = float(getattr(args, 'lambda_fit_cum_r', 0.0))
    gamma_ = gamma
    net_dims = tuple(net_dims)

    optimizer = make_optimizer(lr, clip_grad)

    def init(key):
        keys = jax.random.split(key, 5)
        if twin or duel:
            q = {'enc': mlp_init(keys[0], (state_dim, *net_dims))}
            q['val1'] = mlp_init(keys[1], (net_dims[-1], action_dim), out_std=0.1)
            if duel:
                q['adv1'] = mlp_init(keys[2], (net_dims[-1], 1), out_std=0.1)
            if twin:
                q['val2'] = mlp_init(keys[3], (net_dims[-1], action_dim), out_std=0.1)
                if duel:
                    q['adv2'] = mlp_init(keys[4], (net_dims[-1], 1), out_std=0.1)
        else:
            q = {'mlp': mlp_init(keys[0], (state_dim, *net_dims, action_dim),
                                 out_std=0.1)}
        return DQNState(q=q, q_target=jax.tree.map(jnp.copy, q),
                        opt=optimizer.init(q))

    def _enc(q, state):
        return mlp_apply(q['enc'], state)

    def _duel_combine(val, adv):
        return val - jnp.mean(val, axis=-1, keepdims=True) + adv

    def q_greedy_values(q, state):
        """Q used by the greedy policy (dueling combine where defined)."""
        if not (twin or duel):
            return mlp_apply(q['mlp'], state)
        s = _enc(q, state)
        val = mlp_apply(q['val1'], s)
        if duel:
            return _duel_combine(val, mlp_apply(q['adv1'], s))
        return val

    def q_td_value(q, state):
        """Q used on the TD path for single-estimate nets (reference
        QNetDuel.get_q_value returns the value head only, AgentDQN.py:214-217)."""
        if not (twin or duel):
            return mlp_apply(q['mlp'], state)
        s = _enc(q, state)
        if twin and duel:  # QNetTwinDuel.get_q_value combines (:258-263)
            return _duel_combine(mlp_apply(q['val1'], s), mlp_apply(q['adv1'], s))
        return mlp_apply(q['val1'], s)

    def q1_q2(q, state):
        s = _enc(q, state)
        v1 = mlp_apply(q['val1'], s)
        v2 = mlp_apply(q['val2'], s)
        if duel:
            v1 = _duel_combine(v1, mlp_apply(q['adv1'], s))
            v2 = _duel_combine(v2, mlp_apply(q['adv2'], s))
        return v1, v2

    def explore_action(s: DQNState, obs, key):
        greedy = jnp.argmax(q_greedy_values(s.q, obs), axis=-1)
        return epsilon_greedy(key, greedy, action_dim, explore_rate), None

    def greedy_action(s: DQNState, obs):
        return jnp.argmax(q_greedy_values(s.q, obs), axis=-1).astype(jnp.int32)

    def objectives(s: DQNState, buf_state, key, update_t):
        if if_use_per:
            (state, action, reward, undone, unmask, next_state, is_weight,
             is_ids) = buffer.sample_for_per(buf_state, key, batch_size)
        else:
            (state, action, reward, undone, unmask, next_state,
             is_ids) = buffer.sample(buf_state, key, batch_size)
            is_weight = None

        if twin:
            nq1, nq2 = q1_q2(s.q_target, next_state)
            next_q = jnp.max(jnp.minimum(nq1, nq2), axis=-1)
        else:
            next_q = jnp.max(q_td_value(s.q_target, next_state), axis=-1)
        q_label = reward + undone * gamma * next_q

        def loss_fn(qp):
            if twin:
                qs1, qs2 = q1_q2(qp, state)
                q1 = jnp.take_along_axis(qs1, action[:, None], axis=-1)[:, 0]
                q2 = jnp.take_along_axis(qs2, action[:, None], axis=-1)[:, 0]
                td = (jnp.square(q1 - q_label) + jnp.square(q2 - q_label)) * unmask
                q_first = q1
            else:
                qs = q_td_value(qp, state)
                q1 = jnp.take_along_axis(qs, action[:, None], axis=-1)[:, 0]
                td = jnp.square(q1 - q_label) * unmask
                q_first = q1
            obj = jnp.mean(td * is_weight) if if_use_per else jnp.mean(td)
            if lambda_fit_cum_r != 0.0:
                obj = obj + cum_fit_term(buf_state, is_ids, q_first,
                                         lambda_fit_cum_r)
            return obj, (q_first, td)

        (obj_critic, (q_first, td)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s.q)
        q, opt = grad_step(optimizer, s.q, s.opt, grads)
        q_target = soft_update(s.q_target, q, tau)
        if if_use_per:
            buf_state = buffer.td_error_update_for_per(buf_state, is_ids, td)

        obj_actor = jnp.mean(q_first)
        return (DQNState(q, q_target, opt), buf_state,
                (obj_critic, obj_actor, jnp.ones(())))

    update = make_offpolicy_update(batch_size, repeat_times, objectives)

    def cum_returns(s: DQNState, rollout, last_obs):
        # bootstrap with max_a Q_target(last_obs) (the reference's DQN variant
        # bootstraps with the ARGMAX INDEX, AgentDQN.py:72 — an evident bug;
        # we use the max Q-value, matching AgentEmbedDQN.py:80)
        from ..ops.gae import cumulative_returns as _cr
        next_v = jnp.max(q_td_value(s.q_target, last_obs), axis=-1)
        return _cr(rollout.rewards, rollout.undones, next_v, gamma_)

    name = ('AgentD3QN' if (twin and duel) else 'AgentDoubleDQN' if twin
            else 'AgentDuelingDQN' if duel else 'AgentDQN')
    return AgentDef(name=name, if_off_policy=True, if_discrete=True,
                    init=init, explore_action=explore_action,
                    greedy_action=greedy_action,
                    env_action=lambda a: a, update=update,
                    cum_returns=cum_returns,
                    explore_view=lambda s: s.q,
                    explore_merge=lambda f, v: f._replace(q=v))


class AgentDQN:
    make = staticmethod(partial(make_dqn, twin=False, duel=False))


class AgentDoubleDQN:
    make = staticmethod(partial(make_dqn, twin=True, duel=False))


class AgentDuelingDQN:
    make = staticmethod(partial(make_dqn, twin=False, duel=True))


class AgentD3QN:
    make = staticmethod(partial(make_dqn, twin=True, duel=True))
