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
    # row-stratified replay sampling — see replay_buffer.py:sample_rows and
    # agents/ddpg_td3.py for the measured rationale (per-sample gathers are
    # the off-policy device-time bottleneck, SOL_BREAKDOWN.json r5)
    row_mode = getattr(args, 'replay_row_sample', 'auto')
    row_sample = (row_mode not in (False, 'false', '0')
                  and not if_use_per and buffer is not None
                  and batch_size % buffer.num_seqs == 0
                  and batch_size >= buffer.num_seqs)
    if row_mode is True and not row_sample:
        raise ValueError(
            'replay_row_sample=True needs uniform sampling (no PER) and '
            'batch_size a positive multiple of num_envs '
            f'(got batch_size={batch_size}, '
            f'num_envs={getattr(buffer, "num_seqs", None)})')
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
            sample_fn = buffer.sample_rows if row_sample else buffer.sample
            (state, action, reward, undone, unmask, next_state,
             is_ids) = sample_fn(buf_state, key, batch_size)
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

    # Fused whole-chunk Pallas update (ops/pallas_update.py:
    # make_dqn_fused_chunk): 16 sequential minibatch updates per kernel op,
    # params + target + Adam moments VMEM-resident, minibatches pre-gathered
    # with the scan path's exact ids.  The dynamic off-policy trip count
    # rides an outer fori_loop over chunks.  args.use_pallas_update:
    # 'auto' (default) | True | False | 'interpret' (CPU tests).
    pallas_update_mode = getattr(args, 'use_pallas_update', 'auto')
    _FUSED_CHUNK = 16

    def _fused_update():
        mode = pallas_update_mode
        if mode in (False, 'false', '0') or buffer is None:
            return None
        interpret = (mode == 'interpret')
        f32_storage = getattr(buffer, 'storage_dtype', jnp.float32) in (
            jnp.float32, 'float32')
        eligible = (not if_use_per and lambda_fit_cum_r == 0.0
                    and len(net_dims) == 2
                    and batch_size % 128 == 0 and batch_size <= 2048
                    # measured VMEM ceiling: (128,128)x1024 compiles,
                    # larger D*B blows the 16M scoped-vmem stack
                    and max(net_dims) * batch_size <= 131072
                    and f32_storage
                    # mesh DP shards the buffer; the un-shard_mapped
                    # kernel cannot ride XLA's auto-partitioner
                    and not getattr(args, 'mesh_axes', None))
        if not eligible:
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True (DQN family) requires uniform '
                    'sampling (no PER), lambda_fit_cum_r=0, a 2-hidden-'
                    'layer net, f32 storage, and batch_size a multiple of '
                    f'128 and <= 2048 (got batch_size={batch_size}, '
                    f'net_dims={net_dims}, if_use_per={if_use_per})')
            return None
        if not interpret and jax.devices()[0].platform != 'tpu':
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True: Mosaic kernels need a real TPU '
                    f'(current backend: {jax.devices()[0].platform}); use '
                    "use_pallas_update='interpret' for CPU testing")
            return None
        from ..ops.pallas_update import (_adam_parts, _from_kernel,
                                         _to_kernel, _with_adam_parts,
                                         dqn_flatten, dqn_unflatten,
                                         make_dqn_fused_chunk)
        C = _FUSED_CHUNK
        chunk_fn = make_dqn_fused_chunk(
            state_dim, action_dim, batch_size, C, gamma=gamma, tau=tau,
            lr=lr, clip_grad=clip_grad, twin=twin, duel=duel,
            interpret=interpret)
        N = buffer.num_seqs

        def update(s: DQNState, buf_state, key):
            size = buf_state.size
            update_times = jnp.maximum(
                (size.astype(jnp.float32) * repeat_times
                 / batch_size).astype(jnp.int32), 1)
            n_chunks = (update_times + C - 1) // C
            count0, mu_tree, nu_tree = _adam_parts(s.opt)
            leaves = dqn_flatten(s.q, twin, duel)
            shapes = [x.shape for x in leaves]
            p = tuple(_to_kernel(x) for x in leaves)
            t = tuple(_to_kernel(x)
                      for x in dqn_flatten(s.q_target, twin, duel))
            mu = tuple(_to_kernel(x) for x in dqn_flatten(mu_tree, twin, duel))
            nu = tuple(_to_kernel(x) for x in dqn_flatten(nu_tree, twin, duel))
            states2d = buf_state.states.reshape(-1, state_dim)
            acts1d = buf_state.actions.reshape(-1)
            rew1d = buf_state.rewards.reshape(-1)
            ud1d = buf_state.undones.reshape(-1)
            um1d = buf_state.unmasks.reshape(-1)
            sample_len = jnp.maximum(size - 1, 1)

            def chunk_body(ci, carry):
                p, t, mu, nu, sums = carry
                idx = ci * C + jnp.arange(C)
                # the scan path's exact keys: fold_in per update index;
                # the draw matches the active sampler (sample_rows /
                # sample, replay_buffer.py) so fused == scan minibatches
                keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
                if row_sample:   # contiguous row slabs (sample_rows keys)
                    R = batch_size // N
                    rows = jax.vmap(lambda k: jax.random.randint(
                        k, (R,), 0, sample_len))(keys).reshape(-1)
                    takes = lambda arr, r_: jnp.take(
                        arr, r_, axis=0).reshape(
                            (C, batch_size) + arr.shape[2:])
                    sb = takes(buf_state.states, rows)        # (C, B, S)
                    nsb = takes(buf_state.states, rows + 1)
                    acts = takes(buf_state.actions, rows)     # (C, B)
                    rb = takes(buf_state.rewards, rows)[:, None, :]
                    ud = takes(buf_state.undones, rows)[:, None, :]
                    um = takes(buf_state.unmasks, rows)[:, None, :]
                else:
                    ids = jax.vmap(lambda k: jax.random.randint(
                        k, (batch_size,), 0, sample_len * N))(keys)
                    ids0 = ids % sample_len
                    ids1 = ids // sample_len
                    flat = ids0 * N + ids1                    # (C, B)
                    sb = jnp.take(states2d, flat, axis=0)     # (C, B, S)
                    nsb = jnp.take(states2d, flat + N, axis=0)  # +1 seam
                    acts = jnp.take(acts1d, flat)
                    rb = jnp.take(rew1d, flat)[:, None, :]
                    ud = jnp.take(ud1d, flat)[:, None, :]
                    um = jnp.take(um1d, flat)[:, None, :]
                oh = jax.nn.one_hot(acts, action_dim,
                                    axis=1, dtype=jnp.float32)  # (C, A, B)
                steps = (count0.astype(jnp.float32)
                         + idx.astype(jnp.float32) + 1.0)
                valid = (idx < update_times).astype(jnp.float32)
                bcv = jnp.stack([1.0 - jnp.power(0.9, steps),
                                 1.0 - jnp.power(0.999, steps),
                                 valid], axis=1)              # (C, 3)
                p, t, mu, nu, objs = chunk_fn(
                    p, t, mu, nu, sb.transpose(0, 2, 1),
                    nsb.transpose(0, 2, 1), oh, rb, ud, um, bcv)
                sums = sums + jnp.stack([jnp.sum(objs[:, 0] * valid),
                                         jnp.sum(objs[:, 1] * valid)])
                return p, t, mu, nu, sums

            p, t, mu, nu, sums = jax.lax.fori_loop(
                0, n_chunks, chunk_body, (p, t, mu, nu, jnp.zeros(2)))
            back = lambda xs: dqn_unflatten(
                [_from_kernel(x, sh) for x, sh in zip(xs, shapes)],
                twin, duel)
            opt = _with_adam_parts(s.opt, count0 + update_times,
                                   back(mu), back(nu))
            nf = update_times.astype(jnp.float32)
            metrics = {'obj_critic': sums[0] / nf,
                       'obj_actor': sums[1] / nf}
            return DQNState(back(p), back(t), opt), buf_state, metrics

        return update

    update = _fused_update() or make_offpolicy_update(
        batch_size, repeat_times, objectives)

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
