"""DDPG and TD3 (TPU-native).

Behavioral parity targets (reference ``elegantrl/agents/AgentTD3.py``):

- deterministic tanh actor with Gaussian exploration noise, clipped to
  [-1, 1] (Actor.get_action, AgentTD3.py:132-136);
- critic(s, a) = MLP over concat; ``CriticTwin`` = shared trunk with
  ``num_ensembles`` output heads (:146-150); the scalar critic value is the
  head mean (CriticBase.forward, AgentBase.py:332-335);
- TD3: target action smoothed with ``policy_noise_std`` (sampled from the
  *online* actor, as the reference does at AgentTD3.py:44), ``min`` over the
  head ensemble for the TD target (:45), delayed actor update every
  ``update_freq`` steps (:63-67);
- DDPG: the generic ``AgentBase.update_objectives`` path (AgentBase.py:191-224)
  with its exact quirks — ``q_value * unmask`` inside the TD error and the
  actor update gated on ``cur_size >= buffer_init_size``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nets import mlp_apply, mlp_init, soft_update
from .base import AgentDef, grad_step, make_optimizer
from .off_policy import cum_fit_term, make_offpolicy_update


class DDPGState(NamedTuple):
    act: list
    act_target: list
    cri: list
    cri_target: list
    act_opt: tuple
    cri_opt: tuple


class DDPGHtermState(NamedTuple):
    act: list
    act_target: list
    cri: list
    cri_target: list
    act_opt: tuple
    cri_opt: tuple
    h_buf: Any


def _make(net_dims, state_dim: int, action_dim: int, args, buffer,
          td3: bool, hterm: bool = False) -> AgentDef:
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    tau = float(getattr(args, 'soft_update_tau', 5e-3))
    batch_size = int(getattr(args, 'batch_size', 64))
    repeat_times = float(getattr(args, 'repeat_times', 1.0))
    if_use_per = bool(getattr(args, 'if_use_per', False))
    # Row-stratified replay sampling (replay_buffer.py:sample_rows): the
    # TPU default — per-sample iid gathers are the measured off-policy
    # bottleneck (SOL_BREAKDOWN.json r5).  'auto' enables it whenever the
    # batch tiles the env axis; PER keeps its per-seq stratified draw.
    row_mode = getattr(args, 'replay_row_sample', 'auto')
    row_sample = (row_mode not in (False, 'false', '0')
                  and not if_use_per and buffer is not None
                  and int(getattr(args, 'batch_size', 64))
                  % buffer.num_seqs == 0
                  and int(getattr(args, 'batch_size', 64))
                  >= buffer.num_seqs)
    if row_mode is True and not row_sample:
        raise ValueError(
            'replay_row_sample=True needs uniform sampling (no PER) and '
            'batch_size a positive multiple of num_envs '
            f'(got batch_size={getattr(args, "batch_size", 64)}, '
            f'num_envs={getattr(buffer, "num_seqs", None)})')
    lambda_fit_cum_r = float(getattr(args, 'lambda_fit_cum_r', 0.0))
    buffer_init_size = int(getattr(args, 'buffer_init_size', batch_size * 8))
    explore_noise_std = float(getattr(args, 'explore_noise_std',
                                      getattr(args, 'explore_noise', 0.05)))
    # TD3 extras (reference defaults AgentTD3.py:22-24)
    update_freq = int(getattr(args, 'update_freq', 2))
    num_ensembles = int(getattr(args, 'num_ensembles', 8)) if td3 else 1
    policy_noise_std = float(getattr(args, 'policy_noise_std', 0.10))
    # H-term hypers: same surface as AgentPPOHterm (plan_PPO_H.py:53-57);
    # the deterministic-policy form is an action-regression rehearsal term
    # (see agents/hterm.py — docs/source/tutorial/hterm.rst names DDPG/TD3
    # among the implemented variants, all absent from the snapshot)
    h_term_lambda = float(getattr(args, 'h_term_lambda', 2 ** -3))
    h_term_drop_rate = float(getattr(args, 'h_term_drop_rate', 2 ** -2))
    h_term_k_step = int(getattr(args, 'h_term_k_step', 16))
    h_term_buffer_size = int(getattr(args, 'h_term_buffer_size', 2 ** 12))
    net_dims = tuple(net_dims)

    optimizer = make_optimizer(lr, clip_grad)

    def init(key):
        k1, k2 = jax.random.split(key)
        act = mlp_init(k1, (state_dim, *net_dims, action_dim), out_std=0.1)
        cri = mlp_init(k2, (state_dim + action_dim, *net_dims, num_ensembles),
                       out_std=0.5)
        base = dict(act=act, act_target=jax.tree.map(jnp.copy, act),
                    cri=cri, cri_target=jax.tree.map(jnp.copy, cri),
                    act_opt=optimizer.init(act), cri_opt=optimizer.init(cri))
        if not hterm:
            return DDPGState(**base)
        from .hterm import init_hterm_buffer
        return DDPGHtermState(**base, h_buf=init_hterm_buffer(
            h_term_buffer_size, h_term_k_step, state_dim, action_dim))

    def actor(params, obs):
        return jnp.tanh(mlp_apply(params, obs))

    def actor_noisy(params, obs, key, std):
        a = actor(params, obs) + std * jax.random.normal(key, obs.shape[:-1] + (action_dim,))
        return jnp.clip(a, -1.0, 1.0)

    def q_values(params, obs, action):
        return mlp_apply(params, jnp.concatenate([obs, action], axis=-1))

    def q_mean(params, obs, action):
        return jnp.mean(q_values(params, obs, action), axis=-1)

    def explore_action(s: DDPGState, obs, key):
        return actor_noisy(s.act, obs, key, explore_noise_std), None

    def greedy_action(s: DDPGState, obs):
        return actor(s.act, obs)

    def objectives(s: DDPGState, buf_state, key, update_t):
        # split for the H-term only when it consumes randomness, so plain
        # DDPG/TD3's RNG stream (and verified learning rows) is unchanged
        k_h = None
        if hterm:
            key, k_h = jax.random.split(key)
        k_sample, k_noise = jax.random.split(key)
        if if_use_per:
            (state, action, reward, undone, unmask, next_state, is_weight,
             is_ids) = buffer.sample_for_per(buf_state, k_sample, batch_size)
        else:
            sample_fn = buffer.sample_rows if row_sample else buffer.sample
            (state, action, reward, undone, unmask, next_state,
             is_ids) = sample_fn(buf_state, k_sample, batch_size)
            is_weight = None

        if td3:
            next_action = actor_noisy(s.act, next_state, k_noise, policy_noise_std)
            next_q = jnp.min(q_values(s.cri_target, next_state, next_action), axis=-1)
        else:
            next_action = actor(s.act, next_state)
            next_q = q_mean(s.cri_target, next_state, next_action)
        q_label = reward + undone * gamma * next_q

        def cri_loss_fn(cp):
            qs = q_values(cp, state, action)
            if td3:
                td = jnp.mean(jnp.square(qs - q_label[:, None]), axis=-1) * unmask
            else:
                # reference AgentBase.py:206-207: q_value *= unmask, then
                # criterion(q_value, q_label) * unmask
                q = jnp.mean(qs, axis=-1) * unmask
                td = jnp.square(q - q_label) * unmask
            obj = jnp.mean(td * is_weight) if if_use_per else jnp.mean(td)
            if lambda_fit_cum_r != 0.0:
                obj = obj + cum_fit_term(buf_state, is_ids, qs, lambda_fit_cum_r)
            return obj, td

        (obj_critic, td), g_cri = jax.value_and_grad(cri_loss_fn, has_aux=True)(s.cri)
        cri, cri_opt = grad_step(optimizer, s.cri, s.cri_opt, g_cri)
        cri_target = soft_update(s.cri_target, cri, tau)
        if if_use_per:
            buf_state = buffer.td_error_update_for_per(buf_state, is_ids, td)

        if td3:
            do_actor = (update_t % update_freq) == 0
        else:
            do_actor = buf_state.size >= buffer_init_size

        if hterm:  # bounds are loop-invariant: keep them out of the grad trace
            from .hterm import return_bounds
            h_bounds = return_bounds(s.h_buf)

        def actor_step(operands):
            act, act_opt, act_target = operands

            def act_loss_fn(ap):
                loss = -jnp.mean(q_mean(cri, state, actor(ap, state)))
                if hterm:
                    # deterministic-policy H-term: return-weighted regression
                    # of the actor onto rehearsed high-return windows (the
                    # likelihood bonus degenerates to -MSE for a Dirac policy)
                    from .hterm import rehearsal_sample
                    h_batch = max(1, int(batch_size * h_term_drop_rate))
                    hs, ha, hm, w, valid = rehearsal_sample(s.h_buf, k_h,
                                                            h_batch,
                                                            *h_bounds)
                    mse = jnp.mean(jnp.square(actor(ap, hs) - ha), axis=-1)
                    mse_mean = jnp.sum(mse * hm, 1) / jnp.maximum(
                        jnp.sum(hm, 1), 1.0)
                    h_obj = jnp.sum(mse_mean * w * valid) / jnp.maximum(
                        jnp.sum(valid), 1.0)
                    loss = loss + h_term_lambda * h_obj
                return loss

            obj_neg, g_act = jax.value_and_grad(act_loss_fn)(act)
            act, act_opt = grad_step(optimizer, act, act_opt, g_act)
            act_target = soft_update(act_target, act, tau)
            return act, act_opt, act_target, -obj_neg, jnp.ones(())

        def actor_skip(operands):
            act, act_opt, act_target = operands
            return act, act_opt, act_target, jnp.zeros(()), jnp.zeros(())

        act, act_opt, act_target, obj_actor, a_upd = jax.lax.cond(
            do_actor, actor_step, actor_skip, (s.act, s.act_opt, s.act_target))

        new = s._replace(act=act, act_target=act_target, cri=cri,
                         cri_target=cri_target, act_opt=act_opt,
                         cri_opt=cri_opt)
        return new, buf_state, (obj_critic, obj_actor, a_upd)

    # Fused whole-chunk Pallas update (ops/pallas_update.py:
    # make_ddpg_fused_chunk): 16 sequential TD3/DDPG minibatch updates per
    # kernel op — params/targets/moments VMEM-resident, minibatches and the
    # TD3 smoothing noise pre-drawn with the scan path's exact keys; the
    # dynamic trip count rides an outer fori_loop over chunks (same shape
    # as agents/dqn.py:_fused_update).
    pallas_update_mode = getattr(args, 'use_pallas_update', 'auto')
    _FUSED_CHUNK = 16

    def _fused_update():
        mode = pallas_update_mode
        if mode in (False, 'false', '0') or buffer is None:
            return None
        interpret = (mode == 'interpret')
        f32_storage = getattr(buffer, 'storage_dtype', jnp.float32) in (
            jnp.float32, 'float32')
        eligible = (not hterm
                    and lambda_fit_cum_r == 0.0
                    and len(net_dims) == 2
                    and batch_size % 128 == 0 and batch_size <= 2048
                    # measured VMEM ceiling: (128,128)x1024 compiles
                    and max(net_dims) * batch_size <= 131072
                    and f32_storage
                    # PER pre-sampling is per-seq stratified
                    # (replay_buffer.py:sample_for_per asserts this)
                    and (not if_use_per or batch_size % buffer.num_seqs == 0)
                    # mesh DP shards the buffer; the un-shard_mapped
                    # kernel cannot ride XLA's auto-partitioner
                    and not getattr(args, 'mesh_axes', None))
        if not eligible:
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True (DDPG/TD3) requires the non-H-'
                    'term agent, lambda_fit_cum_r=0, a 2-hidden-layer net, '
                    'f32 storage, batch_size a multiple of 128 and <= 2048 '
                    '(and of num_envs under PER) (got '
                    f'batch_size={batch_size}, net_dims={net_dims})')
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
                                         make_ddpg_fused_chunk, mlp_flatten,
                                         mlp_unflatten)
        C = _FUSED_CHUNK
        chunk_fn = make_ddpg_fused_chunk(
            state_dim, action_dim, batch_size, C, gamma=gamma, tau=tau,
            lr=lr, clip_grad=clip_grad, td3=td3,
            num_ensembles=num_ensembles, per=if_use_per,
            interpret=interpret)
        N = buffer.num_seqs

        def update(s: DDPGState, buf_state, key):
            size = buf_state.size
            update_times = jnp.maximum(
                (size.astype(jnp.float32) * repeat_times
                 / batch_size).astype(jnp.int32), 1)
            n_chunks = (update_times + C - 1) // C
            ca0, mu_a, nu_a = _adam_parts(s.act_opt)
            cc0, mu_c, nu_c = _adam_parts(s.cri_opt)
            a_shapes = [x.shape for x in mlp_flatten(s.act)]
            c_shapes = [x.shape for x in mlp_flatten(s.cri)]
            K = lambda t_: tuple(_to_kernel(x) for x in mlp_flatten(t_))
            pa, pc = K(s.act), K(s.cri)
            ta, tc = K(s.act_target), K(s.cri_target)
            mua, muc = K(mu_a), K(mu_c)
            nua, nuc = K(nu_a), K(nu_c)
            states2d = buf_state.states.reshape(-1, state_dim)
            acts2d = buf_state.actions.reshape(-1, action_dim)
            rew1d = buf_state.rewards.reshape(-1)
            ud1d = buf_state.undones.reshape(-1)
            um1d = buf_state.unmasks.reshape(-1)
            sample_len = jnp.maximum(size - 1, 1)
            # DDPG gates the actor on buffer warmup (uniform over the round)
            ddpg_do = (size >= buffer_init_size).astype(jnp.float32)

            def chunk_body(ci, carry):
                pa, pc, ta, tc, mua, muc, nua, nuc, tree, sums = carry
                idx = ci * C + jnp.arange(C)
                # the scan path's exact RNG: fold_in per update index, then
                # split -> (sample key, TD3 smoothing-noise key)
                kk = jax.vmap(lambda i: jax.random.split(
                    jax.random.fold_in(key, i)))(idx)      # (C, 2, key)
                valid = (idx < update_times).astype(jnp.float32)
                if if_use_per:
                    # PER pre-sample: all C minibatches drawn against the
                    # tree state at chunk START (the scan path re-samples
                    # after every priority write; the <= C-1-update lag is
                    # the documented fused-path approximation —
                    # ops/pallas_update.py:make_ddpg_fused_chunk)
                    sub = batch_size // N
                    ids0ns, prios = jax.vmap(
                        lambda k: buffer.tree.sample(tree, k, sub)
                    )(kk[:, 0])                             # (C, N, sub)
                    ids0ns = jnp.minimum(ids0ns, size - 2)
                    min_prio = buffer.tree.min_leaf(tree, size)   # (N,)
                    w = jnp.power(
                        prios / jnp.maximum(min_prio, 1e-8)[None, :, None],
                        -buffer.per_beta)                   # (C, N, sub)
                    ids1ns = jnp.broadcast_to(
                        jnp.arange(N)[None, :, None], ids0ns.shape)
                    ids0 = ids0ns.reshape(C, -1)            # seq-major (C, B)
                    ids1 = ids1ns.reshape(C, -1)
                    iw = w.reshape(C, 1, batch_size)
                elif row_sample:
                    # contiguous row slabs instead of a scattered gather
                    # (replay_buffer.py:sample_rows — same keys, same rows
                    # as the scan path by construction)
                    R = batch_size // N
                    rows = jax.vmap(lambda k: jax.random.randint(
                        k, (R,), 0, sample_len))(kk[:, 0])   # (C, R)
                    iw = None
                else:
                    ids = jax.vmap(lambda k: jax.random.randint(
                        k, (batch_size,), 0, sample_len * N))(kk[:, 0])
                    ids0 = ids % sample_len
                    ids1 = ids // sample_len
                    iw = None
                if row_sample:
                    flat_rows = rows.reshape(-1)
                    takes = lambda arr, r_: jnp.take(
                        arr, r_, axis=0).reshape(
                            (C, batch_size) + arr.shape[2:])
                    sb = takes(buf_state.states, flat_rows)   # (C, B, S)
                    nsb = takes(buf_state.states, flat_rows + 1)
                    ab = takes(buf_state.actions, flat_rows)  # (C, B, A)
                    rb = takes(buf_state.rewards, flat_rows)[:, None, :]
                    ud = takes(buf_state.undones, flat_rows)[:, None, :]
                    um = takes(buf_state.unmasks, flat_rows)[:, None, :]
                else:
                    flat = ids0 * N + ids1
                    sb = jnp.take(states2d, flat, axis=0)    # (C, B, S)
                    nsb = jnp.take(states2d, flat + N, axis=0)
                    ab = jnp.take(acts2d, flat, axis=0)      # (C, B, A)
                    rb = jnp.take(rew1d, flat)[:, None, :]
                    ud = jnp.take(ud1d, flat)[:, None, :]
                    um = jnp.take(um1d, flat)[:, None, :]
                if td3:   # actor_noisy's exact draw: std * normal((B, A))
                    nz = policy_noise_std * jax.vmap(
                        lambda k: jax.random.normal(
                            k, (batch_size, action_dim)))(kk[:, 1])
                    nz = nz.transpose(0, 2, 1)              # (C, A, B)
                else:
                    nz = jnp.zeros((C, action_dim, batch_size), jnp.float32)
                if td3:   # delayed actor every update_freq-th step
                    do_act = (idx % update_freq == 0).astype(jnp.float32)
                    # actor Adam count at execution: prior actor steps + 1
                    n_before = (idx + update_freq - 1) // update_freq
                    act_step = (ca0.astype(jnp.float32)
                                + n_before.astype(jnp.float32) + 1.0)
                else:
                    do_act = jnp.full((C,), ddpg_do)
                    act_step = (ca0.astype(jnp.float32)
                                + idx.astype(jnp.float32) + 1.0)
                cri_step = (cc0.astype(jnp.float32)
                            + idx.astype(jnp.float32) + 1.0)
                bcv = jnp.stack([1.0 - jnp.power(0.9, cri_step),
                                 1.0 - jnp.power(0.999, cri_step),
                                 1.0 - jnp.power(0.9, act_step),
                                 1.0 - jnp.power(0.999, act_step),
                                 valid, do_act,
                                 jnp.zeros((C,), jnp.float32)], axis=1)
                outs = chunk_fn(
                    pa, pc, ta, tc, mua, muc, nua, nuc,
                    sb.transpose(0, 2, 1), nsb.transpose(0, 2, 1),
                    ab.transpose(0, 2, 1), rb, ud, um, nz, bcv,
                    **({'iw': iw} if if_use_per else {}))
                (pa, pc, ta, tc, mua, muc, nua, nuc, objs) = outs[:9]
                if if_use_per:
                    # post-chunk priority fold: the scan path's per-update
                    # td_error_update_for_per, applied sequentially (order
                    # matters for duplicate ids) on the kernel's per-sample
                    # TD errors (replay_buffer.py:153-160)
                    td_out = outs[9]                        # (C, 1, B)

                    def prio_body(u, tr):
                        prob = jnp.power(
                            jnp.clip(td_out[u, 0], 1e-8, 10.0),
                            buffer.per_alpha)
                        return jax.lax.cond(
                            valid[u] > 0,
                            lambda t: buffer.tree.update_scattered(
                                t, ids0[u], ids1[u], prob),
                            lambda t: t, tr)

                    tree = jax.lax.fori_loop(0, C, prio_body, tree)
                a_upd = valid * do_act
                sums = sums + jnp.stack([jnp.sum(objs[:, 0] * valid),
                                         jnp.sum(objs[:, 1] * a_upd),
                                         jnp.sum(a_upd)])
                return pa, pc, ta, tc, mua, muc, nua, nuc, tree, sums

            tree0 = (buf_state.per_tree if if_use_per
                     else (jnp.zeros(()), jnp.zeros(())))
            (pa, pc, ta, tc, mua, muc, nua, nuc, tree, sums) = \
                jax.lax.fori_loop(
                    0, n_chunks, chunk_body,
                    (pa, pc, ta, tc, mua, muc, nua, nuc, tree0,
                     jnp.zeros(3)))
            if if_use_per:
                buf_state = buf_state._replace(per_tree=tree)
            backa = lambda xs: mlp_unflatten(
                [_from_kernel(x, sh) for x, sh in zip(xs, a_shapes)])
            backc = lambda xs: mlp_unflatten(
                [_from_kernel(x, sh) for x, sh in zip(xs, c_shapes)])
            if td3:
                n_act_steps = ((update_times + update_freq - 1)
                               // update_freq)
            else:
                n_act_steps = jnp.where(ddpg_do > 0, update_times, 0)
            act_opt = _with_adam_parts(s.act_opt, ca0 + n_act_steps,
                                       backa(mua), backa(nua))
            cri_opt = _with_adam_parts(s.cri_opt, cc0 + update_times,
                                       backc(muc), backc(nuc))
            nf = update_times.astype(jnp.float32)
            metrics = {'obj_critic': sums[0] / nf,
                       'obj_actor': sums[1] / jnp.maximum(sums[2], 1.0)}
            new = s._replace(act=backa(pa), act_target=backa(ta),
                             cri=backc(pc), cri_target=backc(tc),
                             act_opt=act_opt, cri_opt=cri_opt)
            return new, buf_state, metrics

        return update

    update = _fused_update() or make_offpolicy_update(
        batch_size, repeat_times, objectives)

    pre_update = None
    if hterm:
        from .hterm import discounted_window_returns, insert_best_windows

        def pre_update(s: DDPGHtermState, rollout, last_obs):
            """Harvest each env's best k-step window from the fresh rollout
            (quality = masked discounted window return) into the ring."""
            q = discounted_window_returns(rollout.rewards, rollout.undones,
                                          rollout.unmasks, gamma,
                                          h_term_k_step)
            h_buf = insert_best_windows(s.h_buf, rollout.states,
                                        rollout.actions, rollout.undones,
                                        rollout.unmasks, q, h_term_k_step)
            return s._replace(h_buf=h_buf)

    def cum_returns(s: DDPGState, rollout, last_obs):
        # reference AgentBase.get_cumulative_rewards (AgentBase.py:226-237):
        # bootstrap with cri_target(last, act_target(last))
        from ..ops.gae import cumulative_returns as _cr
        next_v = q_mean(s.cri_target, last_obs, actor(s.act_target, last_obs))
        return _cr(rollout.rewards, rollout.undones, next_v, gamma)

    name = (('AgentTD3Hterm' if hterm else 'AgentTD3') if td3 else
            ('AgentDDPGHterm' if hterm else 'AgentDDPG'))
    return AgentDef(name=name,
                    if_off_policy=True, if_discrete=False,
                    init=init, explore_action=explore_action,
                    greedy_action=greedy_action, env_action=lambda a: a,
                    update=update, cum_returns=cum_returns,
                    pre_update=pre_update,
                    explore_view=lambda s: s.act,
                    explore_merge=lambda f, v: f._replace(act=v))


make_td3 = partial(_make, td3=True)
make_ddpg = partial(_make, td3=False)
make_td3_hterm = partial(_make, td3=True, hterm=True)
make_ddpg_hterm = partial(_make, td3=False, hterm=True)


class AgentTD3:
    make = staticmethod(make_td3)


class AgentDDPG:
    make = staticmethod(make_ddpg)


class AgentTD3Hterm:
    """TD3 + H-term (reference docs hterm.rst; ``plan_DDPG_H.py:16`` selects
    the H variants by drl_id — implementations absent from the snapshot)."""
    make = staticmethod(make_td3_hterm)


class AgentDDPGHterm:
    """DDPG + H-term (imported by reference ``examples/plan_DDPG_H.py:6``
    from a module that does not define it)."""
    make = staticmethod(make_ddpg_hterm)
