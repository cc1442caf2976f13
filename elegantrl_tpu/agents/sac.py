"""SAC and ModSAC (TPU-native).

Behavioral parity targets (reference ``elegantrl/agents/AgentSAC.py``):

- SAC: shared-trunk actor emitting (mean, log_std), log_std clamped (-16, 2),
  tanh-squashed sample; the reference's simplified logprob (evaluated at the
  mean, corrected with ``log(1.000001 - tanh(a)^2)``, :187-198);
- ModSAC: split decoders for mean/log_std, clamp (-20, 2), softplus-form
  tanh correction (:225-241), actor target network, and the
  ``reliable_lambda`` two-time-scale actor gating (:149-158) — in this
  snapshot ``critic_value`` stays 1.0 so the gate ratio is the constant
  ``1 / (2 - e^-1)``;
- critic: ensemble of Q heads over a shared (s,a) linear encoder
  (``CriticEnsemble``, :244-259), default 4 heads (SAC) / 8 (ModSAC);
  TD target uses the head ``min`` (:53);
- auto-alpha: trainable ``alpha_log`` (init -1), loss
  ``alpha_log * (target_entropy - logprob)``, clamped to (-16, 2) after each
  step; ``target_entropy = +log(action_dim)`` for SAC (:31) and
  ``-log(action_dim)`` for ModSAC (:103) — both reference quirks kept.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import dists
from ..ops.nets import ensemble_init, mlp_apply, mlp_init, soft_update
from .base import AgentDef, grad_step, make_optimizer
from .off_policy import cum_fit_term, make_offpolicy_update


class SACState(NamedTuple):
    act: dict
    act_target: Optional[dict]   # ModSAC only
    cri: dict
    cri_target: dict
    act_opt: tuple
    cri_opt: tuple
    alpha_log: jax.Array         # ()
    alpha_opt: tuple
    update_a: jax.Array          # () int32, ModSAC actor-update counter


class SACHtermState(NamedTuple):
    act: dict
    act_target: Optional[dict]
    cri: dict
    cri_target: dict
    act_opt: tuple
    cri_opt: tuple
    alpha_log: jax.Array
    alpha_opt: tuple
    update_a: jax.Array
    h_buf: object


def make_sac(net_dims, state_dim: int, action_dim: int, args, buffer,
             modsac: bool = False, hterm: bool = False) -> AgentDef:
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    tau = float(getattr(args, 'soft_update_tau', 5e-3))
    batch_size = int(getattr(args, 'batch_size', 64))
    repeat_times = float(getattr(args, 'repeat_times', 1.0))
    if_use_per = bool(getattr(args, 'if_use_per', False))
    # row-stratified replay sampling — see replay_buffer.py:sample_rows and
    # agents/ddpg_td3.py for the measured rationale (per-sample gathers are
    # the off-policy device-time bottleneck, SOL_BREAKDOWN.json r5)
    row_mode = getattr(args, 'replay_row_sample', 'auto')
    batch_size_ = int(getattr(args, 'batch_size', 64))
    row_sample = (row_mode not in (False, 'false', '0')
                  and not if_use_per and buffer is not None
                  and batch_size_ % buffer.num_seqs == 0
                  and batch_size_ >= buffer.num_seqs)
    if row_mode is True and not row_sample:
        raise ValueError(
            'replay_row_sample=True needs uniform sampling (no PER) and '
            'batch_size a positive multiple of num_envs '
            f'(got batch_size={batch_size_}, '
            f'num_envs={getattr(buffer, "num_seqs", None)})')
    lambda_fit_cum_r = float(getattr(args, 'lambda_fit_cum_r', 0.0))
    num_ensembles = int(getattr(args, 'num_ensembles', 8 if modsac else 4))
    if modsac:
        target_entropy = float(getattr(args, 'target_entropy', -jnp.log(action_dim)))
    else:
        target_entropy = float(jnp.log(action_dim))
    std_clip = (-20.0, 2.0) if modsac else (-16.0, 2.0)
    # H-term hypers (same surface as AgentPPOHterm; docs hterm.rst names SAC
    # among the implemented-but-absent variants)
    h_term_lambda = float(getattr(args, 'h_term_lambda', 2 ** -3))
    h_term_drop_rate = float(getattr(args, 'h_term_drop_rate', 2 ** -2))
    h_term_k_step = int(getattr(args, 'h_term_k_step', 16))
    h_term_buffer_size = int(getattr(args, 'h_term_buffer_size', 2 ** 12))
    net_dims = tuple(net_dims)

    optimizer = make_optimizer(lr, clip_grad)
    alpha_optimizer = make_optimizer(lr, clip_grad)

    def init(key):
        keys = jax.random.split(key, 5)
        if modsac:
            act = {'enc': mlp_init(keys[0], (state_dim, *net_dims)),
                   'avg': mlp_init(keys[1], (net_dims[-1], action_dim), out_std=0.1),
                   'std': mlp_init(keys[2], (net_dims[-1], action_dim), out_std=0.1)}
        else:
            act = {'enc': mlp_init(keys[0], (state_dim, *net_dims)),
                   'head': mlp_init(keys[1], (net_dims[-1], action_dim * 2), out_std=0.1)}
        cri = {
            'enc': mlp_init(keys[3], (state_dim + action_dim, net_dims[0])),
            'heads': ensemble_init(
                keys[4], num_ensembles,
                lambda k: mlp_init(k, (*net_dims, 1), out_std=0.5)),
        }
        base = dict(
            act=act,
            act_target=jax.tree.map(jnp.copy, act) if modsac else None,
            cri=cri, cri_target=jax.tree.map(jnp.copy, cri),
            act_opt=optimizer.init(act), cri_opt=optimizer.init(cri),
            alpha_log=jnp.asarray(-1.0),
            alpha_opt=alpha_optimizer.init(jnp.asarray(-1.0)),
            update_a=jnp.zeros((), jnp.int32))
        if not hterm:
            return SACState(**base)
        from .hterm import init_hterm_buffer
        return SACHtermState(**base, h_buf=init_hterm_buffer(
            h_term_buffer_size, h_term_k_step, state_dim, action_dim))

    def actor_dist(act, obs):
        """Returns (mean, log_std)."""
        if modsac:
            enc = mlp_apply(act['enc'], obs)
            mean = mlp_apply(act['avg'], enc)
            log_std = jnp.clip(mlp_apply(act['std'], enc), *std_clip)
        else:
            # reference ActorSAC: trailing GELU on the trunk (if_raw_out=False)
            enc = jax.nn.gelu(mlp_apply(act['enc'], obs))
            out = mlp_apply(act['head'], enc)
            mean, log_std = jnp.split(out, 2, axis=-1)
            log_std = jnp.clip(log_std, *std_clip)
        return mean, log_std

    def get_action(act, obs, key):
        mean, log_std = actor_dist(act, obs)
        noise = jax.random.normal(key, mean.shape)
        return jnp.tanh(mean + jnp.exp(log_std) * noise)

    def get_action_logprob(act, obs, key):
        mean, log_std = actor_dist(act, obs)
        noise = jax.random.normal(key, mean.shape)
        pre_tanh = mean + jnp.exp(log_std) * noise
        if modsac:
            logprob = dists.tanh_normal_logprob(log_std, noise, pre_tanh)
        else:
            logprob = dists.tanh_normal_logprob_simple(mean, jnp.exp(log_std), pre_tanh)
        return jnp.tanh(pre_tanh), logprob

    def q_values(cri, obs, action):
        """(batch, num_ensembles) — linear encoder + vmapped head MLPs."""
        sa = jnp.concatenate([obs, action], axis=-1)
        enc = mlp_apply(cri['enc'], sa)
        heads = jax.vmap(lambda hp: mlp_apply(hp, enc)[..., 0])(cri['heads'])
        return jnp.moveaxis(heads, 0, -1)

    def explore_action(s: SACState, obs, key):
        return get_action(s.act, obs, key), None

    def greedy_action(s: SACState, obs):
        mean, _ = actor_dist(s.act, obs)
        return jnp.tanh(mean)

    def objectives(s: SACState, buf_state, key, update_t):
        # split for the H-term only when it consumes randomness, so plain
        # SAC/ModSAC's RNG stream (and verified learning rows) is unchanged
        k_h = None
        if hterm:
            key, k_h = jax.random.split(key)
        k_sample, k_next, k_pg = jax.random.split(key, 3)
        if if_use_per:
            (state, action, reward, undone, unmask, next_state, is_weight,
             is_ids) = buffer.sample_for_per(buf_state, k_sample, batch_size)
        else:
            (state, action, reward, undone, unmask, next_state,
             is_ids) = (buffer.sample_rows if row_sample
                        else buffer.sample)(buf_state, k_sample, batch_size)
            is_weight = None

        next_action, next_logprob = get_action_logprob(s.act, next_state, k_next)
        next_q = jnp.min(q_values(s.cri_target, next_state, next_action), axis=-1)
        alpha = jnp.exp(s.alpha_log)
        q_label = reward + undone * gamma * (next_q - next_logprob * alpha)

        def cri_loss_fn(cp):
            qs = q_values(cp, state, action)
            td = jnp.mean(jnp.square(qs - q_label[:, None]), axis=-1) * unmask
            obj = jnp.mean(td * is_weight) if if_use_per else jnp.mean(td)
            if lambda_fit_cum_r != 0.0:
                obj = obj + cum_fit_term(buf_state, is_ids, qs, lambda_fit_cum_r)
            return obj, td

        (obj_critic, td), g_cri = jax.value_and_grad(cri_loss_fn, has_aux=True)(s.cri)
        cri, cri_opt = grad_step(optimizer, s.cri, s.cri_opt, g_cri)
        cri_target = soft_update(s.cri_target, cri, tau)
        if if_use_per:
            buf_state = buffer.td_error_update_for_per(buf_state, is_ids, td)

        '''alpha objective (reference :72-80), with logprob at current actor'''
        _, logprob_now = get_action_logprob(s.act, state, k_pg)

        def alpha_loss_fn(alpha_log):
            return jnp.mean(alpha_log * (target_entropy - logprob_now))

        g_alpha = jax.grad(alpha_loss_fn)(s.alpha_log)
        alpha_log, alpha_opt = grad_step(alpha_optimizer, s.alpha_log,
                                         s.alpha_opt, g_alpha)
        alpha_log = jnp.clip(alpha_log, -16.0, 2.0)
        alpha = jax.lax.stop_gradient(jnp.exp(alpha_log))

        '''actor objective, gated for ModSAC (reference :149-158)'''
        if modsac:
            reliable_lambda = jnp.exp(-1.0)  # critic_value stays 1.0 in snapshot
            update_a = jnp.where(update_t == 0, 0, s.update_a)
            do_actor = (update_a.astype(jnp.float32) / (update_t + 1.0)
                        ) < (1.0 / (2.0 - reliable_lambda))
            update_a = update_a + do_actor.astype(jnp.int32)
        else:
            do_actor = jnp.ones((), jnp.bool_)
            update_a = s.update_a

        if hterm:  # bounds are loop-invariant: keep them out of the grad trace
            from .hterm import return_bounds
            h_bounds = return_bounds(s.h_buf)

        def actor_step(operands):
            act, act_opt, act_target = operands

            def act_loss_fn(ap):
                a_pg, lp = get_action_logprob(ap, state, k_pg)
                q_pg = jnp.mean(q_values(cri_target, state, a_pg))
                loss = -jnp.mean(q_pg - lp * alpha)
                if hterm:
                    # stochastic-policy H-term: return-weighted likelihood of
                    # rehearsed high-return windows; stored actions are
                    # tanh-squashed, so invert through a clipped atanh
                    from .hterm import rehearsal_sample
                    h_batch = max(1, int(batch_size * h_term_drop_rate))
                    hs, ha, hm, w, valid = rehearsal_sample(s.h_buf, k_h,
                                                            h_batch,
                                                            *h_bounds)
                    mean_h, log_std_h = actor_dist(ap, hs)
                    pre = jnp.arctanh(jnp.clip(ha, -0.999999, 0.999999))
                    z = (pre - mean_h) / jnp.exp(log_std_h)
                    lp_h = jnp.sum(
                        -0.5 * jnp.square(z) - log_std_h
                        - 0.5 * jnp.log(2.0 * jnp.pi)
                        - jnp.log(1.000001 - jnp.square(ha)), axis=-1)
                    lp_mean = jnp.sum(lp_h * hm, 1) / jnp.maximum(
                        jnp.sum(hm, 1), 1.0)
                    h_obj = jnp.sum(lp_mean * w * valid) / jnp.maximum(
                        jnp.sum(valid), 1.0)
                    loss = loss - h_term_lambda * h_obj
                return loss

            obj_neg, g_act = jax.value_and_grad(act_loss_fn)(act)
            act, act_opt = grad_step(optimizer, act, act_opt, g_act)
            if modsac:
                act_target = soft_update(act_target, act, tau)
            return act, act_opt, act_target, -obj_neg, jnp.ones(())

        def actor_skip(operands):
            act, act_opt, act_target = operands
            return act, act_opt, act_target, jnp.zeros(()), jnp.zeros(())

        act, act_opt, act_target, obj_actor, a_upd = jax.lax.cond(
            do_actor, actor_step, actor_skip, (s.act, s.act_opt, s.act_target))

        new = s._replace(act=act, act_target=act_target, cri=cri,
                         cri_target=cri_target, act_opt=act_opt,
                         cri_opt=cri_opt, alpha_log=alpha_log,
                         alpha_opt=alpha_opt, update_a=update_a)
        return new, buf_state, (obj_critic, obj_actor, a_upd)

    # Fused whole-chunk Pallas update (ops/pallas_update.py:
    # make_sac_fused_chunk) — same chunked shape as the DQN/TD3 fused
    # updates, plus SAC's in-kernel dynamic state: the learned alpha leaf,
    # the ModSAC reliability gate, and the gate-dependent actor Adam count.
    pallas_update_mode = getattr(args, 'use_pallas_update', 'auto')
    _FUSED_CHUNK = int(getattr(args, 'sac_fused_chunk', 16))

    def _fused_update():
        mode = pallas_update_mode
        if mode in (False, 'false', '0') or buffer is None:
            return None
        interpret = (mode == 'interpret')
        f32_storage = getattr(buffer, 'storage_dtype', jnp.float32) in (
            jnp.float32, 'float32')
        # SAC's per-ensemble head autodiff keeps far more live VMEM than
        # the single-net kernels (measured 16.3-21.2M stack at
        # (128,128)x1024, E=8): the kernel raises its Mosaic scoped-vmem
        # limit to 64M (pallas_update.py compiler_params) and lane-chunks
        # the batch (the PPO kernel's LC loop) only beyond the measured
        # envelope, so wide batches ride the kernel instead of falling back
        # to the 15-sequential-cond scan path (2.77 ms/round busy there vs
        # 1.02 ms on the kernel at the sac_hopper shape, SOL_BREAKDOWN r5).
        # width cap 128: the (256,256)-wide SAC chunk measured a 105.76M
        # scoped stack at batch 1024 (over the raised limit; lane-chunking
        # does NOT shrink the Mosaic stack proportionally — the unrolled
        # chunks' frames don't share slots), so 256-wide SAC configs stay
        # on the scan path exactly as in round 4
        lane_chunk = None
        for lc in (2048, 1024, 512, 256, 128):
            if (lc <= batch_size and batch_size % lc == 0
                    and max(net_dims) * lc <= 131072
                    and max(net_dims) <= 128):
                lane_chunk = lc
                break
        forced_lc = getattr(args, 'sac_lane_chunk', None)
        if forced_lc:   # tuning/test override
            lane_chunk = int(forced_lc)
        eligible = (not hterm and not if_use_per
                    and lambda_fit_cum_r == 0.0
                    and len(net_dims) == 2
                    and batch_size % 128 == 0 and batch_size <= 2048
                    and lane_chunk is not None
                    and max(net_dims) <= 256
                    and f32_storage
                    # mesh DP shards the buffer; the un-shard_mapped
                    # kernel cannot ride XLA's auto-partitioner
                    and not getattr(args, 'mesh_axes', None))
        if not eligible:
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True (SAC/ModSAC) requires the non-'
                    'H-term agent, uniform sampling (no PER), '
                    'lambda_fit_cum_r=0, a 2-hidden-layer net, f32 storage, '
                    'and batch_size a multiple of 128 and <= 2048 (got '
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
                                         make_sac_fused_chunk,
                                         sac_act_flatten, sac_act_unflatten,
                                         sac_cri_flatten, sac_cri_unflatten)
        C = _FUSED_CHUNK
        chunk_fn = make_sac_fused_chunk(
            state_dim, action_dim, batch_size, C, gamma=gamma, tau=tau,
            lr=lr, clip_grad=clip_grad, modsac=modsac,
            num_ensembles=num_ensembles, target_entropy=target_entropy,
            std_clip=std_clip, lane_chunk=lane_chunk, interpret=interpret)
        N = buffer.num_seqs

        def update(s: SACState, buf_state, key):
            size = buf_state.size
            update_times = jnp.maximum(
                (size.astype(jnp.float32) * repeat_times
                 / batch_size).astype(jnp.int32), 1)
            n_chunks = (update_times + C - 1) // C
            ca0, mu_a, nu_a = _adam_parts(s.act_opt)
            cc0, mu_c, nu_c = _adam_parts(s.cri_opt)
            cl0, mu_l, nu_l = _adam_parts(s.alpha_opt)
            a_shapes = [x.shape for x in sac_act_flatten(s.act, modsac)]
            c_shapes = [x.shape
                        for x in sac_cri_flatten(s.cri, num_ensembles)]
            KA = lambda t_: tuple(_to_kernel(x)
                                  for x in sac_act_flatten(t_, modsac))
            KC = lambda t_: tuple(_to_kernel(x)
                                  for x in sac_cri_flatten(t_,
                                                           num_ensembles))
            pa, pc = KA(s.act), KC(s.cri)
            ta = KA(s.act_target) if modsac else ()
            tc = KC(s.cri_target)
            mua, muc = KA(mu_a), KC(mu_c)
            nua, nuc = KA(nu_a), KC(nu_c)
            one = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1)
            misc = (one(s.alpha_log), one(mu_l), one(nu_l),
                    one(ca0.astype(jnp.float32)),
                    one(s.update_a.astype(jnp.float32)))
            states2d = buf_state.states.reshape(-1, state_dim)
            acts2d = buf_state.actions.reshape(-1, action_dim)
            rew1d = buf_state.rewards.reshape(-1)
            ud1d = buf_state.undones.reshape(-1)
            um1d = buf_state.unmasks.reshape(-1)
            sample_len = jnp.maximum(size - 1, 1)

            def chunk_body(ci, carry):
                pa, pc, ta, tc, mua, muc, nua, nuc, misc, sums = carry
                idx = ci * C + jnp.arange(C)
                # the scan path's exact RNG: fold_in per update index, then
                # split(3) -> (sample, next-action noise, pg noise)
                kk = jax.vmap(lambda i: jax.random.split(
                    jax.random.fold_in(key, i), 3))(idx)
                if row_sample:   # contiguous row slabs (sample_rows keys)
                    R = batch_size // N
                    rows = jax.vmap(lambda k: jax.random.randint(
                        k, (R,), 0, sample_len))(kk[:, 0]).reshape(-1)
                    takes = lambda arr, r_: jnp.take(
                        arr, r_, axis=0).reshape(
                            (C, batch_size) + arr.shape[2:])
                    sb = takes(buf_state.states, rows)
                    nsb = takes(buf_state.states, rows + 1)
                    ab = takes(buf_state.actions, rows)
                    rb = takes(buf_state.rewards, rows)[:, None, :]
                    ud = takes(buf_state.undones, rows)[:, None, :]
                    um = takes(buf_state.unmasks, rows)[:, None, :]
                else:
                    ids = jax.vmap(lambda k: jax.random.randint(
                        k, (batch_size,), 0, sample_len * N))(kk[:, 0])
                    ids0 = ids % sample_len
                    ids1 = ids // sample_len
                    flat = ids0 * N + ids1
                    sb = jnp.take(states2d, flat, axis=0)
                    nsb = jnp.take(states2d, flat + N, axis=0)
                    ab = jnp.take(acts2d, flat, axis=0)
                    rb = jnp.take(rew1d, flat)[:, None, :]
                    ud = jnp.take(ud1d, flat)[:, None, :]
                    um = jnp.take(um1d, flat)[:, None, :]
                draw = lambda k: jax.random.normal(
                    k, (batch_size, action_dim))
                nzn = jax.vmap(draw)(kk[:, 1]).transpose(0, 2, 1)
                nzp = jax.vmap(draw)(kk[:, 2]).transpose(0, 2, 1)
                valid = (idx < update_times).astype(jnp.float32)
                cri_step = (cc0.astype(jnp.float32)
                            + idx.astype(jnp.float32) + 1.0)
                al_step = (cl0.astype(jnp.float32)
                           + idx.astype(jnp.float32) + 1.0)
                bcv = jnp.stack([1.0 - jnp.power(0.9, cri_step),
                                 1.0 - jnp.power(0.999, cri_step),
                                 1.0 - jnp.power(0.9, al_step),
                                 1.0 - jnp.power(0.999, al_step),
                                 valid, idx.astype(jnp.float32),
                                 jnp.zeros((C,), jnp.float32)], axis=1)
                (pa, pc, ta, tc, mua, muc, nua, nuc, misc, objs) = chunk_fn(
                    pa, pc, ta, tc, mua, muc, nua, nuc, misc,
                    sb.transpose(0, 2, 1), nsb.transpose(0, 2, 1),
                    ab.transpose(0, 2, 1), rb, ud, um, nzn, nzp, bcv)
                sums = sums + jnp.stack([jnp.sum(objs[:, 0] * valid),
                                         jnp.sum(objs[:, 1] * objs[:, 2]),
                                         jnp.sum(objs[:, 2])])
                return pa, pc, ta, tc, mua, muc, nua, nuc, misc, sums

            (pa, pc, ta, tc, mua, muc, nua, nuc, misc,
             sums) = jax.lax.fori_loop(
                0, n_chunks, chunk_body,
                (pa, pc, ta, tc, mua, muc, nua, nuc, misc, jnp.zeros(3)))
            backa = lambda xs: sac_act_unflatten(
                [_from_kernel(x, sh) for x, sh in zip(xs, a_shapes)], modsac)
            backc = lambda xs: sac_cri_unflatten(
                [_from_kernel(x, sh) for x, sh in zip(xs, c_shapes)],
                num_ensembles)
            alpha_log2, mu_l2, nu_l2, cnt_a2, upd_a2 = misc
            n_act_steps = (cnt_a2[0, 0]
                           - ca0.astype(jnp.float32)).astype(jnp.int32)
            act_opt = _with_adam_parts(s.act_opt, ca0 + n_act_steps,
                                       backa(mua), backa(nua))
            cri_opt = _with_adam_parts(s.cri_opt, cc0 + update_times,
                                       backc(muc), backc(nuc))
            alpha_opt = _with_adam_parts(
                s.alpha_opt, cl0 + update_times,
                mu_l2.reshape(()), nu_l2.reshape(()))
            nf = update_times.astype(jnp.float32)
            metrics = {'obj_critic': sums[0] / nf,
                       'obj_actor': sums[1] / jnp.maximum(sums[2], 1.0)}
            new = s._replace(
                act=backa(pa),
                act_target=backa(ta) if modsac else None,
                cri=backc(pc), cri_target=backc(tc),
                act_opt=act_opt, cri_opt=cri_opt,
                alpha_log=alpha_log2.reshape(()), alpha_opt=alpha_opt,
                update_a=upd_a2[0, 0].astype(jnp.int32))
            return new, buf_state, metrics

        return update

    update = _fused_update() or make_offpolicy_update(
        batch_size, repeat_times, objectives)

    pre_update = None
    if hterm:
        from .hterm import discounted_window_returns, insert_best_windows

        def pre_update(s: SACHtermState, rollout, last_obs):
            """Harvest each env's best k-step window from the fresh rollout
            (quality = masked discounted window return) into the ring."""
            q = discounted_window_returns(rollout.rewards, rollout.undones,
                                          rollout.unmasks, gamma,
                                          h_term_k_step)
            h_buf = insert_best_windows(s.h_buf, rollout.states,
                                        rollout.actions, rollout.undones,
                                        rollout.unmasks, q, h_term_k_step)
            return s._replace(h_buf=h_buf)

    def cum_returns(s: SACState, rollout, last_obs):
        from ..ops.gae import cumulative_returns as _cr
        act_params = s.act_target if modsac else s.act
        mean, _ = actor_dist(act_params, last_obs)
        next_v = jnp.mean(q_values(s.cri_target, last_obs, jnp.tanh(mean)), axis=-1)
        return _cr(rollout.rewards, rollout.undones, next_v, gamma)

    name = (('AgentModSACHterm' if hterm else 'AgentModSAC') if modsac else
            ('AgentSACHterm' if hterm else 'AgentSAC'))
    return AgentDef(name=name,
                    if_off_policy=True, if_discrete=False,
                    init=init, explore_action=explore_action,
                    greedy_action=greedy_action, env_action=lambda a: a,
                    update=update, cum_returns=cum_returns,
                    pre_update=pre_update,
                    explore_view=lambda s: s.act,
                    explore_merge=lambda f, v: f._replace(act=v))


class AgentSAC:
    make = staticmethod(partial(make_sac, modsac=False))


class AgentModSAC:
    make = staticmethod(partial(make_sac, modsac=True))


class AgentSACHterm:
    """SAC + H-term (reference docs hterm.rst names SAC among the
    implemented variants; absent from the snapshot)."""
    make = staticmethod(partial(make_sac, modsac=False, hterm=True))


class AgentModSACHterm:
    make = staticmethod(partial(make_sac, modsac=True, hterm=True))
