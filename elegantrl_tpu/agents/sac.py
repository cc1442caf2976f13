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
             is_ids) = buffer.sample(buf_state, k_sample, batch_size)
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

    update = make_offpolicy_update(batch_size, repeat_times, objectives)

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
