"""PPO / A2C (+ discrete variants), TPU-native.

Behavioral parity targets (reference ``elegantrl/agents/AgentPPO.py``):

- actor: MLP -> Normal(mean, exp(action_std_log)) with a learned global
  ``action_std_log`` parameter; env action is ``tanh(sample)`` while the raw
  sample is stored for the ratio (AgentPPO.py:348-390);
- state normalization buffers ``state_avg/state_std`` shared actor/critic,
  updated with tau ``state_value_tau`` (AgentPPO.py:360-361, 234-249);
- GAE with V-trace-style or plain recursion + truncation bootstrapping
  (AgentPPO.py:207-232), advantage normalization with strided std (:149);
- single-sided clipped surrogate
  ``adv * ratio * where(adv>0, 1-clip, 1+clip)`` (:199), entropy bonus
  ``lambda_entropy``, minibatches sampled uniformly over flattened (t, env)
  ids (:176-187), ``update_times = horizon * repeat_times / batch_size``;
- A2C overrides the objective with the unclipped policy gradient and samples
  whole time-slices (AgentPPO.py:292-311).

The whole ``update`` is one jitted program: chunked value re-evaluation, the
advantage scan, and a ``lax.scan`` over SGD minibatches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..envs.base import EnvSpec
from ..ops import dists, gae
from ..ops.nets import mlp_apply, mlp_init
from .hterm import (HtermBuffer, init_hterm_buffer, insert_best_windows,
                    rehearsal_sample, return_bounds)
from .base import (AgentDef, Rollout, chunked_map, grad_step, make_optimizer,
                   resolve_compute_dtype, sample_flat_ids)


class PPOState(NamedTuple):
    act: dict            # {'mlp': ..., 'std_log': (1, A)}  (std_log absent when discrete)
    cri: list            # critic MLP params
    act_opt: tuple
    cri_opt: tuple
    norm_avg: jax.Array  # (S,) state normalization (shared act/cri)
    norm_std: jax.Array  # (S,)


class PPOHtermState(NamedTuple):
    act: dict
    cri: list
    act_opt: tuple
    cri_opt: tuple
    norm_avg: jax.Array
    norm_std: jax.Array
    h_buf: HtermBuffer


def _norm_state(obs, avg, std):
    return (obs - avg) / (std + 1e-4)


def make_ppo(net_dims, state_dim: int, action_dim: int, args,
             buffer=None, discrete: bool = False, a2c: bool = False,
             hterm: bool = False) -> AgentDef:
    """Factory. ``args`` is a Config-like object read via getattr (the
    reference reads hypers the same way, AgentPPO.py:27-32)."""
    if hterm and (discrete or a2c):
        raise ValueError('H-term is supported for continuous PPO only '
                         '(the reference exercises it on MuJoCo control, '
                         'examples/plan_PPO_H.py)')
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    ratio_clip = float(getattr(args, 'ratio_clip', 0.25))
    lambda_gae_adv = float(getattr(args, 'lambda_gae_adv', 0.95))
    lambda_entropy = float(getattr(args, 'lambda_entropy', 0.01 if discrete else 0.001))
    if_use_vtrace = bool(getattr(args, 'if_use_vtrace', getattr(args, 'if_use_v_trace', True)))
    # The reference implements the surrogate as the single-sided form
    # ``adv * ratio * where(adv>0, 1-clip, 1+clip)`` (AgentPPO.py:196-199),
    # which never actually clips the ratio; on Pendulum it plateaus (verified
    # against the reference itself running on this machine).  Default to the
    # standard double-sided clip; set ``args.if_single_sided_clip = True``
    # for exact reference-form parity.
    if_single_sided_clip = bool(getattr(args, 'if_single_sided_clip', False))
    state_value_tau = float(getattr(args, 'state_value_tau', 0.0))
    batch_size = int(getattr(args, 'batch_size', 128))
    repeat_times = float(getattr(args, 'repeat_times', 8.0))
    compute_dtype = resolve_compute_dtype(args, net_dims)
    # H-term hypers: names/defaults per the reference's surviving entry script
    # (examples/plan_PPO_H.py:53-57).
    h_term_lambda = float(getattr(args, 'h_term_lambda', 2 ** -3))
    h_term_drop_rate = float(getattr(args, 'h_term_drop_rate', 2 ** -2))
    h_term_k_step = int(getattr(args, 'h_term_k_step', 16))
    h_term_buffer_size = int(getattr(args, 'h_term_buffer_size', 2 ** 12))

    optimizer = make_optimizer(lr, clip_grad)
    net_dims = tuple(net_dims)

    # Fused whole-update Pallas kernel (ops/pallas_update.py): the entire
    # minibatch-SGD loop as ONE op, auto-selected when the workload matches
    # its scope — (Discrete)PPO with a 2-hidden-layer MLP, f32 compute,
    # lane-aligned batch, single chip.  args.use_pallas_update:
    # 'auto' (default) | True | False | 'interpret' (CPU tests).
    pallas_update_mode = getattr(args, 'use_pallas_update', 'auto')

    def _fused_update(horizon_len: int):
        """Build the fused-update kernel for this trace's shapes, or None."""
        mode = pallas_update_mode
        if mode in (False, 'false', '0'):
            return None
        interpret = (mode == 'interpret')
        # batch cap: fwd+bwd activations are (hidden, B) x several live
        # copies in VMEM; B=2048 compiles on v5e, 4096 does not (the remote
        # Mosaic helper dies even with in-kernel lane-chunking).  Larger
        # batches mean few updates per round anyway (update_times =
        # H*repeat/B), so the scan path costs little there.
        eligible = (not (a2c or hterm)
                    and len(net_dims) == 2
                    and batch_size % 128 == 0
                    and batch_size <= 2048
                    and compute_dtype is None)
        update_times = max(1, int(horizon_len * repeat_times / batch_size))
        if eligible:
            n_params = (state_dim * net_dims[0] + net_dims[0]
                        + net_dims[0] * net_dims[1] + net_dims[1]
                        + net_dims[1] * (action_dim + 1)
                        + action_dim + 1) * 2
            from ..ops.pallas_update import fused_update_bytes
            fits = fused_update_bytes(update_times, batch_size, state_dim,
                                      action_dim, n_params) <= 8 * 2 ** 20
        else:
            fits = False
        if not (eligible and fits):
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True requires (Discrete)PPO (non-'
                    'A2C, non-H-term) with a 2-hidden-layer MLP, '
                    'batch_size a multiple of 128 and <= 2048, f32 '
                    'compute, and a VMEM-sized minibatch block (got '
                    f'batch_size={batch_size}, net_dims={net_dims}, '
                    f'update_times={update_times})')
            return None
        if not interpret and jax.devices()[0].platform != 'tpu':
            if mode is True:
                raise ValueError(
                    'use_pallas_update=True: Mosaic kernels need a real TPU '
                    f'(current backend: {jax.devices()[0].platform}); use '
                    "use_pallas_update='interpret' for CPU testing")
            return None
        from ..ops.pallas_update import make_ppo_fused_update
        return make_ppo_fused_update(
            state_dim, action_dim, batch_size, update_times,
            ratio_clip=ratio_clip, lambda_entropy=lambda_entropy, lr=lr,
            clip_grad=clip_grad, single_sided=if_single_sided_clip,
            discrete=discrete, interpret=interpret)

    def init(key):
        k1, k2 = jax.random.split(key)
        act_mlp = mlp_init(k1, (state_dim, *net_dims, action_dim), out_std=0.1)
        act = {'mlp': act_mlp}
        if not discrete:
            act['std_log'] = jnp.zeros((1, action_dim), jnp.float32)
        cri = mlp_init(k2, (state_dim, *net_dims, 1), out_std=0.5)
        base = PPOState(
            act=act, cri=cri,
            act_opt=optimizer.init(act), cri_opt=optimizer.init(cri),
            norm_avg=jnp.zeros(state_dim), norm_std=jnp.ones(state_dim))
        if not hterm:
            return base
        h_buf = init_hterm_buffer(h_term_buffer_size, h_term_k_step,
                                  state_dim, action_dim)
        return PPOHtermState(*base, h_buf=h_buf)

    def actor_forward(act, norm_avg, norm_std, obs):
        x = _norm_state(obs, norm_avg, norm_std)
        return mlp_apply(act['mlp'], x, dtype=compute_dtype)

    def critic_value(cri, norm_avg, norm_std, obs):
        x = _norm_state(obs, norm_avg, norm_std)
        return mlp_apply(cri, x, dtype=compute_dtype)[..., 0]

    def explore_action(s: PPOState, obs, key):
        out = actor_forward(s.act, s.norm_avg, s.norm_std, obs)
        if discrete:
            action = dists.categorical_sample(key, out)
            logprob = dists.categorical_logprob(out, action)
            return action.astype(jnp.int32), logprob
        std = jnp.exp(s.act['std_log'])
        action = dists.normal_sample(key, out, jnp.broadcast_to(std, out.shape))
        logprob = jnp.sum(dists.normal_logprob(action, out, std), axis=-1)
        return action, logprob

    def greedy_action(s: PPOState, obs):
        out = actor_forward(s.act, s.norm_avg, s.norm_std, obs)
        if discrete:
            return jnp.argmax(out, axis=-1).astype(jnp.int32)
        return jnp.tanh(out)

    def env_action(action):
        return action if discrete else jnp.tanh(action)

    def logprob_entropy(act, norm_avg, norm_std, obs, action):
        out = mlp_apply(act['mlp'], _norm_state(obs, norm_avg, norm_std),
                        dtype=compute_dtype)
        if discrete:
            return (dists.categorical_logprob(out, action),
                    dists.categorical_entropy(out))
        std = jnp.exp(act['std_log'])
        logprob = jnp.sum(dists.normal_logprob(action, out, std), axis=-1)
        entropy = jnp.sum(dists.normal_entropy(jnp.broadcast_to(std, out.shape)), axis=-1)
        return logprob, entropy

    def update(s: PPOState, rollout: Rollout, last_obs, key):
        horizon_len, num_envs = rollout.rewards.shape
        states, actions, logprobs = rollout.states, rollout.actions, rollout.logprobs
        rewards, undones, unmasks = rollout.rewards, rollout.undones, rollout.unmasks
        # fast-path rollouts keep the kernel-native transposed layout
        # (H, S, N) / (H, A, N), flagged by the 'tsn' extras key — the
        # un-transpose XLA op it saves measured ~210 us/round (profile_sol)
        tsn = rollout.extras is not None and 'tsn' in rollout.extras

        '''advantages (no-grad), reference AgentPPO.py:138-151'''
        value_fn = partial(critic_value, s.cri, s.norm_avg, s.norm_std)
        if rollout.extras is not None and 'values' in rollout.extras:
            # computed per step inside the collect scan while obs was hot —
            # skips re-reading the whole (H, N, S) rollout from HBM.  The
            # critic/norm params don't change during collection, so this is
            # the same function of the same inputs as the re-eval below.
            values = rollout.extras['values']               # (H, N)
        else:  # host-collected rollouts carry no extras
            values = chunked_map(value_fn, states)          # (H, N)
        rewards_b, undones_b = gae.apply_truncation_bootstrap(
            rewards, undones, unmasks, values)
        next_value = value_fn(last_obs)                      # (N,)
        if if_use_vtrace:
            advantages = gae.gae_vtrace(rewards_b, undones_b, values,
                                        next_value, gamma, lambda_gae_adv)
        else:
            advantages = gae.gae_plain(rewards_b, undones_b, values,
                                       gamma, lambda_gae_adv)
        reward_sums = advantages + values
        advantages = gae.normalize_advantages(advantages)

        '''H-term rehearsal buffer: insert each env's best k-step window
        (quality = GAE target at the window start), then precompute the
        return-normalisation bounds used as rehearsal weights.'''
        if hterm:
            k_full = h_term_k_step                # ring-buffer window size
            k_step = min(k_full, horizon_len)     # usable part this rollout
            q = reward_sums[:horizon_len - k_step + 1]          # (Hq, N)
            h_buf = insert_best_windows(s.h_buf, states, actions, undones,
                                        unmasks, q, k_full)
            r_min, r_max = return_bounds(h_buf)
            h_batch = max(1, int(batch_size * h_term_drop_rate))

            def h_objective(ap, key_h):
                """Return-weighted likelihood of rehearsed windows
                (maximised): the H-term proper."""
                hs, ha, hm, w, valid = rehearsal_sample(
                    h_buf, key_h, h_batch, r_min, r_max)
                out = mlp_apply(ap['mlp'],
                                _norm_state(hs, s.norm_avg, s.norm_std),
                                dtype=compute_dtype)
                std_a = jnp.exp(ap['std_log'])
                lp = jnp.sum(dists.normal_logprob(ha, out, std_a), axis=-1)
                lp_mean = jnp.sum(lp * hm, 1) / jnp.maximum(jnp.sum(hm, 1), 1.0)
                return jnp.sum(lp_mean * w * valid) / jnp.maximum(
                    jnp.sum(valid), 1.0)

        '''minibatch SGD scan, reference AgentPPO.py:159-205'''
        update_times = max(1, int(horizon_len * repeat_times / batch_size))

        fused = None if hterm else _fused_update(horizon_len)
        if fused is not None:
            # identical RNG streams to the scan path: split once, one key
            # per minibatch, same sample_flat_ids per key
            keys = jax.random.split(key, update_times)
            ids0, ids1 = jax.vmap(
                lambda k: sample_flat_ids(k, horizon_len, num_envs,
                                          batch_size))(keys)   # (U, B) x2
            if tsn:
                # gather per feature plane: each (H, N) slice keeps the
                # kernel output's native layout, so XLA gathers scalars
                # instead of re-laying-out the whole states tensor (the
                # profiler measured that relayout copy at ~203 us/round)
                sb = jnp.stack([states[:, i, :][ids0, ids1]
                                for i in range(states.shape[1])], axis=1)
                sb = sb.astype(jnp.float32)                    # (U, S, B)
            else:
                sb = jnp.transpose(states[ids0, ids1],
                                   (0, 2, 1)).astype(jnp.float32)
            if discrete:
                # actions carry no feature axis: (H, N) int32 in both
                # layouts; the kernel takes the one-hot (U, A, B) row
                aidx = actions[ids0, ids1]                     # (U, B)
                ab = jnp.moveaxis(
                    jax.nn.one_hot(aidx, action_dim, dtype=jnp.float32),
                    -1, 1)                                     # (U, A, B)
            elif tsn:
                ab = jnp.stack([actions[:, i, :][ids0, ids1]
                                for i in range(actions.shape[1])], axis=1)
                ab = ab.astype(jnp.float32)                    # (U, A, B)
            else:
                ab = jnp.transpose(actions[ids0, ids1],
                                   (0, 2, 1)).astype(jnp.float32)
            lpb = logprobs[ids0, ids1]
            advb = advantages[ids0, ids1]
            rsb = reward_sums[ids0, ids1]
            umb = unmasks[ids0, ids1]
            act, cri, act_opt, cri_opt, metrics = fused(
                s.act, s.cri, s.act_opt, s.cri_opt, s.norm_avg, s.norm_std,
                sb, ab, lpb, advb, rsb, umb)
            norm_avg, norm_std = s.norm_avg, s.norm_std
            if state_value_tau > 0:
                flat_states = (jnp.moveaxis(states, 1, 2) if tsn
                               else states)
                flat = flat_states.reshape(
                    -1, flat_states.shape[-1]).astype(jnp.float32)
                tau = state_value_tau
                norm_avg = norm_avg * (1 - tau) + jnp.mean(flat, axis=0) * tau
                norm_std = jnp.maximum(
                    norm_std * (1 - tau) + jnp.std(flat, axis=0) * tau, 1e-4)
            return PPOState(act, cri, act_opt, cri_opt,
                            norm_avg, norm_std), metrics

        def minibatch(carry, key_t):
            act, cri, act_opt, cri_opt = carry
            # split only when the H-term consumes randomness, so plain PPO's
            # RNG stream (and hence its verified learning rows) is unchanged
            key_h = None
            if hterm:
                key_t, key_h = jax.random.split(key_t)
            if a2c:  # A2C samples whole time-slices (AgentPPO.py:296-302)
                ids0 = jax.random.randint(key_t, (batch_size,), 0, horizon_len)
                if tsn:  # transposed (H, S, N) layout from the fast rollout
                    state = jnp.moveaxis(states[ids0], 1, 2)
                    action = (actions[ids0] if discrete
                              else jnp.moveaxis(actions[ids0], 1, 2))
                else:
                    state = states[ids0]
                    action = actions[ids0]
                unmask = unmasks[ids0]
                logprob = None
                advantage = advantages[ids0]
                reward_sum = reward_sums[ids0]
            else:
                ids0, ids1 = sample_flat_ids(key_t, horizon_len, num_envs, batch_size)
                if tsn:  # transposed (H, S, N) layout from the fast rollout
                    state = states[ids0, :, ids1]
                    # discrete actions carry no feature axis: (H, N) int32
                    action = (actions[ids0, ids1] if discrete
                              else actions[ids0, :, ids1])
                else:
                    state = states[ids0, ids1]
                    action = actions[ids0, ids1]
                unmask = unmasks[ids0, ids1]
                logprob = logprobs[ids0, ids1]
                advantage = advantages[ids0, ids1]
                reward_sum = reward_sums[ids0, ids1]

            def cri_loss_fn(cp):
                v = critic_value(cp, s.norm_avg, s.norm_std, state)
                return jnp.mean(jnp.square(v - reward_sum) * unmask)

            obj_critic, g_cri = jax.value_and_grad(cri_loss_fn)(cri)
            cri, cri_opt = grad_step(optimizer, cri, cri_opt, g_cri)

            def act_loss_fn(ap):
                new_logprob, entropy = logprob_entropy(
                    ap, s.norm_avg, s.norm_std, state, action)
                if a2c:  # unclipped policy gradient (AgentPPO.py:308-310)
                    obj_surrogate = jnp.mean(advantage * new_logprob * unmask)
                    obj_entropy = jnp.mean(entropy * unmask)
                    # A2C here takes a true entropy BONUS (+lambda*H in the
                    # maximized objective) to slow exploration-std collapse —
                    # unlike the PPO branch below, which keeps the
                    # reference's sign (a penalty, AgentPPO.py:203-204) for
                    # exact parity.  The reference's A2C drops the term
                    # entirely (AgentPPO.py:292-311).
                    return (-(obj_surrogate + obj_entropy * lambda_entropy),
                            (obj_surrogate, obj_entropy))
                ratio = jnp.exp(new_logprob - logprob)
                if if_single_sided_clip:  # reference form (AgentPPO.py:199)
                    surrogate = advantage * ratio * jnp.where(
                        advantage > 0, 1.0 - ratio_clip, 1.0 + ratio_clip)
                else:  # standard clipped surrogate
                    surrogate = jnp.minimum(
                        advantage * ratio,
                        advantage * jnp.clip(ratio, 1.0 - ratio_clip,
                                             1.0 + ratio_clip))
                obj_surrogate = jnp.mean(surrogate * unmask)
                obj_entropy = jnp.mean(entropy * unmask)
                # sign matches the reference exactly: obj_actor_full =
                # surrogate - lambda*entropy, maximized (AgentPPO.py:203-204)
                # — i.e. a small entropy PENALTY at the default 1e-3 lambda
                loss = -(obj_surrogate - obj_entropy * lambda_entropy)
                if hterm:
                    loss = loss - h_term_lambda * h_objective(ap, key_h)
                return loss, (obj_surrogate, obj_entropy)

            (_, (obj_surrogate, obj_entropy)), g_act = \
                jax.value_and_grad(act_loss_fn, has_aux=True)(act)
            act, act_opt = grad_step(optimizer, act, act_opt, g_act)

            return (act, cri, act_opt, cri_opt), \
                (obj_critic, obj_surrogate, obj_entropy)

        keys = jax.random.split(key, update_times)
        (act, cri, act_opt, cri_opt), (obj_c, obj_a, obj_e) = jax.lax.scan(
            minibatch, (s.act, s.cri, s.act_opt, s.cri_opt), keys)

        '''running state normalization (AgentPPO.py:234-249; active iff tau>0)'''
        norm_avg, norm_std = s.norm_avg, s.norm_std
        if state_value_tau > 0:
            flat = states.reshape(-1, states.shape[-1]).astype(jnp.float32)
            tau = state_value_tau
            norm_avg = norm_avg * (1 - tau) + jnp.mean(flat, axis=0) * tau
            norm_std = jnp.maximum(
                norm_std * (1 - tau) + jnp.std(flat, axis=0) * tau, 1e-4)

        metrics = {'obj_critic': jnp.mean(obj_c),
                   'obj_actor': jnp.mean(obj_a),
                   'obj_entropy': jnp.mean(obj_e)}
        if hterm:
            new_state = PPOHtermState(act, cri, act_opt, cri_opt,
                                      norm_avg, norm_std, h_buf)
        else:
            new_state = PPOState(act, cri, act_opt, cri_opt,
                                 norm_avg, norm_std)
        return new_state, metrics

    def rollout_values(s: PPOState, obs):
        """Per-step critic values, evaluated inside the collect scan (the
        critic is frozen during collection, so these equal the update-time
        re-eval the reference performs over the whole rollout,
        AgentPPO.py:141-143 — minus one full-rollout HBM read)."""
        return {'values': critic_value(s.cri, s.norm_avg, s.norm_std, obs)}

    name = ('AgentDiscreteA2C' if (discrete and a2c) else
            'AgentDiscretePPO' if discrete else
            'AgentA2C' if a2c else
            'AgentPPOHterm' if hterm else 'AgentPPO')
    return AgentDef(name=name, if_off_policy=False, if_discrete=discrete,
                    init=init, explore_action=explore_action,
                    greedy_action=greedy_action, env_action=env_action,
                    update=update,
                    explore_view=lambda s: (s.act, s.norm_avg, s.norm_std),
                    explore_merge=lambda f, v: f._replace(
                        act=v[0], norm_avg=v[1], norm_std=v[2]),
                    rollout_extras=rollout_values)


# Class-style markers for Config(agent_class=...) parity with the reference.
class AgentPPO:
    make = staticmethod(partial(make_ppo, discrete=False, a2c=False))


class AgentA2C:
    make = staticmethod(partial(make_ppo, discrete=False, a2c=True))


class AgentDiscretePPO:
    make = staticmethod(partial(make_ppo, discrete=True, a2c=False))


class AgentDiscreteA2C:
    make = staticmethod(partial(make_ppo, discrete=True, a2c=True))


class AgentPPOHterm:
    """PPO + H-term (high-return k-step rehearsal regulariser).

    Completes the reference's claims-level feature: ``AgentPPOHterm`` is
    imported by ``examples/plan_PPO_H.py:6`` and headlined in README.md:153
    ("~6x faster than SB3 on Hopper") but its implementation is absent from
    the reference snapshot.  Hypers: ``h_term_lambda`` (2**-3),
    ``h_term_drop_rate`` (2**-2), ``h_term_k_step`` (16),
    ``h_term_buffer_size`` (2**12).
    """
    make = staticmethod(partial(make_ppo, discrete=False, a2c=False,
                                hterm=True))
