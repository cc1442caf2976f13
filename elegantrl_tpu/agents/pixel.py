"""Pixel-observation PPO: ConvNet encoder + PPO heads, end-to-end on device.

Gives the reference's ``ConvNet`` pixel encoder (AgentBase.py:392-448; ours
in ``ops/nets.py:convnet_*``) a training consumer (VERDICT r1 next #8).
Structure follows the reference's pattern of each net embedding its own conv
trunk: actor = ConvNet -> feature -> MLP -> Normal(mean, exp(std_log));
critic = ConvNet -> feature -> MLP -> value.  The PPO math (V-trace/GAE,
normalization, clipped surrogate, minibatch scan) matches ``agents/ppo.py``
— observations are (H, W, C) images instead of state vectors, and pixel
normalization (x/128 - 1) replaces the running state normalizer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dists, gae
from ..ops.nets import convnet_apply, convnet_init, mlp_apply, mlp_init
from .base import (AgentDef, Rollout, chunked_map, grad_step, make_optimizer,
                   sample_flat_ids)


class PixelPPOState(NamedTuple):
    act: dict     # {'conv': ..., 'mlp': ..., 'std_log': (1, A)}
    cri: dict     # {'conv': ..., 'mlp': ...}
    act_opt: tuple
    cri_opt: tuple


def make_pixel_ppo(net_dims, state_dim, action_dim: int, args,
                   buffer=None) -> AgentDef:
    """``state_dim`` is the image shape (H, W, C); H == W in
    ``ops.nets._CONV_STAGES`` (64 / 112 / 224)."""
    image_size, _, channels = state_dim
    feat_dim = int(getattr(args, 'encoder_dim', 128))
    gamma = float(getattr(args, 'gamma', 0.99))
    lr = float(getattr(args, 'learning_rate', 6e-5))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    ratio_clip = float(getattr(args, 'ratio_clip', 0.25))
    lambda_gae_adv = float(getattr(args, 'lambda_gae_adv', 0.95))
    lambda_entropy = float(getattr(args, 'lambda_entropy', 0.001))
    if_use_vtrace = bool(getattr(args, 'if_use_vtrace', True))
    batch_size = int(getattr(args, 'batch_size', 128))
    repeat_times = float(getattr(args, 'repeat_times', 8.0))
    net_dims = tuple(net_dims)

    optimizer = make_optimizer(lr, clip_grad)

    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        act = {'conv': convnet_init(k1, channels, feat_dim, image_size),
               'mlp': mlp_init(k2, (feat_dim, *net_dims, action_dim),
                               out_std=0.1),
               'std_log': jnp.zeros((1, action_dim), jnp.float32)}
        cri = {'conv': convnet_init(k3, channels, feat_dim, image_size),
               'mlp': mlp_init(k4, (feat_dim, *net_dims, 1), out_std=0.5)}
        return PixelPPOState(act=act, cri=cri,
                             act_opt=optimizer.init(act),
                             cri_opt=optimizer.init(cri))

    def actor_mean(act, obs):
        feat = convnet_apply(act['conv'], obs, image_size)
        return mlp_apply(act['mlp'], jax.nn.gelu(feat))

    def critic_value(cri, obs):
        feat = convnet_apply(cri['conv'], obs, image_size)
        return mlp_apply(cri['mlp'], jax.nn.gelu(feat))[..., 0]

    def explore_action(s: PixelPPOState, obs, key):
        mean = actor_mean(s.act, obs)
        std = jnp.exp(s.act['std_log'])
        action = dists.normal_sample(key, mean, jnp.broadcast_to(std, mean.shape))
        logprob = jnp.sum(dists.normal_logprob(action, mean, std), axis=-1)
        return action, logprob

    def greedy_action(s: PixelPPOState, obs):
        return jnp.tanh(actor_mean(s.act, obs))

    def update(s: PixelPPOState, rollout: Rollout, last_obs, key):
        horizon_len, num_envs = rollout.rewards.shape
        states, actions, logprobs = rollout.states, rollout.actions, rollout.logprobs
        rewards, undones, unmasks = rollout.rewards, rollout.undones, rollout.unmasks

        value_fn = partial(critic_value, s.cri)
        values = chunked_map(value_fn, states)               # (H, N)
        rewards_b, undones_b = gae.apply_truncation_bootstrap(
            rewards, undones, unmasks, values)
        next_value = value_fn(last_obs)
        if if_use_vtrace:
            advantages = gae.gae_vtrace(rewards_b, undones_b, values,
                                        next_value, gamma, lambda_gae_adv)
        else:
            advantages = gae.gae_plain(rewards_b, undones_b, values,
                                       gamma, lambda_gae_adv)
        reward_sums = advantages + values
        advantages = gae.normalize_advantages(advantages)

        update_times = max(1, int(horizon_len * repeat_times / batch_size))

        def minibatch(carry, key_t):
            act, cri, act_opt, cri_opt = carry
            ids0, ids1 = sample_flat_ids(key_t, horizon_len, num_envs, batch_size)
            state = states[ids0, ids1]
            action = actions[ids0, ids1]
            unmask = unmasks[ids0, ids1]
            logprob = logprobs[ids0, ids1]
            advantage = advantages[ids0, ids1]
            reward_sum = reward_sums[ids0, ids1]

            def cri_loss_fn(cp):
                v = critic_value(cp, state)
                return jnp.mean(jnp.square(v - reward_sum) * unmask)

            obj_critic, g_cri = jax.value_and_grad(cri_loss_fn)(cri)
            cri, cri_opt = grad_step(optimizer, cri, cri_opt, g_cri)

            def act_loss_fn(ap):
                mean = actor_mean(ap, state)
                std = jnp.exp(ap['std_log'])
                new_logprob = jnp.sum(
                    dists.normal_logprob(action, mean, std), axis=-1)
                entropy = jnp.sum(
                    dists.normal_entropy(jnp.broadcast_to(std, mean.shape)),
                    axis=-1)
                ratio = jnp.exp(new_logprob - logprob)
                surrogate = jnp.minimum(
                    advantage * ratio,
                    advantage * jnp.clip(ratio, 1 - ratio_clip, 1 + ratio_clip))
                obj_surrogate = jnp.mean(surrogate * unmask)
                return -(obj_surrogate
                         - jnp.mean(entropy * unmask) * lambda_entropy), \
                    obj_surrogate

            (_, obj_surrogate), g_act = \
                jax.value_and_grad(act_loss_fn, has_aux=True)(act)
            act, act_opt = grad_step(optimizer, act, act_opt, g_act)
            return (act, cri, act_opt, cri_opt), (obj_critic, obj_surrogate)

        keys = jax.random.split(key, update_times)
        (act, cri, act_opt, cri_opt), (obj_c, obj_a) = jax.lax.scan(
            minibatch, (s.act, s.cri, s.act_opt, s.cri_opt), keys)

        metrics = {'obj_critic': jnp.mean(obj_c), 'obj_actor': jnp.mean(obj_a)}
        return PixelPPOState(act, cri, act_opt, cri_opt), metrics

    return AgentDef(name='AgentPixelPPO', if_off_policy=False,
                    if_discrete=False, init=init,
                    explore_action=explore_action, greedy_action=greedy_action,
                    env_action=jnp.tanh, update=update)


class AgentPixelPPO:
    make = staticmethod(make_pixel_ppo)
