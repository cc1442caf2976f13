"""Probability-distribution math used by the agents.

Closed-form logprob/entropy for diagonal Gaussians, categoricals and
tanh-squashed Gaussians.  Replaces torch.distributions usage in the reference
(``ActorPPO.get_action`` AgentPPO.py:368-386, ``ActorSAC.get_action_logprob``
AgentSAC.py:187-241) with explicit jnp formulas that XLA fuses into the actor
forward pass.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = math.log(math.sqrt(2.0 * math.pi))
_LOG_2 = math.log(2.0)


def normal_logprob(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Elementwise N(mean, std) log-density."""
    z = (x - mean) / std
    return -0.5 * jnp.square(z) - jnp.log(std) - _LOG_SQRT_2PI


def normal_entropy(std: jax.Array) -> jax.Array:
    """Elementwise N(., std) entropy = 0.5 + 0.5*log(2*pi) + log(std)."""
    return 0.5 + _LOG_SQRT_2PI + jnp.log(std)


def normal_sample(key: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def categorical_sample(key: jax.Array, logits: jax.Array) -> jax.Array:
    return jax.random.categorical(key, logits, axis=-1)


def categorical_logprob(logits: jax.Array, action: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None].astype(jnp.int32), axis=-1)[..., 0]


def categorical_entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def tanh_normal_logprob_simple(mean: jax.Array, std: jax.Array,
                               pre_tanh: jax.Array) -> jax.Array:
    """The reference ``ActorSAC`` form (AgentSAC.py:187-198): evaluates the
    Gaussian density AT THE MEAN (their quirk, kept for parity) and corrects
    with ``log(1 - tanh(x)^2 + 1e-6)``.  Summed over the action axis.
    """
    action_tanh = jnp.tanh(pre_tanh)
    logprob = normal_logprob(mean, mean, std)  # reference evaluates log_prob(a_avg)
    logprob = logprob - jnp.log(1.000001 - jnp.square(action_tanh))
    return jnp.sum(logprob, axis=-1)


def tanh_normal_logprob(log_std: jax.Array, noise: jax.Array,
                        pre_tanh: jax.Array) -> jax.Array:
    """The reference ``ActorFixSAC`` softplus form (AgentSAC.py:225-241):

      logprob = -log_std - noise^2/2 - log(sqrt(2*pi))
                - 2*(log(2) - x - softplus(-2x))

    where x is the pre-tanh action.  Numerically stable for |x| large.
    Summed over the action axis.
    """
    logprob = -log_std - 0.5 * jnp.square(noise) - _LOG_SQRT_2PI
    logprob = logprob - 2.0 * (_LOG_2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    return jnp.sum(logprob, axis=-1)
