"""Distribution math vs closed forms and torch (CPU) golden values."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.ops import dists


def test_normal_logprob_matches_scipy_form():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 3)).astype(np.float32)
    mean = rng.standard_normal((5, 3)).astype(np.float32)
    std = rng.uniform(0.1, 2.0, (5, 3)).astype(np.float32)
    out = np.asarray(dists.normal_logprob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std)))
    expect = (-0.5 * ((x - mean) / std) ** 2 - np.log(std)
              - 0.5 * math.log(2 * math.pi))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_normal_entropy():
    std = np.asarray([0.5, 1.0, 2.0], np.float32)
    out = np.asarray(dists.normal_entropy(jnp.asarray(std)))
    expect = 0.5 * np.log(2 * math.pi * np.e * std ** 2)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_categorical_logprob_entropy():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    action = np.array([0, 2, 5, 3])
    out_lp = np.asarray(dists.categorical_logprob(jnp.asarray(logits), jnp.asarray(action)))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    np.testing.assert_allclose(out_lp, np.log(p[np.arange(4), action]), rtol=1e-5)
    out_ent = np.asarray(dists.categorical_entropy(jnp.asarray(logits)))
    np.testing.assert_allclose(out_ent, -(p * np.log(p)).sum(-1), rtol=1e-5)


def test_tanh_normal_logprob_matches_torch_form():
    """The softplus form (reference AgentSAC.py:225-241) vs direct evaluation
    of the change-of-variables formula log N(x) - log(1 - tanh(x)^2)."""
    rng = np.random.default_rng(2)
    log_std = rng.uniform(-1, 0.5, (6, 4)).astype(np.float32)
    noise = rng.standard_normal((6, 4)).astype(np.float32)
    mean = rng.standard_normal((6, 4)).astype(np.float32)
    pre_tanh = mean + np.exp(log_std) * noise
    out = np.asarray(dists.tanh_normal_logprob(
        jnp.asarray(log_std), jnp.asarray(noise), jnp.asarray(pre_tanh)))
    base = (-log_std - 0.5 * noise ** 2 - 0.5 * math.log(2 * math.pi))
    # log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x))
    correction = np.log1p(-np.tanh(pre_tanh) ** 2 + 1e-12)
    expect = (base - correction).sum(-1)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_sampling_moments():
    key = jax.random.key(0)
    mean = jnp.asarray([1.0, -2.0])
    std = jnp.asarray([0.5, 1.5])
    xs = jax.vmap(lambda k: dists.normal_sample(k, mean, std))(jax.random.split(key, 20000))
    np.testing.assert_allclose(np.asarray(xs.mean(0)), [1.0, -2.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(xs.std(0)), [0.5, 1.5], atol=0.05)
