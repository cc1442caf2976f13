"""Pallas kernels vs their reference twins (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.ops.pallas_kernels import (
    buffer_gather, buffer_gather_reference,
    fused_mlp3, fused_mlp3_reference,
)


def test_buffer_gather_matches_fancy_indexing():
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.standard_normal((64, 8, 128)), jnp.float32)
    ids0 = jnp.asarray(rng.integers(0, 64, 32), jnp.int32)
    ids1 = jnp.asarray(rng.integers(0, 8, 32), jnp.int32)
    out = buffer_gather(buf, ids0, ids1, interpret=True)
    ref = buffer_gather_reference(buf, ids0, ids1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_fused_mlp3_matches_reference():
    rng = np.random.default_rng(1)
    B, S, H, O = 256, 128, 128, 128
    x = jnp.asarray(rng.standard_normal((B, S)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((S, H)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, O)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(O) * 0.1, jnp.float32)
    out = fused_mlp3(x, w0, b0, w1, b1, w2, b2, block_b=128, interpret=True)
    ref = fused_mlp3_reference(x, w0, b0, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gae_pallas_matches_xla():
    rng = np.random.default_rng(3)
    H, N = 37, 256
    rewards = jnp.asarray(rng.standard_normal((H, N)), jnp.float32)
    undones = jnp.asarray((rng.random((H, N)) > 0.1), jnp.float32)
    values = jnp.asarray(rng.standard_normal((H, N)), jnp.float32)
    next_value = jnp.asarray(rng.standard_normal(N), jnp.float32)
    from elegantrl_tpu.ops.pallas_kernels import (gae_vtrace_pallas,
                                                  gae_vtrace_reference)
    out = gae_vtrace_pallas(rewards, undones, values, next_value, 0.99, 0.95,
                            interpret=True)
    ref = gae_vtrace_reference(rewards, undones, values, next_value, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
