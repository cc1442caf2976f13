"""Golden-value tests for advantage ops vs direct NumPy recursions
(the reference's Python loops, AgentPPO.py:207-232, re-stated in NumPy)."""
import numpy as np
import jax.numpy as jnp

from elegantrl_tpu.ops import gae


def _np_vtrace(rewards, undones, values, next_value, gamma, lam):
    H, N = rewards.shape
    masks = undones * gamma
    advantages = np.empty_like(values)
    adv = np.zeros(N, np.float32)
    nv = next_value.copy()
    for t in range(H - 1, -1, -1):
        nv = rewards[t] + masks[t] * nv
        adv = nv - values[t] + masks[t] * lam * adv
        advantages[t] = adv
        nv = values[t]
    return advantages


def _np_plain(rewards, undones, values, gamma, lam):
    H, N = rewards.shape
    masks = undones * gamma
    advantages = np.empty_like(values)
    carry = np.zeros(N, np.float32)
    for t in range(H - 1, -1, -1):
        advantages[t] = rewards[t] - values[t] + masks[t] * carry
        carry = values[t] + lam * advantages[t]
    return advantages


def _rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


def test_gae_vtrace_matches_numpy():
    rng = np.random.default_rng(0)
    H, N = 37, 5
    rewards, values = _rand((H, N), rng), _rand((H, N), rng)
    undones = (rng.random((H, N)) > 0.1).astype(np.float32)
    next_value = _rand((N,), rng)
    out = gae.gae_vtrace(jnp.asarray(rewards), jnp.asarray(undones),
                         jnp.asarray(values), jnp.asarray(next_value), 0.99, 0.95)
    ref = _np_vtrace(rewards, undones, values, next_value, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gae_plain_matches_numpy():
    rng = np.random.default_rng(1)
    H, N = 29, 3
    rewards, values = _rand((H, N), rng), _rand((H, N), rng)
    undones = (rng.random((H, N)) > 0.1).astype(np.float32)
    out = gae.gae_plain(jnp.asarray(rewards), jnp.asarray(undones),
                        jnp.asarray(values), 0.99, 0.95)
    ref = _np_plain(rewards, undones, values, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_cumulative_returns_closed_form():
    # deterministic undone=1 stream: ret[t] = sum_k gamma^k r[t+k] + gamma^(H-t) v_H
    gamma = 0.9
    H, N = 8, 2
    rewards = np.ones((H, N), np.float32)
    undones = np.ones((H, N), np.float32)
    next_value = np.full((N,), 10.0, np.float32)
    out = np.asarray(gae.cumulative_returns(
        jnp.asarray(rewards), jnp.asarray(undones), jnp.asarray(next_value), gamma))
    for t in range(H):
        k = H - t
        expect = (1 - gamma ** k) / (1 - gamma) + gamma ** k * 10.0
        np.testing.assert_allclose(out[t], expect, rtol=1e-5)


def test_truncation_bootstrap():
    rewards = np.zeros((3, 2), np.float32)
    undones = np.ones((3, 2), np.float32)
    unmasks = np.ones((3, 2), np.float32)
    unmasks[1, 0] = 0.0  # truncated step
    values = np.full((3, 2), 7.0, np.float32)
    r2, u2 = gae.apply_truncation_bootstrap(
        jnp.asarray(rewards), jnp.asarray(undones), jnp.asarray(unmasks),
        jnp.asarray(values))
    assert float(r2[1, 0]) == 7.0 and float(r2[0, 0]) == 0.0
    assert float(u2[1, 0]) == 0.0 and float(u2[0, 0]) == 1.0


def test_normalize_advantages_strided_std():
    rng = np.random.default_rng(2)
    adv = rng.standard_normal((64, 16)).astype(np.float32)
    out = np.asarray(gae.normalize_advantages(jnp.asarray(adv)))
    sub = adv[::4, ::4]
    expect = (adv - adv.mean()) / (sub.std(ddof=1) + 1e-5)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_associative_matches_sequential():
    """The associative-scan fast path (H >= ASSOC_MIN_H) must reproduce the
    sequential reference recursion to f32 reassociation tolerance, for all
    three recurrences, including episodes cut by undone=0."""
    import jax
    from elegantrl_tpu.ops import gae as G

    key = jax.random.PRNGKey(0)
    H, N = 64, 37
    ks = jax.random.split(key, 4)
    r = jax.random.normal(ks[0], (H, N))
    v = jax.random.normal(ks[1], (H, N))
    u = (jax.random.uniform(ks[2], (H, N)) > 0.1).astype(jnp.float32)
    nv = jax.random.normal(ks[3], (N,))

    def seq(fn, *args, **kw):
        # force the sequential branch by shrinking ASSOC_MIN_H's view
        old = G.ASSOC_MIN_H
        G.ASSOC_MIN_H = 10 ** 9
        try:
            return fn(*args, **kw)
        finally:
            G.ASSOC_MIN_H = old

    a1 = G.gae_vtrace(r, u, v, nv, 0.97, 0.95)
    a2 = seq(G.gae_vtrace, r, u, v, nv, 0.97, 0.95)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-5, atol=2e-5)

    b1 = G.gae_plain(r, u, v, 0.97, 0.95)
    b2 = seq(G.gae_plain, r, u, v, 0.97, 0.95)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=2e-5, atol=2e-5)

    c1 = G.cumulative_returns(r, u, nv, 0.97)
    c2 = seq(G.cumulative_returns, r, u, nv, 0.97)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=2e-5, atol=2e-5)
