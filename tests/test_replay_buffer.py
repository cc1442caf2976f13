"""Replay ring buffer + PER segment tree golden tests vs NumPy."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.train.replay_buffer import ReplayBuffer
from elegantrl_tpu.ops.per import SegmentTree


def _items(h, n, s, a, rng, t0=0.0):
    return (jnp.asarray(rng.standard_normal((h, n, s)), jnp.float32),
            jnp.asarray(rng.standard_normal((h, n, a)), jnp.float32),
            jnp.asarray(np.arange(h * n).reshape(h, n) + t0, jnp.float32),
            jnp.ones((h, n), jnp.float32),
            jnp.ones((h, n), jnp.float32))


def test_ring_insert_wraparound():
    rb = ReplayBuffer(max_size=10, state_dim=3, action_dim=2, num_seqs=2)
    buf = rb.init()
    rng = np.random.default_rng(0)

    i1 = _items(6, 2, 3, 2, rng, 0)
    buf = rb.update(buf, i1)
    assert int(buf.ptr) == 6 and int(buf.size) == 6

    i2 = _items(6, 2, 3, 2, rng, 100)
    buf = rb.update(buf, i2)
    assert int(buf.ptr) == 2 and int(buf.size) == 10

    # rows 6..9 hold i2[0:4]; rows 0..1 hold i2[4:6]; rows 2..5 still i1[2:6]
    np.testing.assert_allclose(np.asarray(buf.rewards[6:10]), np.asarray(i2[2][0:4]))
    np.testing.assert_allclose(np.asarray(buf.rewards[0:2]), np.asarray(i2[2][4:6]))
    np.testing.assert_allclose(np.asarray(buf.rewards[2:6]), np.asarray(i1[2][2:6]))


def test_sample_next_state_alignment():
    rb = ReplayBuffer(max_size=64, state_dim=1, action_dim=1, num_seqs=2)
    buf = rb.init()
    h = 32
    # states[t, n, 0] = t*10 + n so next_state is checkable
    states = jnp.asarray(np.arange(h)[:, None, None] * 10
                         + np.arange(2)[None, :, None], jnp.float32)
    items = (states, jnp.zeros((h, 2, 1)), jnp.zeros((h, 2)),
             jnp.ones((h, 2)), jnp.ones((h, 2)))
    buf = rb.update(buf, items)
    s, a, r, u, m, ns, ids = rb.sample(buf, jax.random.key(0), 128)
    s, ns = np.asarray(s)[:, 0], np.asarray(ns)[:, 0]
    np.testing.assert_allclose(ns, s + 10)  # next_state = states[ids0+1]


def test_segment_tree_sum_and_sampling():
    st = SegmentTree(max_size=50, num_seqs=3)
    tree = st.init()
    rng = np.random.default_rng(1)
    probs = rng.uniform(0.1, 5.0, size=(50, 3)).astype(np.float32)
    tree = st.update(tree, jnp.arange(50), jnp.asarray(probs))

    # root equals sum of leaves per seq
    np.testing.assert_allclose(np.asarray(st.totals(tree)), probs.sum(0), rtol=1e-4)

    # sampling distribution follows priorities
    ids, prios = st.sample(tree, jax.random.key(0), 4096)
    ids = np.asarray(ids)
    assert ids.min() >= 0 and ids.max() < 50
    for seq in range(3):
        counts = np.bincount(ids[seq], minlength=50)
        corr = np.corrcoef(counts, probs[:, seq])[0, 1]
        assert corr > 0.9, corr

    # priorities returned match the leaves sampled
    got = np.asarray(prios)[0]
    expect = probs[ids[0], 0]
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_segment_tree_scattered_update_and_min():
    st = SegmentTree(max_size=8, num_seqs=2)
    tree = st.init()
    tree = st.update(tree, jnp.arange(8), jnp.full((8, 2), 2.0))
    tree = st.update_scattered(tree, jnp.asarray([1, 3]), jnp.asarray([0, 1]),
                               jnp.asarray([7.0, 0.5]))
    assert float(st.totals(tree)[0]) == 2.0 * 7 + 7.0   # seq0 total
    assert float(st.totals(tree)[1]) == 2.0 * 7 + 0.5   # seq1 total
    mins = np.asarray(st.min_leaf(tree, jnp.asarray(8)))
    np.testing.assert_allclose(mins, [2.0, 0.5])


def test_per_sample_weights():
    rb = ReplayBuffer(max_size=32, state_dim=2, action_dim=1, num_seqs=2,
                      if_use_per=True)
    buf = rb.init()
    rng = np.random.default_rng(2)
    buf = rb.update(buf, _items(16, 2, 2, 1, rng))
    out = rb.sample_for_per(buf, jax.random.key(0), 8)
    s, a, r, u, m, ns, w, (ids0, ids1) = out
    assert s.shape == (8, 2) and w.shape == (8,)
    assert np.all(np.asarray(w) > 0)
    # fresh buffer: all priorities equal -> weights all 1
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)
    # priority update then re-sample must bias toward high-TD rows
    buf = rb.td_error_update_for_per(
        buf, (ids0, ids1), jnp.full((8,), 9.0))
    assert float(buf.per_tree[0].sum()) > 0


def test_sample_rows_contract():
    """sample_rows returns whole env rows: ids0 repeats each drawn row
    num_seqs times, ids1 tiles the env axis, and every leaf equals the
    direct (ids0, ids1) index — same contract as sample()."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 4, 20
    b = ReplayBuffer(max_size=32, state_dim=S, action_dim=A, num_seqs=NS)
    k = jax.random.PRNGKey(0)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.normal(ka, (H, NS, A)),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))
    buf = b.update(b.init(), items)
    B = 12   # 3 rows x 4 seqs
    st, ac, rw, ud, um, nst, (ids0, ids1) = b.sample_rows(
        buf, jax.random.PRNGKey(7), B)
    assert st.shape == (B, S) and ac.shape == (B, A) and rw.shape == (B,)
    i0, i1 = np.asarray(ids0), np.asarray(ids1)
    assert (i0.reshape(3, NS) == i0.reshape(3, NS)[:, :1]).all()
    assert (i1.reshape(3, NS) == np.arange(NS)).all()
    assert (i0 < int(buf.size) - 1).all()
    np.testing.assert_allclose(np.asarray(st),
                               np.asarray(buf.states[i0, i1]))
    np.testing.assert_allclose(np.asarray(nst),
                               np.asarray(buf.states[i0 + 1, i1]))
    np.testing.assert_allclose(np.asarray(ac),
                               np.asarray(buf.actions[i0, i1]))
    np.testing.assert_allclose(np.asarray(rw),
                               np.asarray(buf.rewards[i0, i1]))
