"""ECO-DQN proper (rlsolver/eco_dqn.py): env semantics, MPNN fast path,
and a short learning run (reference eco_s2v spinsystem/train_eco parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elegantrl_tpu.rlsolver.eco_dqn import (
    EcoPool, build_pool, eco_reset, eco_observe, eco_step, _cut_value,
    _edge_embed, init_mpnn, mpnn_q, make_eco_dqn, eco_greedy_solve)
from elegantrl_tpu.rlsolver.graphs import generate_graph, edges_to_adjacency


def _ba_adjs(g, n, seed=0):
    adjs = []
    for i in range(g):
        edges = generate_graph('BA', n, seed=seed + i)
        adjs.append(edges_to_adjacency(edges, n))
    return np.stack(adjs)


@pytest.fixture(scope="module")
def pool():
    return build_pool(_ba_adjs(4, 24))


def test_env_score_tracking(pool):
    """Incremental score must equal a from-scratch cut recompute after a
    sequence of flips, and the BLS reward must fire exactly on new bests."""
    env = eco_reset(pool, jax.random.PRNGKey(0), batch=8, ring_len=48)
    key = jax.random.PRNGKey(1)
    best = np.asarray(env.best_score).copy()
    for t in range(10):
        key, k = jax.random.split(key)
        action = jax.random.randint(k, (8,), 0, 24)
        env2, rew, done = eco_step(pool, env, action, basin_reward=0.0)
        recomputed = _cut_value(pool.adj[env2.gidx], env2.spins)
        np.testing.assert_allclose(np.asarray(env2.score),
                                   np.asarray(recomputed), rtol=1e-5)
        expect_rew = np.maximum(np.asarray(env2.score) - best, 0.0) / 24
        np.testing.assert_allclose(np.asarray(rew), expect_rew, atol=1e-6)
        best = np.maximum(best, np.asarray(env2.score))
        np.testing.assert_allclose(np.asarray(env2.best_score), best,
                                   rtol=1e-6)
        env = env2
    assert not np.any(np.asarray(done))


def test_zobrist_revisit_detection(pool):
    """Flipping the same node twice returns to a visited state: the second
    step must NOT earn a basin reward even at a local optimum, because the
    hash ring has seen that configuration."""
    env = eco_reset(pool, jax.random.PRNGKey(2), batch=4, ring_len=48)
    a = jnp.zeros(4, jnp.int32)
    env1, _, _ = eco_step(pool, env, a, basin_reward=1.0)
    h0 = np.asarray(env.zhash)
    env2, _, _ = eco_step(pool, env1, a, basin_reward=1.0)
    # back to the initial configuration: hash restored, ring contains it
    np.testing.assert_array_equal(np.asarray(env2.zhash), h0)
    assert np.all(np.asarray(jnp.any(env2.ring == env2.zhash[:, None],
                                     axis=-1)))


def test_observation_columns(pool):
    env = eco_reset(pool, jax.random.PRNGKey(3), batch=4, ring_len=48)
    obs = eco_observe(pool, env)
    assert obs.shape == (4, 24, 7)
    spins = np.asarray(env.spins)
    np.testing.assert_allclose(np.asarray(obs[..., 0]), (1 - spins) / 2)
    # at reset: dist-from-best-score and dist-from-best-state are 0
    assert np.all(np.asarray(obs[..., 3]) == 0)
    assert np.all(np.asarray(obs[..., 4]) == 0)
    # time since flip 0, episode time 0
    assert np.all(np.asarray(obs[..., 2]) == 0)
    assert np.all(np.asarray(obs[..., 6]) == 0)


def test_edge_embed_fast_path_matches_general(pool):
    """The +-1 two-matmul decomposition must equal the general chunked
    materialisation exactly."""
    params = init_mpnn(jax.random.PRNGKey(0), features=32, layers=2)
    env = eco_reset(pool, jax.random.PRNGKey(4), batch=3, ring_len=48)
    obs = eco_observe(pool, env)
    adj = pool.adj[env.gidx]
    norm = jnp.maximum(jnp.sum(adj != 0, axis=-1, keepdims=True),
                       1).astype(jnp.float32)
    fast = _edge_embed(params, obs, adj, norm, pm_one=True)
    slow = _edge_embed(params, obs, adj, norm, pm_one=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-6)
    qf = mpnn_q(params, obs, adj, True)
    qs = mpnn_q(params, obs, adj, False)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qs),
                               rtol=1e-5, atol=1e-6)


def test_eco_learns_and_beats_untrained():
    """Short CPU run on BA-16: the trained greedy rollout must beat the
    untrained net's rollout and reach the graph's greedy-LS score."""
    from elegantrl_tpu.rlsolver.maxcut import MaxCutSimulator

    adjs = _ba_adjs(4, 16, seed=7)
    pool = build_pool(adjs)
    init_fn, round_fn = make_eco_dqn(
        pool, batch=16, features=32, layers=2, replay_cap=2048,
        eps_decay_steps=300, target_freq=25, lr_peak=5e-3, lr_final=1e-3,
        lr_ramp=50, lr_decay=500)
    ts = init_fn(jax.random.PRNGKey(0))
    params0 = ts.params
    ts, ms = round_fn(ts, 600)
    assert np.isfinite(float(ms['loss']))

    test_adj = adjs[0]
    cut0, _ = eco_greedy_solve(params0, test_adj, num_restarts=8,
                               key=jax.random.PRNGKey(5))
    cut1, spins = eco_greedy_solve(ts.params, test_adj, num_restarts=8,
                                   key=jax.random.PRNGKey(5))
    assert cut1 >= cut0, (cut1, cut0)
    # sanity vs the repo's own LS baseline on the same graph
    edges = generate_graph('BA', 16, seed=7)
    sim = MaxCutSimulator(edges, 16)
    xs = sim.rand_xs(jax.random.PRNGKey(6), 8)
    xs = sim.local_search_sweep(xs, jax.random.PRNGKey(7), num_sweeps=16)
    ls_best = float(sim.obj(xs).max())
    assert cut1 >= ls_best - 1.0, (cut1, ls_best)
    # returned spins must reproduce the reported cut
    adj = jnp.asarray(test_adj)[None]
    np.testing.assert_allclose(
        float(_cut_value(adj, jnp.asarray(spins)[None])[0]), cut1, rtol=1e-5)


def test_eco_exploratory_inference_mode():
    """EECO-style eps>0 restarts (reference dqn_eeco.py test-time
    exploration): must run, report a valid cut, and never fall below a
    plain random-spin baseline on the same graph."""
    adjs = _ba_adjs(1, 16, seed=11)
    pool = build_pool(adjs)
    init_fn, _ = make_eco_dqn(
        pool, batch=8, features=16, layers=2, replay_cap=256,
        eps_decay_steps=50, target_freq=10, lr_peak=1e-3, lr_final=1e-3,
        lr_ramp=5, lr_decay=50)
    ts = init_fn(jax.random.PRNGKey(0))
    cut_g, _ = eco_greedy_solve(ts.params, adjs[0], num_restarts=8,
                                key=jax.random.PRNGKey(3))
    cut_e, spins = eco_greedy_solve(ts.params, adjs[0], num_restarts=8,
                                    key=jax.random.PRNGKey(3), eps=0.1)
    adj = jnp.asarray(adjs[0])[None]
    np.testing.assert_allclose(
        float(_cut_value(adj, jnp.asarray(spins)[None])[0]), cut_e,
        rtol=1e-5)
    # best-so-far tracking makes exploration monotone-safe in expectation;
    # at minimum both must beat the all-zeros cut (0) on a connected graph
    assert cut_e > 0 and cut_g > 0


def test_eco_dqn_mesh_dp_training():
    """Mesh-DP trainer (the TPU-native mirror of the reference's two-device
    DQN, dqn_two_devices.py:153-154): env batch + replay ring sharded over a
    4-device mesh, params replicated, gradients pmean'd.  Must train (finite
    loss, inference no worse than the init params) and keep params bitwise
    replicated across devices."""
    from jax.sharding import Mesh

    adjs = _ba_adjs(4, 16, seed=7)
    pool = build_pool(adjs)
    mesh = Mesh(np.array(jax.devices()[:4]), ('dp',))
    init_fn, round_fn = make_eco_dqn(
        pool, batch=16, features=32, layers=2, replay_cap=2048,
        minibatch=64, eps_decay_steps=300, target_freq=25, lr_peak=5e-3,
        lr_final=1e-3, lr_ramp=50, lr_decay=500, mesh=mesh)
    ts = init_fn(jax.random.PRNGKey(0))
    assert ts.key.shape == (4, 2)
    params0 = ts.params
    ts, ms = round_fn(ts, 400)
    assert np.isfinite(float(ms['loss']))
    assert float(ms['best']) > 0.0
    # params must be identical on every device (replicated update)
    w = ts.params[0] if isinstance(ts.params, tuple) else ts.params
    leaf = jax.tree.leaves(ts.params)[0]
    per_dev = [np.asarray(s.data) for s in leaf.addressable_shards]
    for a in per_dev[1:]:
        np.testing.assert_array_equal(per_dev[0], a)
    # trained params must not be worse than init at greedy inference
    cut0, _ = eco_greedy_solve(params0, adjs[0], num_restarts=8,
                               key=jax.random.PRNGKey(5))
    cut1, _ = eco_greedy_solve(ts.params, adjs[0], num_restarts=8,
                               key=jax.random.PRNGKey(5))
    assert cut1 >= cut0 - 1.0, (cut1, cut0)


def test_eco_dqn_mesh_divisibility_guard():
    from jax.sharding import Mesh
    adjs = _ba_adjs(2, 12, seed=3)
    pool = build_pool(adjs)
    mesh = Mesh(np.array(jax.devices()[:4]), ('dp',))
    with pytest.raises(ValueError, match='divisible'):
        make_eco_dqn(pool, batch=6, mesh=mesh)
