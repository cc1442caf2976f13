"""Round-2b rlsolver problems: graph partitioning, set cover, BILP,
portfolio — known-optimum instances + exact flip-gain checks."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.rlsolver import (
    BILPSimulator, GraphPartitionSimulator, PortfolioSimulator, Problem,
    SetCoverSimulator, genetic_algorithm, make_simulator,
    simulated_annealing, supported_problems,
)

KEY = jax.random.key(0)


def _check_flip_gains(sim, num_check=5):
    """flip_gains must equal the exact objective delta of each single flip."""
    xs = sim.rand_xs(KEY, 3)
    gains = np.asarray(sim.flip_gains(xs))
    base = np.asarray(sim.obj(xs))
    step = max(1, sim.num_nodes // num_check)
    for s in range(3):
        for i in range(0, sim.num_nodes, step):
            x2 = np.asarray(xs).copy()
            x2[s, i] = 1 - x2[s, i]
            delta = float(sim.obj(jnp.asarray(x2))[s]) - base[s]
            np.testing.assert_allclose(gains[s, i], delta, rtol=1e-4,
                                       atol=1e-4)


def test_graph_partitioning_bridge_graph():
    """Two K4 cliques joined by one bridge edge: the optimal balanced
    partition cuts exactly the bridge (cut = 1)."""
    edges = []
    for block in (range(4), range(4, 8)):
        block = list(block)
        for a in range(len(block)):
            for b in range(a + 1, len(block)):
                edges.append((block[a], block[b], 1.0))
    edges.append((0, 4, 1.0))
    edges = np.array(edges)
    sim = GraphPartitionSimulator(edges, 8)
    _check_flip_gains(sim)
    best, x = genetic_algorithm(sim, KEY, pop_size=128, num_generations=16)
    cut, xb = sim.best(x[None])
    assert float(cut) == 1.0
    assert float(sim.imbalance(xb[None])[0]) == 0.0


def test_set_cover_known_optimum():
    """Universe {0..5}; sets {0,1,2}, {3,4,5}, {0,3}, {1,4}, {2,5}:
    minimum cover = 2 (the two triples)."""
    m = np.zeros((5, 6))
    m[0, [0, 1, 2]] = 1
    m[1, [3, 4, 5]] = 1
    m[2, [0, 3]] = 1
    m[3, [1, 4]] = 1
    m[4, [2, 5]] = 1
    sim = SetCoverSimulator(m)
    _check_flip_gains(sim)
    _, x = genetic_algorithm(sim, KEY, pop_size=64, num_generations=16)
    size, cover = sim.best(x[None])
    assert float(size) == 2.0
    assert float(sim.num_uncovered(cover[None])[0]) == 0.0


def test_bilp_matches_bruteforce():
    rng = np.random.default_rng(7)
    n, m = 10, 4
    c = rng.uniform(1, 10, n)
    a = rng.uniform(0, 5, (m, n))
    b = a.sum(1) * 0.4
    best = -np.inf
    for mask in range(1 << n):
        x = np.array([(mask >> i) & 1 for i in range(n)], float)
        if (a @ x <= b + 1e-9).all():
            best = max(best, float(c @ x))
    sim = BILPSimulator(c, a, b)
    _check_flip_gains(sim)
    # feasibility-aware selection: local-search a big restart batch and let
    # sim.best pick the best FEASIBLE solution across all sims
    k1, k2 = jax.random.split(KEY)
    xs = sim.rand_xs(k1, 1024)
    xs = sim.local_search_sweep(xs, k2, num_sweeps=32)
    val, _ = sim.best(xs)
    assert float(val) >= 0.99 * best, (float(val), best)


def test_portfolio_exact_k_and_bruteforce():
    rng = np.random.default_rng(9)
    n, k = 10, 3
    mu = rng.uniform(0, 1, n)
    r = rng.normal(size=(n, n)) * 0.1
    sigma = r @ r.T + np.eye(n) * 0.05
    lam = 1.0
    best = -np.inf
    for mask in range(1 << n):
        x = np.array([(mask >> i) & 1 for i in range(n)], float)
        if x.sum() == k:
            best = max(best, float(mu @ x - lam * x @ sigma @ x))
    sim = PortfolioSimulator(mu, sigma, k, risk_lambda=lam)
    _check_flip_gains(sim)
    best_sa, x = simulated_annealing(sim, KEY, num_sims=512, num_steps=512)
    val, xb = sim.best(x[None])
    assert float(np.asarray(xb).sum()) == k
    assert float(val) >= best - 1e-3, (float(val), best)


def test_registry_covers_new_problems():
    for p in (Problem.graph_partitioning, Problem.set_cover, Problem.bilp,
              Problem.portfolio_allocation):
        assert p in supported_problems()
    sim = make_simulator('set_cover', membership=np.eye(4))
    assert isinstance(sim, SetCoverSimulator)


def test_vertex_cover_registry_returns_cover_space():
    """make_simulator(minimum_vertex_cover) must hand back COVER solutions,
    not raw independent sets (the MIS complement)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from elegantrl_tpu.rlsolver import Problem, make_simulator
    # path 0-1-2: minimum cover = {1}, size 1
    edges = np.array([[0, 1, 1.0], [1, 2, 1.0]])
    sim = make_simulator(Problem.minimum_vertex_cover, edges=edges, num_nodes=3)
    key = jax.random.PRNGKey(0)
    xs = sim.local_search(sim.rand_xs(key, 256), jax.random.PRNGKey(1))
    size, cover = sim.best(xs)
    assert float(size) == 1.0
    assert np.allclose(np.asarray(cover), [0, 1, 0])
    # every edge must have a covered endpoint
    assert float(sim.num_uncovered(cover[None])[0]) == 0.0
    # the maximized obj is -|cover| for valid covers
    assert float(sim.obj(cover[None])[0]) == -1.0


def test_generic_drivers_reject_minimizing_sims():
    import jax
    import numpy as np
    import pytest
    from elegantrl_tpu.rlsolver import (make_simulator, Problem,
                                        simulated_annealing,
                                        genetic_algorithm)
    edges = np.array([[0, 1, 1.0], [1, 2, 1.0]])
    coloring = make_simulator(Problem.graph_coloring, edges=edges,
                              num_nodes=3, num_colors=2)
    with pytest.raises(ValueError, match="if_maximize"):
        simulated_annealing(coloring, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="if_maximize"):
        genetic_algorithm(coloring, jax.random.PRNGKey(0))


def test_vertex_cover_with_generic_sa():
    """The cover wrapper plugs into the generic maximizing drivers."""
    import jax
    import numpy as np
    from elegantrl_tpu.rlsolver import Problem, make_simulator, simulated_annealing
    # star: center 0 covers all 4 edges -> optimum cover size 1, obj -1
    edges = np.array([[0, i, 1.0] for i in range(1, 5)])
    sim = make_simulator(Problem.minimum_vertex_cover, edges=edges, num_nodes=5)
    obj, x = simulated_annealing(sim, jax.random.PRNGKey(0), num_sims=128,
                                 num_steps=256)
    assert float(sim.num_uncovered(x[None])[0]) == 0.0
    assert float(obj) == -1.0


def test_knapsack_infeasible_item_rejected():
    """Scale-free feasibility guarantee: an item slightly over capacity with
    huge value must NOT survive the penalized search (regression: the linear
    penalty alone made obj([1]) = 80 > 0 here, and knapsack_solve returned
    value=-inf on the infeasible argmax)."""
    from elegantrl_tpu.rlsolver import KnapsackSimulator, knapsack_solve
    sim = KnapsackSimulator(values=[100.0], weights=[10.0], capacity=9.0)
    assert float(sim.obj(jnp.asarray([[1.0]]))[0]) < 0.0  # dominated by empty
    v, x = knapsack_solve(sim, KEY, num_sims=32, num_generations=8)
    assert float(v) == 0.0 and float(x[0]) == 0.0


def test_partition_penalty_scales_with_edge_weights():
    """Weighted star with edge weight 10 >> the old fixed penalty 2.0: the
    default penalty must still make the penalized optimum balanced
    (regression: all-one-side 'partitions' won and best() returned inf)."""
    edges = np.array([(0, i, 10.0) for i in range(1, 8)])
    sim = GraphPartitionSimulator(edges, 8)
    xs = sim.local_search_sweep(sim.rand_xs(KEY, 64), jax.random.key(1))
    cut, x = sim.best(xs)
    assert np.isfinite(float(cut))
    assert float(sim.imbalance(x[None])[0]) == 0.0
    # star: any balanced split has exactly 4 or 3 center-leaf cut edges * 10
    assert float(cut) in (30.0, 40.0)
