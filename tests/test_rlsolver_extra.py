"""Round-2 rlsolver breadth: GA, graph coloring, knapsack, number
partitioning, Problem registry, exact-solver wrappers — each tested on
instances with known optima (VERDICT r1 missing #2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elegantrl_tpu.rlsolver import (
    MaxCutSimulator, GraphColoringSimulator, KnapsackSimulator,
    NumberPartitionSimulator, Problem, SolverUnavailable,
    chromatic_upper_bound, color_graph, genetic_algorithm,
    generate_graph, gurobi_solve_maxcut, knapsack_dp, knapsack_solve,
    make_simulator, min_vertex_cover, scip_solve_maxcut, simulated_annealing,
    supported_problems,
)

KEY = jax.random.key(0)

# K4 graph: MaxCut optimum = 4 (2-2 split)
K4 = np.array([(0, 1, 1), (0, 2, 1), (0, 3, 1), (1, 2, 1), (1, 3, 1),
               (2, 3, 1)], dtype=np.float64)

# Petersen graph: chromatic number 3, MIS size 4, min vertex cover 6
PETERSEN = np.array(
    [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 0, 1),      # outer C5
     (5, 7, 1), (7, 9, 1), (9, 6, 1), (6, 8, 1), (8, 5, 1),      # inner star
     (0, 5, 1), (1, 6, 1), (2, 7, 1), (3, 8, 1), (4, 9, 1)],     # spokes
    dtype=np.float64)


def test_ga_finds_k4_maxcut_optimum():
    sim = MaxCutSimulator(K4, 4)
    best, x = genetic_algorithm(sim, KEY, pop_size=64, num_generations=8)
    assert float(best) == 4.0
    assert float(sim.obj(x[None])[0]) == 4.0


def test_ga_matches_sa_on_ba_graph():
    edges = generate_graph('BA', 64, seed=3)
    sim = MaxCutSimulator(edges, 64)
    ga_best, _ = genetic_algorithm(sim, KEY, pop_size=128, num_generations=24)
    sa_best, _ = simulated_annealing(sim, KEY, num_sims=128, num_steps=256)
    assert float(ga_best) >= 0.95 * float(sa_best)


def test_coloring_petersen_chromatic_3():
    sim3 = GraphColoringSimulator(PETERSEN, 10, 3)
    conflicts, colors = color_graph(sim3, KEY, num_sims=256, num_sweeps=32)
    assert float(conflicts) == 0.0
    # verify the coloring is proper edge by edge
    c = np.asarray(colors)
    for i, j, _ in PETERSEN:
        assert c[int(i)] != c[int(j)]
    # 2 colors cannot properly color Petersen (odd cycles)
    sim2 = GraphColoringSimulator(PETERSEN, 10, 2)
    conflicts2, _ = color_graph(sim2, KEY, num_sims=256, num_sweeps=32)
    assert float(conflicts2) > 0.0


def test_chromatic_upper_bound_petersen():
    k = chromatic_upper_bound(GraphColoringSimulator, PETERSEN, 10, KEY,
                              k_max=6)
    assert k == 3


def test_coloring_obj_counts_monochromatic_edges():
    sim = GraphColoringSimulator(K4, 4, 2)
    # all nodes same color -> all 6 edges conflict
    assert float(sim.obj(jnp.zeros((1, 4), jnp.int32))[0]) == 6.0
    # 2-2 split -> the 2 within-pair edges conflict
    assert float(sim.obj(jnp.asarray([[0, 0, 1, 1]]))[0]) == 2.0


def test_knapsack_dp_vs_bruteforce():
    rng = np.random.default_rng(5)
    values = rng.integers(1, 50, 12).astype(np.float64)
    weights = rng.integers(1, 20, 12)
    cap = 40
    best = max(
        (float(values[list(s)].sum()) for s in _powerset(12)
         if weights[list(s)].sum() <= cap), default=0.0)
    assert knapsack_dp(values, weights, cap) == best


def _powerset(n):
    for mask in range(1 << n):
        yield [i for i in range(n) if mask >> i & 1]


def test_knapsack_heuristic_near_dp_optimum():
    rng = np.random.default_rng(11)
    n = 64
    values = rng.integers(1, 100, n).astype(np.float64)
    weights = rng.integers(1, 50, n)
    cap = int(weights.sum() // 3)
    opt = knapsack_dp(values, weights, cap)
    sim = KnapsackSimulator(values, weights, cap)
    val, x = knapsack_solve(sim, KEY, num_sims=256, num_generations=64)
    assert float(np.asarray(x) @ weights) <= cap
    assert float(val) >= 0.99 * opt, (float(val), opt)
    # flip_gains must equal the exact objective delta
    xs = sim.rand_xs(KEY, 4)
    gains = np.asarray(sim.flip_gains(xs))
    base = np.asarray(sim.obj(xs))
    for s in range(4):
        for i in range(0, n, 7):
            x2 = np.asarray(xs).copy()
            x2[s, i] = 1 - x2[s, i]
            delta = float(sim.obj(jnp.asarray(x2))[s]) - base[s]
            np.testing.assert_allclose(gains[s, i], delta, rtol=1e-4, atol=1e-4)


def test_number_partition_perfect_split():
    # constructed instance with a perfect partition: [4,5,6,7,8] vs [30]
    numbers = np.array([30, 4, 5, 6, 7, 8], np.float64)
    sim = NumberPartitionSimulator(numbers)
    best, x = simulated_annealing(sim, KEY, num_sims=256, num_steps=256)
    assert float(best) == 0.0
    assert float(sim.imbalance(x[None])[0]) == 0.0
    best_ga, _ = genetic_algorithm(sim, KEY, pop_size=128, num_generations=16)
    assert float(best_ga) == 0.0


def test_min_vertex_cover_petersen():
    size, cover = min_vertex_cover(PETERSEN, 10, KEY)
    assert float(size) == 6.0
    c = np.asarray(cover)
    for i, j, _ in PETERSEN:   # every edge covered
        assert c[int(i)] + c[int(j)] >= 1


def test_problem_registry():
    assert Problem.maxcut in supported_problems()
    sim = make_simulator('maxcut', edges=K4, num_nodes=4)
    assert float(sim.obj(jnp.asarray([[0., 0., 1., 1.]]))[0]) == 4.0
    sim_c = make_simulator(Problem.graph_coloring, edges=K4, num_nodes=4,
                           num_colors=4)
    assert isinstance(sim_c, GraphColoringSimulator)
    # vrp gained a native simulator (rlsolver/vrp.py) — missing kwargs now
    # fail with a clear TypeError naming what is expected
    with pytest.raises(TypeError, match='instance'):
        make_simulator(Problem.vrp)
    # every reference Problem enum member now has a native simulator
    assert supported_problems() == set(Problem)


def test_exact_wrappers_raise_cleanly_when_backend_absent():
    for fn, args in ((gurobi_solve_maxcut, (K4, 4)),
                     (scip_solve_maxcut, (K4, 4))):
        try:
            val, x = fn(*args)
        except SolverUnavailable as e:
            assert 'not installed' in str(e)
        else:   # backend actually present: verify against the known optimum
            assert val == 4.0


def test_sdp_maxcut_gw_quality():
    """Burer-Monteiro SDP + GW rounding: exact on K4, >=0.95x SA on BA-64
    (GW guarantee is 0.878x OPT; SA is near-opt on these sizes)."""
    from elegantrl_tpu.rlsolver import sdp_maxcut
    cut, x = sdp_maxcut(K4, 4, KEY)
    assert float(cut) == 4.0
    edges = generate_graph('BA', 64, seed=3)
    sim = MaxCutSimulator(edges, 64)
    sdp_cut, sdp_x = sdp_maxcut(edges, 64, KEY)
    sa_cut, _ = simulated_annealing(sim, KEY, num_sims=128, num_steps=256)
    assert float(sim.obj(sdp_x[None])[0]) == float(sdp_cut)  # consistent
    assert float(sdp_cut) >= 0.95 * float(sa_cut), (float(sdp_cut), float(sa_cut))


def test_qaoa_maxcut_small_graphs():
    """Exact statevector QAOA: finds the optimum cut on small graphs and the
    optimized expectation clearly beats the uniform-state expectation."""
    from elegantrl_tpu.rlsolver import qaoa_maxcut
    # C4 ring: optimum cut 4; uniform expectation = |E| / 2 = 2
    ring = np.array([(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)], np.float64)
    cut, x, exp_c = qaoa_maxcut(ring, 4, KEY, p_layers=3)
    assert float(cut) == 4.0
    assert float(exp_c) > 2.5
    # K4: optimum 4
    cut4, _, _ = qaoa_maxcut(K4, 4, KEY, p_layers=2)
    assert float(cut4) == 4.0


def test_ppo_maxcut_flip_env_and_solver():
    """PPO-on-flip-env maxcut (reference methods/ppo_maxcut.py): the framework
    PPO trained on the node-flip env must come within 10% of greedy local
    search on a small ER graph, and the flip-env reward must equal the true
    cut delta."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from elegantrl_tpu.rlsolver import (MaxCutSimulator, generate_graph,
                                        greedy_local_search, maxcut_flip_env,
                                        ppo_maxcut_solve)

    edges = generate_graph('ER', 24, seed=5)
    sim = MaxCutSimulator(edges, 24)

    # reward == cut delta
    env = maxcut_flip_env(sim, num_steps=10)
    s = env.init(jax.random.key(0))
    for a in (3, 7, 3):
        before = float(sim.obj(s.x[None])[0])
        s, r, term, trunc = env.step(s, jnp.asarray(a), jax.random.key(1))
        after = float(sim.obj(s.x[None])[0])
        assert abs(float(r) - (after - before)) < 1e-4
        assert not bool(term)

    ls_obj, _ = greedy_local_search(sim, jax.random.key(0), num_sims=256,
                                    num_iters=48)
    # 64 envs / 400k steps: passes with margin on seeds 0-1 on both GAE
    # paths (32/200k sat exactly at the 0.9 boundary and flipped with the
    # associative-GAE bit pattern)
    out = ppo_maxcut_solve(sim, seed=0, num_envs=64, break_step=400_000)
    assert out['best_cut'] >= 0.9 * float(ls_obj), (out['best_cut'], ls_obj)
    # best_x reproduces best_cut
    assert abs(float(sim.obj(jnp.asarray(out['best_x'])[None])[0])
               - out['best_cut']) < 1e-4


def test_runcsp_amortized_maxcut():
    """RUN-CSP-style recurrent GNN (reference Env_RUN-CSP.py slot ships no
    method): trained once on a BA-pool, the amortized forward unroll on an
    UNSEEN graph must reach >= 92% of greedy local search."""
    import jax
    import numpy as np
    from elegantrl_tpu.rlsolver import (MaxCutSimulator, generate_graph,
                                        greedy_local_search)
    from elegantrl_tpu.rlsolver.runcsp import make_runcsp, runcsp_solve
    from elegantrl_tpu.rlsolver.graphs import edges_to_adjacency

    pool = np.stack([edges_to_adjacency(generate_graph('BA', 24, seed=s), 24)
                     for s in range(16)])
    # steps deliberately != pool size: a mis-broadcast pairing the unroll
    # axis with the graph axis crashed/mistrained here (caught in review)
    init_fn, train_fn = make_runcsp(pool, dim=32, steps=24)
    state = init_fn(jax.random.PRNGKey(0))
    state, loss = train_fn(state, jax.random.PRNGKey(1), 300)
    assert np.isfinite(float(loss))

    edges = generate_graph('BA', 24, seed=77)           # held out
    sim = MaxCutSimulator(edges, 24)
    adj = edges_to_adjacency(edges, 24)
    best, x = runcsp_solve(state[0], adj, key=jax.random.PRNGKey(2))
    ls_obj, _ = greedy_local_search(sim, jax.random.key(3), num_sims=256,
                                    num_iters=48)
    np.testing.assert_allclose(float(sim.obj(x[None])[0]), best, rtol=1e-5)
    assert best >= 0.92 * float(ls_obj), (best, float(ls_obj))


def test_graph_trs_pretrains_and_transfers_to_l2a():
    """GraphTRS self-supervised pretrain (the reference's L2A depth half,
    L2A/graph_embedding_pretrain.py:48-103): structure losses fall, the
    node-identity head beats chance by far, and embeddings of an UNSEEN
    instance condition l2a_solve to greedy-LS level."""
    from elegantrl_tpu.rlsolver import (
        greedy_local_search, l2a_solve, pretrain_graph_trs)
    from elegantrl_tpu.rlsolver.graphs import edges_to_adjacency
    params, embed, hist = pretrain_graph_trs(
        24, 'ER', num_graphs=32, num_steps=250, batch_size=16, embed_dim=32)
    losses = [h[0] for h in hist]
    accs = [h[1] for h in hist]
    assert losses[-1] < 0.4 * losses[0], hist
    assert accs[-1] > 0.8, hist          # chance = 1/24
    edges = generate_graph('ER', 24, seed=777)   # unseen instance
    adj = jnp.asarray(edges_to_adjacency(edges, 24)[None], jnp.float32)
    emb = embed(params, adj)[0]
    assert bool(jnp.isfinite(emb).all())
    sim = MaxCutSimulator(edges, 24)
    ls, _ = greedy_local_search(sim, jax.random.key(0), num_sims=256,
                                num_iters=48)
    obj, x = l2a_solve(sim, jax.random.key(1), num_chains=128, num_epochs=6,
                       num_transfers=16, num_ls=8, node_embed=emb)
    assert obj >= 0.9 * float(ls), (obj, float(ls))
    np.testing.assert_allclose(float(sim.obj(x[None])[0]), obj)
