"""MaxCut simulator + solver correctness on graphs with known optima."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elegantrl_tpu.rlsolver import (
    MaxCutSimulator, generate_graph, read_graph_txt, write_graph_txt,
    random_search, greedy_local_search, simulated_annealing, mcpg_solve,
)

TRIANGLE = np.array([[0, 1, 1.0], [1, 2, 1.0], [0, 2, 1.0]])
K33 = np.array([[i, 3 + j, 1.0] for i in range(3) for j in range(3)])


def test_obj_values():
    sim = MaxCutSimulator(TRIANGLE, 3)
    xs = jnp.asarray([[0.0, 0.0, 0.0],   # no cut
                      [1.0, 0.0, 0.0],   # cut 2
                      [1.0, 1.0, 0.0]])  # cut 2
    np.testing.assert_allclose(np.asarray(sim.obj(xs)), [0.0, 2.0, 2.0])


def test_flip_gains_match_objective_delta():
    rng = np.random.default_rng(0)
    edges = generate_graph('ER', 20, seed=1)
    sim = MaxCutSimulator(edges, 20)
    xs = sim.rand_xs(jax.random.key(0), 5)
    gains = np.asarray(sim.flip_gains(xs))
    base = np.asarray(sim.obj(xs))
    for s in range(5):
        for i in rng.choice(20, 5, replace=False):
            flipped = np.asarray(xs).copy()
            flipped[s, i] = 1 - flipped[s, i]
            delta = float(sim.obj(jnp.asarray(flipped))[s] - base[s])
            np.testing.assert_allclose(gains[s, i], delta, atol=1e-4)


def test_bipartite_optimum_found():
    sim = MaxCutSimulator(K33, 6)   # optimum = 9 (full bipartition)
    obj, x = greedy_local_search(sim, jax.random.key(0), num_sims=64,
                                 num_iters=32)
    assert float(obj) == 9.0


def test_sa_beats_random():
    edges = generate_graph('BA', 60, seed=2, avg_degree=6)
    sim = MaxCutSimulator(edges, 60)
    r_obj, _ = random_search(sim, jax.random.key(0), num_sims=256, num_rounds=2)
    sa_obj, sa_x = simulated_annealing(sim, jax.random.key(1), num_sims=256,
                                       num_steps=256)
    assert float(sa_obj) >= float(r_obj)
    # solution is consistent with reported objective
    np.testing.assert_allclose(float(sim.obj(sa_x[None])[0]), float(sa_obj))


def test_mcpg_solves_small_graph():
    edges = generate_graph('ER', 30, seed=3)
    sim = MaxCutSimulator(edges, 30)
    ls_obj, _ = greedy_local_search(sim, jax.random.key(0), num_sims=512,
                                    num_iters=64)
    obj, x, _ = mcpg_solve(sim, jax.random.key(1), num_chains=128,
                           num_epochs=8, num_transfers=16, num_ls=8)
    assert obj >= 0.9 * float(ls_obj)


def test_mis_on_known_graphs():
    from elegantrl_tpu.rlsolver import MISSimulator, greedy_mis
    # star K1,5: MIS = the 5 leaves
    star = np.array([[0, i, 1.0] for i in range(1, 6)])
    sim = MISSimulator(star, 6)
    obj, x = greedy_mis(sim, jax.random.key(0), num_sims=64)
    assert float(obj) == 5.0 and float(x[0]) == 0.0
    # K3,3: MIS = 3 (one side)
    sim2 = MISSimulator(K33, 6)
    obj2, x2 = greedy_mis(sim2, jax.random.key(1), num_sims=64)
    assert float(obj2) == 3.0
    assert float(sim2.num_conflicts(x2[None])[0]) == 0.0


def test_isco_matches_or_beats_sa_on_maxcut():
    from elegantrl_tpu.rlsolver import isco_solve
    edges = generate_graph('BA', 60, seed=5, avg_degree=6)
    sim = MaxCutSimulator(edges, 60)
    r_obj, _ = random_search(sim, jax.random.key(0), num_sims=256, num_rounds=2)
    i_obj, i_x = isco_solve(sim, jax.random.key(1), num_sims=256, num_steps=128)
    assert float(i_obj) >= float(r_obj)
    np.testing.assert_allclose(float(sim.obj(i_x[None])[0]), float(i_obj))


def test_s2v_dqn_learns_to_cut():
    from elegantrl_tpu.rlsolver import s2v_dqn_solve
    sim = MaxCutSimulator(K33, 6)   # optimum 9
    obj, x = s2v_dqn_solve(sim, jax.random.key(0), num_epochs=25,
                           embed_dim=16, num_sims=32, horizon=12)
    assert obj >= 8.0, obj  # finds (near-)optimal bipartition
    np.testing.assert_allclose(float(sim.obj(x[None])[0]), obj)


def test_graph_txt_roundtrip(tmp_path):
    edges = generate_graph('ER', 12, seed=4)
    p = str(tmp_path / 'g.txt')
    write_graph_txt(p, 12, edges)
    n, edges2 = read_graph_txt(p)
    assert n == 12 and len(edges2) == len(edges)
    np.testing.assert_allclose(edges2[:, :2], edges[:, :2])


def test_tsp_square_optimal():
    from elegantrl_tpu.rlsolver import TSPSimulator, tsp_solve
    square = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32)
    length, tour = tsp_solve(square, jax.random.key(0), num_sims=16,
                             num_iters=8)
    assert abs(length - 4.0) < 1e-5
    assert sorted(np.asarray(tour).tolist()) == [0, 1, 2, 3]


def test_tsp_two_opt_improves_random():
    from elegantrl_tpu.rlsolver import TSPSimulator, random_cities
    sim = TSPSimulator(random_cities(30, seed=1))
    tours = sim.rand_tours(jax.random.key(0), 64)
    before = float(sim.tour_length(tours).min())
    after_tours = sim.two_opt(tours, num_iters=64)
    after = float(sim.tour_length(after_tours).min())
    assert after < before * 0.75
    # nearest-neighbor + 2-opt beats plain 2-opt-from-random
    nn = sim.two_opt(sim.nearest_neighbor(jax.random.key(1), 64), 64)
    assert float(sim.tour_length(nn).min()) <= after * 1.05
    # tours remain valid permutations
    t = np.sort(np.asarray(after_tours), axis=-1)
    assert (t == np.arange(30)).all()


def test_attention_tsp_learns():
    from elegantrl_tpu.rlsolver import train_attention_tsp, TSPSimulator, random_cities
    import jax.numpy as jnp
    params, opt_state, solve = train_attention_tsp(
        num_cities=10, num_steps=40, num_sims=64, verbose=False)
    cities = random_cities(10, seed=11)
    length, tour = solve(params, jnp.asarray(cities), jax.random.key(0))
    sim = TSPSimulator(cities)
    rnd = float(sim.tour_length(sim.rand_tours(jax.random.key(2), 256)).min())
    assert float(length) < rnd          # beats best-of-256 random tours
    assert sorted(np.asarray(tour).tolist()) == list(range(10))


def test_l2a_solves_small_graph():
    from elegantrl_tpu.rlsolver import l2a_solve
    edges = generate_graph('ER', 30, seed=3)
    sim = MaxCutSimulator(edges, 30)
    ls_obj, _ = greedy_local_search(sim, jax.random.key(0), num_sims=512,
                                    num_iters=64)
    obj, x = l2a_solve(sim, jax.random.key(1), num_chains=128, num_epochs=8,
                       num_transfers=16, num_ls=8)
    assert obj >= 0.9 * float(ls_obj)
    np.testing.assert_allclose(float(sim.obj(x[None])[0]), obj)


def test_tsplib_roundtrip_and_bundled_data(tmp_path):
    from elegantrl_tpu.rlsolver import read_tsplib, write_tsplib, data_path
    cities = np.array([[0.0, 0.0], [3.5, 0.0], [3.5, 2.0], [0.0, 2.0]])
    p = str(tmp_path / 'sq.tsp')
    write_tsplib(p, cities, name='sq')
    assert np.allclose(read_tsplib(p), cities)
    # bundled samples load with the same readers as the reference's
    # gset / tsplib data directories
    n, edges = read_graph_txt(data_path('syn_BA_64.txt'))
    assert n == 64 and len(edges) > 0 and edges.min() >= 0
    bundled = read_tsplib(data_path('rand48.tsp'))
    assert bundled.shape == (48, 2)


def test_tsplib_solve_bundled_instance():
    from elegantrl_tpu.rlsolver import read_tsplib, data_path
    from elegantrl_tpu.rlsolver.tsp import TSPSimulator, tsp_solve
    cities = read_tsplib(data_path('rand48.tsp'))
    length, tour = tsp_solve(cities, jax.random.PRNGKey(0), num_sims=64,
                             num_iters=32)
    sim = TSPSimulator(cities)
    rand_len = float(jnp.mean(sim.tour_length(
        sim.rand_tours(jax.random.PRNGKey(1), 64))))
    assert sorted(np.asarray(tour).tolist()) == list(range(48))
    assert float(length) < 0.7 * rand_len


def test_random_walk_tracks_best(tmp_path):
    """random_walk (reference methods/random_walk.py): unconditional flips,
    best-ever tracked; on a bipartite graph the walk must visit a cut at
    least as good as one random sample batch, and best_x must reproduce
    best_obj."""
    from elegantrl_tpu.rlsolver import (MaxCutSimulator, generate_graph,
                                        random_search, random_walk)
    edges = generate_graph('ER', 16, seed=3)
    sim = MaxCutSimulator(edges, 16)
    best_obj, best_x = random_walk(sim, jax.random.PRNGKey(0),
                                   num_sims=128, num_steps=256)
    assert abs(float(sim.obj(best_x[None])[0]) - float(best_obj)) < 1e-5
    rs_obj, _ = random_search(sim, jax.random.PRNGKey(1), num_sims=128,
                              num_rounds=1)
    assert float(best_obj) >= float(rs_obj) * 0.95


def test_summarize_results(tmp_path):
    """summarize_results aggregates write_graph_result files per
    (instance, alg) like the reference's util_statistics.process_folder."""
    from elegantrl_tpu.rlsolver import summarize_results, write_graph_result
    sol = np.zeros(4, np.int64)
    d = str(tmp_path / 'res')
    for obj, alg in [(10.0, 'greedy'), (12.0, 'greedy'), (11.0, 'sa')]:
        write_graph_result(obj, 1.5, 4, alg, sol, str(tmp_path / 'res' / 'BA_16_ID0'))
    csv_path = str(tmp_path / 'summary.csv')
    summary = summarize_results(d, output_csv=csv_path)
    g = summary[('BA_16_ID0', 'greedy')]
    assert g['count'] == 2 and g['avg_obj'] == 11.0 and g['best_obj'] == 12.0
    assert summary[('BA_16_ID0', 'sa')]['count'] == 1
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith('instance,alg')


def test_isco_mis_matches_greedy():
    """iSCO wired to the MIS flip-gain simulator (reference main_mis.py):
    must return a strictly independent set at least as large as greedy-LS."""
    from elegantrl_tpu.rlsolver import isco_mis_solve
    from elegantrl_tpu.rlsolver.mis import MISSimulator, greedy_mis
    edges = generate_graph('ER', 48, seed=3, avg_degree=6)
    sim = MISSimulator(edges, 48)
    g_obj, _ = greedy_mis(sim, jax.random.key(0), num_sims=128)
    i_obj, i_x = isco_mis_solve(sim, jax.random.key(1), num_sims=256,
                                num_steps=192)
    assert float(sim.num_conflicts(i_x[None])[0]) == 0.0
    assert float(i_obj) >= float(g_obj) - 1.0, (float(i_obj), float(g_obj))


def test_isco_tsp_beats_nearest_neighbor():
    """Permutation-space iSCO (2-opt proposals, locally-balanced weights,
    reference main_tsp.py/env_isco_tsp.py) must beat plain nearest-neighbor
    construction and return a valid tour."""
    from elegantrl_tpu.rlsolver import isco_tsp_solve
    from elegantrl_tpu.rlsolver.tsp import TSPSimulator, random_cities
    sim = TSPSimulator(random_cities(32, seed=2))
    nn_tours = sim.nearest_neighbor(jax.random.key(0), 16)
    nn_best = float(sim.tour_length(nn_tours).min())
    best_len, tour = isco_tsp_solve(sim, jax.random.key(1), num_sims=64,
                                    num_steps=256)
    assert sorted(np.asarray(tour).tolist()) == list(range(32))  # valid perm
    np.testing.assert_allclose(
        float(sim.tour_length(tour[None])[0]), float(best_len), rtol=1e-5)
    assert float(best_len) <= nn_best * 1.02, (float(best_len), nn_best)
