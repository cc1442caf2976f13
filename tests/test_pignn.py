"""PI-GNN (physics-inspired GNN QUBO solver) — fills the reference's
``rlsolver/envs/Env_PI-GNN.py`` slot with an actual method (the reference
ships only a duplicated simulator file under that name)."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.rlsolver import (
    MaxCutSimulator, MISSimulator, generate_graph, maxcut_qubo, mis_qubo,
    pignn_maxcut, pignn_minimize, pignn_mis, simulated_annealing,
)
from elegantrl_tpu.rlsolver.pignn import normalized_adjacency

KEY = jax.random.key(3)


def ring_edges(n):
    return np.array([(i, (i + 1) % n, 1.0) for i in range(n)])


def test_qubo_energy_matches_objectives():
    edges, n = generate_graph('BA', 24, seed=1), 24
    sim = MaxCutSimulator(edges, n)
    mis = MISSimulator(edges, n, penalty=2.0)
    xs = sim.rand_xs(KEY, 16)
    q_cut = maxcut_qubo(sim.adj)
    q_mis = mis_qubo(mis.adj, penalty=2.0)
    e_cut = jnp.einsum('si,ij,sj->s', xs, q_cut, xs)
    e_mis = jnp.einsum('si,ij,sj->s', xs, q_mis, xs)
    np.testing.assert_allclose(np.asarray(e_cut), -np.asarray(sim.obj(xs)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_mis), -np.asarray(mis.obj(xs)),
                               rtol=1e-5, atol=1e-4)


def test_normalized_adjacency_rows_bounded():
    edges, n = generate_graph('ER', 16, seed=0), 16
    a_hat = normalized_adjacency(MaxCutSimulator(edges, n).adj)
    assert a_hat.shape == (n, n)
    # symmetric normalization keeps the spectral radius <= 1
    eig = np.linalg.eigvalsh(np.asarray(a_hat))
    assert eig.max() <= 1.0 + 1e-5


def test_pignn_even_ring_maxcut_with_polish():
    # Even rings are the canonical *pure* PI-GNN failure (GCN smoothing
    # anti-correlates with the cut; Angelini & Ricci-Tersenghi 2023) —
    # the default local-search polish must recover the optimum n.
    n = 16
    sim = MaxCutSimulator(ring_edges(n), n)
    cut, x = pignn_maxcut(sim, KEY, num_replicas=8, num_steps=300,
                          polish_sweeps=16)
    assert x.shape == (n,)
    # local search converges to a (possibly non-global) local optimum;
    # 0.875·n means at most one residual defect pair on the ring
    assert float(cut) >= 0.875 * n


def test_pignn_near_sa_on_ba_graph():
    edges, n = generate_graph('BA', 48, seed=2), 48
    sim = MaxCutSimulator(edges, n)
    best_sa, _ = simulated_annealing(sim, KEY, num_sims=128, num_steps=512)
    pure, _ = pignn_maxcut(sim, KEY, num_replicas=8, num_steps=1000,
                           polish_sweeps=0)
    polished, _ = pignn_maxcut(sim, KEY, num_replicas=8, num_steps=1000)
    assert float(pure) >= 0.70 * float(best_sa)
    assert float(polished) >= 0.90 * float(best_sa)


def test_pignn_mis_independent_and_nontrivial():
    edges, n = generate_graph('ER', 32, seed=4), 32
    sim = MISSimulator(edges, n, penalty=2.0)
    obj, x = pignn_mis(sim, KEY, num_replicas=8, num_steps=300)
    assert float(sim.num_conflicts(x[None, :])[0]) == 0.0
    assert float(obj) >= 3.0


def test_pignn_minimize_respects_replicas():
    edges, n = generate_graph('BA', 20, seed=5), 20
    sim = MaxCutSimulator(edges, n)
    q = maxcut_qubo(sim.adj)
    e1, x1 = pignn_minimize(q, sim.adj, KEY, num_replicas=1, num_steps=100)
    e8, x8 = pignn_minimize(q, sim.adj, KEY, num_replicas=8, num_steps=100)
    assert x1.shape == x8.shape == (n,)
    assert float(e8) <= float(e1)  # more replicas can only improve the best
