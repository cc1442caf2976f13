"""Tensor-network contraction ordering: exactness vs an independent host
evaluator, matrix-chain DP optimality, and solver quality."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elegantrl_tpu.rlsolver import (
    TNCOSimulator, tnco_greedy, tnco_anneal, matrix_chain, matrix_chain_dp,
    random_tn, grid_tn, Problem, make_simulator,
)

KEY = jax.random.key(0)


def host_contract_cost(bonds, open_, order_pairs):
    """Independent reference evaluator: explicit per-cluster bond dicts,
    float dims (no log tricks shared with the implementation under test)."""
    n = len(bonds)
    clusters = {i: {i} for i in range(n)}
    owner = list(range(n))
    total = 0.0
    for (u, v) in order_pairs:
        a, b = owner[u], owner[v]
        if a == b:
            continue
        ca, cb = clusters[a], clusters[b]

        def ext(cl):
            d = 1.0
            for i in cl:
                d *= 2.0 ** open_[i]
                for j in range(n):
                    if j not in cl:
                        d *= 2.0 ** bonds[i][j]
            return d

        shared = 1.0
        for i in ca:
            for j in cb:
                shared *= 2.0 ** bonds[i][j]
        total += ext(ca) * ext(cb) / shared
        clusters[a] = ca | cb
        del clusters[b]
        for i in clusters[a]:
            owner[i] = a
    return total


def _edge_order_from_priorities(sim, pri):
    order = np.argsort(np.asarray(pri))
    us = np.asarray(sim.edges_u)[order]
    vs = np.asarray(sim.edges_v)[order]
    return list(zip(us.tolist(), vs.tolist()))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cost_matches_independent_host_evaluator(seed):
    sim = random_tn(7, degree=3, max_log2=2.0, seed=seed)
    bonds = np.asarray(sim.bonds)
    open_ = np.asarray(sim.open)
    xs = sim.rand_xs(jax.random.key(seed), 8)
    got = np.asarray(sim.contraction_cost(xs))
    for s in range(8):
        pairs = _edge_order_from_priorities(sim, xs[s])
        want = host_contract_cost(bonds, open_, pairs)
        assert np.isclose(2.0 ** got[s], want, rtol=1e-4), (s, got[s], want)


def test_matrix_chain_solvers_hit_dp_optimum():
    # strongly skewed dims: the optimum is ~250x better than the worst order
    dims = [32, 2, 64, 4, 128, 2]
    sim = matrix_chain(dims)
    opt = matrix_chain_dp(dims)
    greedy_c, _ = tnco_greedy(sim, KEY, num_sims=64)
    sa_c, sa_x = tnco_anneal(sim, KEY, num_sims=256, num_steps=128)
    assert np.isclose(2.0 ** float(sa_c), opt, rtol=1e-4), \
        (2.0 ** float(sa_c), opt)
    # greedy is a heuristic (provably suboptimal on skewed chains) but must
    # land within 1.5x of the DP optimum here
    assert 2.0 ** float(greedy_c) <= opt * 1.5
    # returned priorities reproduce the returned cost
    assert np.isclose(float(sim.contraction_cost(sa_x[None])[0]),
                      float(sa_c), atol=1e-4)


def test_anneal_beats_brute_force_floor_on_small_net():
    """On a 5-node network every edge-priority order is enumerable: SA must
    find the true optimum over all orderings."""
    sim = random_tn(5, degree=3, max_log2=3.0, seed=7)
    bonds = np.asarray(sim.bonds)
    open_ = np.asarray(sim.open)
    edges = list(zip(np.asarray(sim.edges_u).tolist(),
                     np.asarray(sim.edges_v).tolist()))
    best = min(host_contract_cost(bonds, open_, perm)
               for perm in itertools.permutations(edges))
    sa_c, _ = tnco_anneal(sim, KEY, num_sims=256, num_steps=128)
    assert np.isclose(2.0 ** float(sa_c), best, rtol=1e-4)


def test_grid_order_matters_and_solvers_exploit_it():
    sim = grid_tn(4, 4, bond_log2=2.0)
    xs = sim.rand_xs(KEY, 512)
    rand_best = float(jnp.min(sim.contraction_cost(xs)))
    rand_worst = float(jnp.max(sim.contraction_cost(xs)))
    assert rand_worst - rand_best > 2.0   # >4x spread in multiplies
    greedy_c, _ = tnco_greedy(sim, KEY, num_sims=128)
    assert float(greedy_c) <= rand_best + 1e-4
    peak = float(sim.peak_size(xs[:1])[0])
    assert peak > 0.0


def test_registry_builds_tnco():
    sim0 = grid_tn(2, 2)
    sim = make_simulator(Problem.tnco, bonds_log2=np.asarray(sim0.bonds))
    assert isinstance(sim, TNCOSimulator)
    assert sim.num_edges == 4
