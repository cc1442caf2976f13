"""VRPTW (Solomon) simulator + solver correctness.

The reference ships Solomon data (rlsolver/data/solomon-instances/) and
declares Problem.vrp (methods/config.py:17-30) without a native solver;
here both the format and a batched time-aware greedy solver are covered.
"""
import os

import jax
import numpy as np

from elegantrl_tpu.rlsolver import (
    VRPTWSimulator, vrptw_solve, random_vrptw, Problem, make_simulator,
)
from elegantrl_tpu.rlsolver.graphs import (
    read_solomon, write_solomon, data_path,
)

_REF_C101 = '/root/reference/rlsolver/data/solomon-instances/c101.txt'


def _validate(inst, tour):
    """Host-side independent checker: visit counts, capacity, windows."""
    demand, ready = inst['demand'], inst['ready']
    due, service = inst['due'], inst['service']
    xy = np.asarray(inst['xy'])
    dist = lambda a, b: float(np.hypot(*(xy[a] - xy[b])))
    seen = set()
    pos, clock, cap = 0, 0.0, inst['capacity']
    for node in np.asarray(tour).tolist():
        if node == 0:
            pos, clock, cap = 0, 0.0, inst['capacity']
            continue
        assert node not in seen, f"customer {node} visited twice"
        seen.add(node)
        start = max(clock + dist(pos, node), ready[node])
        assert start <= due[node] + 1e-4, f"window violated at {node}"
        cap -= demand[node]
        assert cap >= -1e-6, f"capacity violated at {node}"
        clock = start + service[node]
        pos = node
    assert seen == set(range(1, len(xy))), "not all customers served"


def test_solomon_roundtrip_and_bundled():
    inst = read_solomon(data_path('rand24_vrptw.txt'))
    assert inst['xy'].shape == (25, 2) and inst['num_vehicles'] == 6
    out = '/tmp/solomon_rt.txt'
    write_solomon(out, inst)
    back = read_solomon(out)
    assert np.allclose(back['xy'], inst['xy'])
    assert np.allclose(back['due'], inst['due'])
    os.remove(out)


def test_vrptw_solver_feasible_on_synthetic():
    inst = random_vrptw(20, seed=2, num_vehicles=8)
    d, tour, veh = vrptw_solve(inst, jax.random.PRNGKey(0), num_sims=128)
    assert np.isfinite(d) and veh <= 8
    _validate(inst, tour)


def test_vrptw_registry():
    inst = random_vrptw(10, seed=3)
    sim = make_simulator(Problem.vrp, instance=inst)
    assert isinstance(sim, VRPTWSimulator)
    tours = sim.construct(jax.random.PRNGKey(1), 32)
    assert bool(sim.is_complete(tours).any())


def test_vrptw_near_optimal_on_reference_c101():
    """On the real Solomon c101 (published optimum 827.3 / 10 vehicles)
    the batched time-aware greedy must stay within 10% at the optimal
    vehicle count."""
    if not os.path.exists(_REF_C101):
        import pytest
        pytest.skip("reference Solomon data not mounted")
    inst = read_solomon(_REF_C101)
    d, tour, veh = vrptw_solve(inst, jax.random.PRNGKey(0), num_sims=512)
    _validate(inst, tour)
    assert veh == 10
    assert d <= 827.3 * 1.10, f"gap too large: {d}"
