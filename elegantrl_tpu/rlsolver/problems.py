"""Problem registry: the reference's ``Problem`` enum mapped to simulators.

Mirrors ``rlsolver/methods/config.py:17-30`` (GraphType at :8-11).  Each
supported problem maps to a batched TPU simulator + default solver;
``minimum_vertex_cover`` is solved by complement of the MIS simulator
(a set is a vertex cover iff its complement is independent).  Problems the
reference declares but only routes to external MILP solvers keep that
contract here via :mod:`.exact` (which raises cleanly when the backend is
absent).
"""

from __future__ import annotations

from enum import Enum, unique
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@unique
class GraphType(Enum):
    BA = "BA"   # barabasi_albert
    ER = "ER"   # erdos_renyi
    PL = "PL"   # powerlaw


@unique
class Problem(Enum):
    maxcut = "maxcut"
    graph_partitioning = "graph_partitioning"
    number_partitioning = "number_partitioning"
    minimum_vertex_cover = "minimum_vertex_cover"
    bilp = "bilp"
    maximum_independent_set = "maximum_independent_set"
    knapsack = "knapsack"
    set_cover = "set_cover"
    graph_coloring = "graph_coloring"
    portfolio_allocation = "portfolio_allocation"
    tnco = "tnco"
    vrp = "vrp"
    tsp = "tsp"


# problems with a native batched simulator in this package
_SIMULATED = {
    Problem.maxcut, Problem.maximum_independent_set, Problem.tsp,
    Problem.graph_coloring, Problem.knapsack, Problem.number_partitioning,
    Problem.minimum_vertex_cover, Problem.graph_partitioning,
    Problem.set_cover, Problem.bilp, Problem.portfolio_allocation,
    Problem.vrp, Problem.tnco,
}


def supported_problems() -> set:
    return set(_SIMULATED)


_REQUIRED_KWARGS = {
    Problem.maxcut: ('edges', 'num_nodes'),
    Problem.maximum_independent_set: ('edges', 'num_nodes'),
    Problem.minimum_vertex_cover: ('edges', 'num_nodes'),
    Problem.graph_coloring: ('edges', 'num_nodes', 'num_colors'),
    Problem.knapsack: ('values', 'weights', 'capacity'),
    Problem.number_partitioning: ('numbers',),
    Problem.tsp: ('cities',),
    Problem.graph_partitioning: ('edges', 'num_nodes'),
    Problem.set_cover: ('membership',),
    Problem.bilp: ('c', 'a', 'b'),
    Problem.vrp: ('instance',),
    Problem.portfolio_allocation: ('mu', 'sigma', 'k'),
    Problem.tnco: ('bonds_log2',),
}


def make_simulator(problem: Problem, **kwargs):
    """Build the batched simulator for ``problem``.  kwargs are the
    problem's natural parameters (edges/num_nodes, values/weights/capacity,
    numbers, cities, num_colors, instance, ...)."""
    if isinstance(problem, str):
        problem = Problem(problem)
    missing = [k for k in _REQUIRED_KWARGS.get(problem, ()) if k not in kwargs]
    if missing:
        raise TypeError(
            f"make_simulator({problem}) missing required kwargs {missing}; "
            f"expects {_REQUIRED_KWARGS[problem]}")
    if problem == Problem.maxcut:
        from .maxcut import MaxCutSimulator
        return MaxCutSimulator(kwargs['edges'], kwargs['num_nodes'])
    if problem == Problem.maximum_independent_set:
        from .mis import MISSimulator
        return MISSimulator(kwargs['edges'], kwargs['num_nodes'],
                            penalty=kwargs.get('penalty', 2.0))
    if problem == Problem.minimum_vertex_cover:
        # complement-space wrapper: solutions/objectives are in COVER space
        # (the raw MIS simulator would hand back independent sets)
        from .mis import VertexCoverSimulator
        return VertexCoverSimulator(kwargs['edges'], kwargs['num_nodes'],
                                    penalty=kwargs.get('penalty', 2.0))
    if problem == Problem.graph_coloring:
        from .coloring import GraphColoringSimulator
        return GraphColoringSimulator(kwargs['edges'], kwargs['num_nodes'],
                                      kwargs['num_colors'])
    if problem == Problem.knapsack:
        from .knapsack import KnapsackSimulator
        return KnapsackSimulator(kwargs['values'], kwargs['weights'],
                                 kwargs['capacity'],
                                 penalty=kwargs.get('penalty'))
    if problem == Problem.number_partitioning:
        from .numberpart import NumberPartitionSimulator
        return NumberPartitionSimulator(kwargs['numbers'])
    if problem == Problem.tsp:
        from .tsp import TSPSimulator
        return TSPSimulator(kwargs['cities'])
    if problem == Problem.graph_partitioning:
        from .partition import GraphPartitionSimulator
        return GraphPartitionSimulator(kwargs['edges'], kwargs['num_nodes'],
                                       penalty=kwargs.get('penalty', 2.0))
    if problem == Problem.set_cover:
        from .setcover import SetCoverSimulator
        return SetCoverSimulator(kwargs['membership'],
                                 penalty=kwargs.get('penalty'))
    if problem == Problem.bilp:
        from .bilp import BILPSimulator
        return BILPSimulator(kwargs['c'], kwargs['a'], kwargs['b'],
                             penalty=kwargs.get('penalty'))
    if problem == Problem.vrp:
        from .vrp import VRPTWSimulator
        return VRPTWSimulator(kwargs['instance'])
    if problem == Problem.tnco:
        from .tnco import TNCOSimulator
        return TNCOSimulator(kwargs['bonds_log2'],
                             open_log2=kwargs.get('open_log2'))
    if problem == Problem.portfolio_allocation:
        from .portfolio import PortfolioSimulator
        return PortfolioSimulator(kwargs['mu'], kwargs['sigma'], kwargs['k'],
                                  risk_lambda=kwargs.get('risk_lambda', 1.0),
                                  penalty=kwargs.get('penalty'))
    raise NotImplementedError(
        f"{problem} has no native simulator; the reference routes it to an "
        f"external MILP solver — see elegantrl_tpu.rlsolver.exact for the "
        f"optional Gurobi/SCIP wrappers.")


def min_vertex_cover(edges: np.ndarray, num_nodes: int, key: jax.Array,
                     num_sims: int = 512, num_sweeps: int = 32
                     ) -> Tuple[jax.Array, jax.Array]:
    """Minimum vertex cover via MIS complement: |MVC| = N - |MIS| and the
    cover is the complement of the independent set."""
    from .mis import greedy_mis
    sim = make_simulator(Problem.maximum_independent_set,
                         edges=edges, num_nodes=num_nodes)
    mis_size, mis_x = greedy_mis(sim, key, num_sims=num_sims,
                                 num_sweeps=num_sweeps)
    cover = 1.0 - mis_x
    return jnp.asarray(num_nodes, jnp.float32) - mis_size, cover
