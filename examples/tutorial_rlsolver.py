"""Tutorial: the combinatorial-optimization (rlsolver) layer.

Walks the same workflow as the reference's rlsolver README — generate or
load an instance, run classical baselines, then an RL/MCMC solver, and
write a result file (``rlsolver/methods/util_result.py`` style) — on the
batched TPU simulators.

Run:  python examples/tutorial_rlsolver.py          (~1-2 min on CPU/TPU)

Expected output (seeds fixed; exact numbers vary slightly by backend):

    [maxcut BA-128] random 151  greedy-LS 202  SA 204  MCPG 208
    [tsp rand48 / TSPLIB] tour 5680.1 (2-opt over 256 starts)
    [vrptw rand24 / Solomon] dist 888.6 with 4 vehicles
    [knapsack n=64] GA 1754.5 vs exact DP 1775.0 (DP solves the
        integer-rounded instance, hence the small gap)
    result file written: /tmp/rlsolver_tutorial/maxcut_BA128_mcpg_*.txt
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import numpy as np

from elegantrl_tpu.rlsolver import (
    MaxCutSimulator, generate_graph, random_search, greedy_local_search,
    simulated_annealing, mcpg_solve, write_graph_result,
    read_tsplib, data_path, tsp_solve,
    vrptw_solve, genetic_algorithm,
)
from elegantrl_tpu.rlsolver.graphs import read_solomon
from elegantrl_tpu.rlsolver.knapsack import KnapsackSimulator, knapsack_dp


def main():
    key = jax.random.PRNGKey(0)

    # 1) MaxCut on a synthetic Barabasi-Albert graph: classical baselines
    #    vs MCPG (reference: methods/{greedy,simulated_annealing,mcpg}.py)
    edges = generate_graph('BA', 128, seed=0)
    sim = MaxCutSimulator(edges, 128)
    r, _ = random_search(sim, key, num_sims=512)
    g, _ = greedy_local_search(sim, key, num_sims=512)
    s, _ = simulated_annealing(sim, key, num_sims=512, num_steps=512)
    m, x, _ = mcpg_solve(sim, key, num_chains=512, num_epochs=30)
    print(f"[maxcut BA-128] random {float(r):.0f}  greedy-LS {float(g):.0f}"
          f"  SA {float(s):.0f}  MCPG {float(m):.0f}")

    # 2) TSP from a TSPLIB file (bundled sample; berlin52 etc. load the same)
    cities = read_tsplib(data_path('rand48.tsp'))
    length, _ = tsp_solve(cities, key, num_sims=256, num_iters=64)
    print(f"[tsp rand48 / TSPLIB] tour {length:.1f} (2-opt over 256 starts)")

    # 3) VRPTW from a Solomon-format file (bundled sample; c101 loads the same)
    inst = read_solomon(data_path('rand24_vrptw.txt'))
    dist, _, veh = vrptw_solve(inst, key, num_sims=256)
    print(f"[vrptw rand24 / Solomon] dist {dist:.1f} with {veh} vehicles")

    # 4) Knapsack: memetic GA vs the exact vectorized DP ground truth
    rng = np.random.default_rng(1)
    values = rng.uniform(10, 100, 64)
    weights = rng.uniform(5, 50, 64)
    ksim = KnapsackSimulator(values, weights, capacity=400.0)
    ga_val, _ = genetic_algorithm(ksim, key, pop_size=256, num_generations=48)
    exact = knapsack_dp(values.astype(int), weights.astype(int), 400)
    print(f"[knapsack n=64] GA {float(ga_val):.1f} vs exact DP {float(exact):.1f}")

    # 5) Tensor-network contraction ordering (TNCO): SA over edge priorities
    #    finds the exact matrix-chain DP optimum (reference env_l2a_TNCO.py
    #    imports a simulator absent from its tree — here it runs)
    from elegantrl_tpu.rlsolver import (matrix_chain, matrix_chain_dp,
                                        tnco_anneal)
    dims = [32, 2, 64, 4, 128, 2]
    tsim = matrix_chain(dims)
    sa_log2, _ = tnco_anneal(tsim, key, num_sims=256, num_steps=128)
    print(f"[tnco matrix-chain] SA {2.0 ** float(sa_log2):.0f} multiplies "
          f"vs exact DP {matrix_chain_dp(dims):.0f}")

    # 6) Result file, reference util_result.write_graph_result style
    out = write_graph_result(float(m), 0.0, 128, 'mcpg', np.asarray(x),
                             '/tmp/rlsolver_tutorial/maxcut_BA128')
    print(f"result file written: {out}")


if __name__ == '__main__':
    main()
