"""ECO-DQN train-small/test-big: train on BA-60 graphs, greedy-rollout on
BA-800, vs the greedy-LS baseline (VERDICT r2 next #2 'done' criterion).

The MPNN is size-invariant, so the ECO-DQN paper's protocol (train on small
instances, infer on 10x+ larger ones) carries over.  Prints a result line
per method; append to docs/performance.md + PARITY.md when run on TPU.

Run: python scripts/eco_ba800.py [--train-steps N] [--cpu]
"""
import sys
import time

sys.path.insert(0, '.')

if '--cpu' in sys.argv:
    import os
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax
import numpy as np

from elegantrl_tpu.rlsolver.eco_dqn import (
    build_pool, make_eco_dqn, eco_greedy_solve)
from elegantrl_tpu.rlsolver.graphs import generate_graph, edges_to_adjacency
from elegantrl_tpu.rlsolver.maxcut import MaxCutSimulator


def ba_adj(n, seed):
    return edges_to_adjacency(generate_graph('BA', n, seed=seed), n)


def main():
    train_steps = 4000
    if '--train-steps' in sys.argv:
        train_steps = int(sys.argv[sys.argv.index('--train-steps') + 1])

    # train pool: 32 BA-60 graphs
    pool = build_pool(np.stack([ba_adj(60, s) for s in range(32)]))
    init_fn, round_fn = make_eco_dqn(
        pool, batch=32, features=64, layers=3, replay_cap=8192,
        eps_decay_steps=train_steps // 2, target_freq=100,
        lr_peak=1e-3, lr_final=1e-4, lr_ramp=300, lr_decay=train_steps)
    ts = init_fn(jax.random.PRNGKey(0))
    t0 = time.time()
    chunk = 500
    for i in range(0, train_steps, chunk):
        ts, ms = round_fn(ts, chunk)
        print(f"| eco train {i + chunk}/{train_steps}: loss={float(ms['loss']):.4f} "
              f"best={float(ms['best']):.1f} eps={float(ms['eps']):.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    # test graph: BA-800 (held out)
    test_adj = ba_adj(800, seed=999)
    edges = generate_graph('BA', 800, seed=999)
    sim = MaxCutSimulator(edges, 800)

    t0 = time.time()
    cut_eco, _ = eco_greedy_solve(ts.params, test_adj, num_restarts=32,
                                  key=jax.random.PRNGKey(1))
    eco_s = time.time() - t0

    # time-fair LS baseline: give greedy-LS at least ECO's inference wall
    # (restarts x sweeps scaled until the budget is used)
    t0 = time.time()
    ls_best, tries = -1e9, 0
    k = jax.random.PRNGKey(2)
    while time.time() - t0 < max(eco_s, 5.0):
        k, k1, k2 = jax.random.split(k, 3)
        xs = sim.rand_xs(k1, 256)
        xs = sim.local_search_sweep(xs, k2, num_sweeps=128)
        ls_best = max(ls_best, float(sim.obj(xs).max()))
        tries += 256
    ls_s = time.time() - t0

    print(f"| eco_ba800: ECO-DQN(trained BA-60, {train_steps} steps, "
          f"{train_s:.0f}s) cut={cut_eco:.0f} in {eco_s:.1f}s | "
          f"greedy-LS({tries} restarts x 128 sweeps) cut={ls_best:.0f} "
          f"in {ls_s:.1f}s | "
          f"{'ECO WINS' if cut_eco > ls_best else 'LS wins'}", flush=True)


if __name__ == '__main__':
    main()
