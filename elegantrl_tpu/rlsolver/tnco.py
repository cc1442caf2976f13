"""Tensor-network contraction ordering (TNCO): batched simulator + solvers.

Capability match for the reference's ``Problem.tnco``
(``rlsolver/methods/config.py:28``).  The reference ships an L2A driver for
TNCO (``rlsolver/envs/env_l2a_TNCO.py:64`` builds ``SimulatorTensorNetContract``
over Sycamore circuit node lists) but the simulator module it imports is
absent from the tree — the method cannot run.  This is a from-scratch
TPU-native design of the same capability:

* A tensor network is an ``(N, N)`` symmetric matrix of **log2 bond
  dimensions** (0 = no bond; parallel bonds add in log space) plus optional
  per-node open legs.  Everything stays in log2 so 50+-qubit circuit costs
  never overflow.
* A candidate contraction order is a real-valued **priority per edge**
  (the reference's L2A encoding): edges are contracted in priority order,
  each contraction merging the two endpoint *clusters* and summing over all
  bonds between them at once.  Evaluation is one ``lax.scan`` over the
  priority-sorted edge list carrying a cluster log-dim matrix — O(N) vector
  work per step, vmapped over thousands of candidates.
* Objective = −log2(total scalar multiplications) (maximize, matching the
  other simulators' ``if_maximize`` convention); the peak intermediate
  tensor size is tracked alongside.

Solvers: batched randomized greedy construction (min-cost pair per step
with Gumbel tie noise — the ``opt_einsum``-style baseline) and batched
simulated annealing over edge priorities.  Exactness is verified against an
independent host-side evaluator and classic matrix-chain DP in
``tests/test_tnco.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30   # log2-space "impossible" marker


class TNCOSimulator:
    """Batched contraction-cost evaluation for one tensor network."""

    def __init__(self, bonds_log2: np.ndarray,
                 open_log2: Optional[np.ndarray] = None):
        bonds = np.asarray(bonds_log2, np.float32)
        assert bonds.ndim == 2 and bonds.shape[0] == bonds.shape[1]
        assert np.allclose(bonds, bonds.T), "bond matrix must be symmetric"
        assert np.all(np.diag(bonds) == 0.0), "no self-bonds"
        self.num_nodes = int(bonds.shape[0])
        iu, ju = np.nonzero(np.triu(bonds, 1))
        self.edges_u = jnp.asarray(iu, jnp.int32)
        self.edges_v = jnp.asarray(ju, jnp.int32)
        self.num_edges = int(len(iu))
        self.bonds = jnp.asarray(bonds)
        if open_log2 is None:
            open_log2 = np.zeros(self.num_nodes, np.float32)
        self.open = jnp.asarray(np.asarray(open_log2, np.float32))
        self.if_maximize = True

    def rand_xs(self, key: jax.Array, num_sims: int) -> jax.Array:
        """Candidate edge priorities, (num_sims, num_edges)."""
        return jax.random.normal(key, (num_sims, self.num_edges))

    def _contract_one(self, priorities: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        """(E,) priorities -> (log2 total multiplies, log2 peak tensor)."""
        order = jnp.argsort(priorities)
        us, vs = self.edges_u[order], self.edges_v[order]

        def step(carry, uv):
            C, open_, labels, total, peak = carry
            u, v = uv
            lu, lv = labels[u], labels[v]
            already = lu == lv          # internalized by an earlier merge
            shared = C[lu, lv]
            ru = jnp.sum(C[lu]) + open_[lu]
            rv = jnp.sum(C[lv]) + open_[lv]
            cost = ru + rv - shared     # log2 multiply count of this step
            out_sz = ru + rv - 2.0 * shared
            total2 = jnp.logaddexp2(total, cost)
            peak2 = jnp.maximum(peak, out_sz)
            row = C[lu] + C[lv]
            row = row.at[lu].set(0.0).at[lv].set(0.0)
            C2 = C.at[lu, :].set(row).at[:, lu].set(row)
            C2 = C2.at[lv, :].set(0.0).at[:, lv].set(0.0)
            open2 = open_.at[lu].add(open_[lv]).at[lv].set(0.0)
            labels2 = jnp.where(labels == lv, lu, labels)
            keep = lambda new, old: jnp.where(already, old, new)
            return (keep(C2, C), keep(open2, open_), keep(labels2, labels),
                    keep(total2, total), keep(peak2, peak)), None

        n = self.num_nodes
        init = (self.bonds, self.open, jnp.arange(n, dtype=jnp.int32),
                jnp.float32(_NEG), jnp.float32(_NEG))
        (C, open_, labels, total, peak), _ = jax.lax.scan(
            step, init, (us, vs), length=self.num_edges)
        return total, peak

    @partial(jax.jit, static_argnums=0)
    def contraction_cost(self, xs: jax.Array) -> jax.Array:
        """(S, E) priorities -> (S,) log2 total scalar multiplications."""
        return jax.vmap(lambda p: self._contract_one(p)[0])(xs)

    @partial(jax.jit, static_argnums=0)
    def peak_size(self, xs: jax.Array) -> jax.Array:
        """(S, E) priorities -> (S,) log2 largest intermediate tensor."""
        return jax.vmap(lambda p: self._contract_one(p)[1])(xs)

    @partial(jax.jit, static_argnums=0)
    def obj(self, xs: jax.Array) -> jax.Array:
        return -self.contraction_cost(xs)

    def best(self, xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        objs = self.obj(xs)
        i = jnp.argmax(objs)
        return objs[i], xs[i]


def matrix_chain(dims) -> TNCOSimulator:
    """Matrix-chain multiplication as a TNCO instance: matrices
    ``A_i in R^{dims[i] x dims[i+1]}`` in a chain, open legs at the ends.
    Its optimum is computable by the classic O(N^3) DP (`matrix_chain_dp`),
    which makes it the canonical exactness fixture."""
    n = len(dims) - 1
    bonds = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        bonds[i, i + 1] = bonds[i + 1, i] = np.log2(dims[i + 1])
    open_ = np.zeros(n, np.float32)
    open_[0] = np.log2(dims[0])
    open_[-1] += np.log2(dims[-1])
    return TNCOSimulator(bonds, open_)


def matrix_chain_dp(dims) -> float:
    """Exact minimum multiply count for a matrix chain (host DP)."""
    n = len(dims) - 1
    m = [[0.0] * n for _ in range(n)]
    for span in range(1, n):
        for i in range(n - span):
            j = i + span
            m[i][j] = min(m[i][k] + m[k + 1][j]
                          + dims[i] * dims[k + 1] * dims[j + 1]
                          for k in range(i, j))
    return float(m[0][n - 1])


def random_tn(num_nodes: int, degree: int = 3, max_log2: float = 3.0,
              seed: int = 0) -> TNCOSimulator:
    """Random connected tensor network: a spanning-tree backbone plus extra
    edges to reach ~``degree * N / 2`` bonds, log2 dims uniform in
    [1, max_log2]."""
    rng = np.random.default_rng(seed)
    bonds = np.zeros((num_nodes, num_nodes), np.float32)

    def add(i, j):
        if i != j and bonds[i, j] == 0.0:
            bonds[i, j] = bonds[j, i] = rng.uniform(1.0, max_log2)

    perm = rng.permutation(num_nodes)
    for a, b in zip(perm[:-1], perm[1:]):       # connected backbone
        add(int(a), int(b))
    extra = max(0, degree * num_nodes // 2 - (num_nodes - 1))
    for _ in range(extra * 4):
        if np.count_nonzero(np.triu(bonds, 1)) >= num_nodes - 1 + extra:
            break
        i, j = rng.integers(0, num_nodes, 2)
        add(int(i), int(j))
    return TNCOSimulator(bonds)


def grid_tn(rows: int, cols: int, bond_log2: float = 1.0) -> TNCOSimulator:
    """Square-grid (PEPS-like) network — the classic hard family where
    contraction order changes the exponent of the cost."""
    n = rows * cols
    bonds = np.zeros((n, n), np.float32)
    for r in range(rows):
        for c in range(cols):
            i = r * cols + c
            if c + 1 < cols:
                bonds[i, i + 1] = bonds[i + 1, i] = bond_log2
            if r + 1 < rows:
                bonds[i, i + cols] = bonds[i + cols, i] = bond_log2
    return TNCOSimulator(bonds)


@partial(jax.jit, static_argnums=(0, 2))
def tnco_greedy(sim: TNCOSimulator, key: jax.Array, num_sims: int = 256,
                noise: float = 0.3) -> Tuple[jax.Array, jax.Array]:
    """Batched randomized greedy: each of ``num_sims`` replicas repeatedly
    contracts the connected cluster pair with the lowest cost + Gumbel
    noise.  Returns (best log2 multiply count, (N-1, 2) merge sequence of
    the best replica)."""
    n = sim.num_nodes
    eye = jnp.eye(n, dtype=bool)

    def one(key):
        def step(carry, key_t):
            C, open_, alive, total = carry
            rows = jnp.sum(C, axis=1) + open_             # (N,) log2 ext dims
            cost = rows[:, None] + rows[None, :] - C       # pairwise contract
            pair = alive[:, None] & alive[None, :] & ~eye
            connected = (C > 0.0) & pair
            # disconnected components fall back to outer products, deferred
            # behind every connected pair by a large log2 penalty
            cand = jnp.where(connected, cost,
                             jnp.where(pair, cost + 1e3, jnp.inf))
            g = noise * jax.random.gumbel(key_t, (n, n))
            idx = jnp.argmin(cand + g)
            a, b = idx // n, idx % n
            step_cost = rows[a] + rows[b] - C[a, b]
            total2 = jnp.logaddexp2(total, step_cost)
            row = C[a] + C[b]
            row = row.at[a].set(0.0).at[b].set(0.0)
            C2 = C.at[a, :].set(row).at[:, a].set(row)
            C2 = C2.at[b, :].set(0.0).at[:, b].set(0.0)
            open2 = open_.at[a].add(open_[b]).at[b].set(0.0)
            alive2 = alive.at[b].set(False)
            # no-op when fewer than 2 clusters remain
            do = jnp.sum(alive) > 1
            keep = lambda new, old: jnp.where(do, new, old)
            return (keep(C2, C), keep(open2, open_), keep(alive2, alive),
                    keep(total2, total)), jnp.where(
                        do, jnp.stack([a, b]), jnp.array([-1, -1]))

        keys = jax.random.split(key, n - 1)
        init = (sim.bonds, sim.open, jnp.ones(n, bool), jnp.float32(_NEG))
        (C, open_, alive, total), merges = jax.lax.scan(step, init, keys)
        return total, merges

    totals, merges = jax.vmap(one)(jax.random.split(key, num_sims))
    i = jnp.argmin(totals)
    return totals[i], merges[i]


@partial(jax.jit, static_argnums=(0, 2, 3))
def tnco_anneal(sim: TNCOSimulator, key: jax.Array, num_sims: int = 512,
                num_steps: int = 256, sigma: float = 0.5,
                temp0: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """Batched simulated annealing over edge priorities: Gaussian proposal,
    Metropolis accept on log2-cost delta with a geometric temperature decay.
    Returns (best log2 multiply count, best (E,) priorities)."""
    k0, k1 = jax.random.split(key)
    xs = sim.rand_xs(k0, num_sims)
    costs = sim.contraction_cost(xs)

    def step(carry, inp):
        xs, costs, best_c, best_x = carry
        key_t, t = inp
        ka, kb = jax.random.split(key_t)
        prop = xs + sigma * jax.random.normal(ka, xs.shape)
        pc = sim.contraction_cost(prop)
        temp = temp0 * (0.02 ** t)          # t in [0,1)
        accept = (pc < costs) | (jax.random.uniform(kb, (num_sims,))
                                 < jnp.exp2((costs - pc) / temp))
        xs = jnp.where(accept[:, None], prop, xs)
        costs = jnp.where(accept, pc, costs)
        i = jnp.argmin(costs)
        better = costs[i] < best_c
        best_c = jnp.where(better, costs[i], best_c)
        best_x = jnp.where(better, xs[i], best_x)
        return (xs, costs, best_c, best_x), None

    i0 = jnp.argmin(costs)
    init = (xs, costs, costs[i0], xs[i0])
    ts = jnp.linspace(0.0, 1.0, num_steps, endpoint=False)
    (xs, costs, best_c, best_x), _ = jax.lax.scan(
        step, init, (jax.random.split(k1, num_steps), ts))
    return best_c, best_x
