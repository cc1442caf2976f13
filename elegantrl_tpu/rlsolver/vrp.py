"""Capacitated VRP with time windows (Solomon instances), batched on-device.

The reference ships Solomon VRPTW data (``rlsolver/data/solomon-instances/``)
and declares ``Problem.vrp`` in its enum (``methods/config.py:17-30``) but
has no solver for it outside the vendored rl4co stack.  This module closes
that gap TPU-natively: construction is a batched time-window-feasible
greedy — thousands of randomized constructions advance in lockstep under
one ``lax.scan``, each maintaining (position, clock, remaining capacity,
visited mask) and inserting depot returns whenever no customer is feasible.
All feasibility math is dense ``(num_sims, n)`` masking on the VPU; the
distance matrix lives in HBM once.

Solomon semantics: service at customer i may START no later than ``due[i]``
(waiting until ``ready[i]`` is allowed); vehicles leave the depot at time 0
and must return before ``due[0]``; each vehicle carries ``capacity``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VRPTWSimulator:
    """Batched Solomon-instance evaluator + randomized-greedy constructor.

    Tours are ``(num_sims, tour_len)`` int arrays of node ids where 0 is
    the depot (consecutive depot entries are idle padding); ``tour_len =
    2 * n`` is enough for any feasible instance (worst case: one customer
    per vehicle).
    """

    def __init__(self, inst: dict):
        xy = np.asarray(inst['xy'], np.float64)
        self.n = len(xy)                    # customers + depot
        self.tour_len = 2 * self.n
        self.num_vehicles = int(inst['num_vehicles'])
        self.capacity = float(inst['capacity'])
        self.dist = jnp.asarray(
            np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)),
            jnp.float32)
        self.demand = jnp.asarray(inst['demand'], jnp.float32)
        self.ready = jnp.asarray(inst['ready'], jnp.float32)
        self.due = jnp.asarray(inst['due'], jnp.float32)
        self.service = jnp.asarray(inst['service'], jnp.float32)

    @partial(jax.jit, static_argnums=(0, 2))
    def construct(self, key: jax.Array, num_sims: int,
                  noise: float = 0.15, wait_w: float = 0.5,
                  urgency_w: float = 0.1) -> jax.Array:
        """Randomized time-aware greedy: each sim repeatedly visits the
        best time-window-feasible customer scored by
        ``distance + wait_w * wait + urgency_w * slack`` (wait = idle time
        until the window opens; slack = time left until the window closes,
        so urgent customers come first), with ``noise * U[0,1) * mean_dist``
        jitter for diversification; a sim returns to the depot when nothing
        is feasible.  Measured results on the COMMITTED instance
        (rlsolver/data/rand24_vrptw.txt) are in docs/performance.md —
        including the instance-dependence of the scoring terms: on that
        loose-window instance distance-only scoring (wait_w = urgency_w =
        0) measured BETTER (713.8 vs 888.6); on tight clustered windows the
        time-aware terms are what keep constructions feasible.  Real
        Solomon files (c101 etc.) load with ``read_solomon`` unchanged."""
        mean_d = jnp.mean(self.dist)

        def step(carry, key_t):
            pos, clock, cap, visited = carry
            # arrival/start times at every candidate customer
            leg = self.dist[pos]                                 # (S, n)
            arrive = clock[:, None] + leg
            start = jnp.maximum(arrive, self.ready[None, :])
            # must start service before due, fit capacity, be unvisited,
            # and allow returning to the depot before ITS due date
            back_ok = (start + self.service[None, :]
                       + self.dist[:, 0][None, :]) <= self.due[0]
            feasible = ((~visited)
                        & (start <= self.due[None, :])
                        & (self.demand[None, :] <= cap[:, None])
                        & back_ok)
            feasible = feasible.at[:, 0].set(False)
            any_feas = jnp.any(feasible, axis=-1)                # (S,)

            jitter = jax.random.uniform(key_t, leg.shape) * noise * mean_d
            wait = start - arrive
            slack = self.due[None, :] - arrive
            score = jnp.where(feasible,
                              leg + wait_w * wait + urgency_w * slack
                              + jitter, jnp.inf)
            nxt = jnp.argmin(score, axis=-1)                     # (S,)
            nxt = jnp.where(any_feas, nxt, 0)                    # else depot

            new_clock = jnp.where(
                any_feas,
                jnp.take_along_axis(start, nxt[:, None], -1)[:, 0]
                + self.service[nxt],
                0.0)                       # depot return resets the clock
            new_cap = jnp.where(any_feas, cap - self.demand[nxt],
                                self.capacity)
            visited = visited | jax.nn.one_hot(nxt, self.n, dtype=bool)
            return (nxt, new_clock, new_cap, visited), nxt

        S = num_sims
        init = (jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.float32),
                jnp.full(S, self.capacity, jnp.float32),
                jnp.zeros((S, self.n), bool).at[:, 0].set(True))
        _, tours = jax.lax.scan(step, init,
                                jax.random.split(key, self.tour_len))
        return tours.T                                           # (S, L)

    @partial(jax.jit, static_argnums=0)
    def tour_distance(self, tours: jax.Array) -> jax.Array:
        """Total travel distance including the initial depot departure."""
        prev = jnp.concatenate(
            [jnp.zeros((tours.shape[0], 1), tours.dtype), tours[:, :-1]], 1)
        return jnp.sum(self.dist[prev, tours], axis=-1)

    @partial(jax.jit, static_argnums=0)
    def num_vehicles_used(self, tours: jax.Array) -> jax.Array:
        """Depot->customer transitions = vehicles dispatched."""
        prev = jnp.concatenate(
            [jnp.zeros((tours.shape[0], 1), tours.dtype), tours[:, :-1]], 1)
        return jnp.sum((prev == 0) & (tours != 0), axis=-1)

    @partial(jax.jit, static_argnums=0)
    def is_complete(self, tours: jax.Array) -> jax.Array:
        """Every customer visited exactly once."""
        counts = jax.vmap(lambda t: jnp.bincount(t, length=self.n))(tours)
        return jnp.all(counts[:, 1:] == 1, axis=-1)

    def best(self, tours: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(distance, tour) of the shortest complete solution within the
        vehicle budget (inf if none)."""
        ok = self.is_complete(tours) & (
            self.num_vehicles_used(tours) <= self.num_vehicles)
        dists = jnp.where(ok, self.tour_distance(tours), jnp.inf)
        i = jnp.argmin(dists)
        return dists[i], tours[i]


def random_vrptw(n_customers: int, seed: int = 0, num_vehicles: int = 8,
                 capacity: float = 100.0) -> dict:
    """Synthetic Solomon-style instance (wide, satisfiable time windows)."""
    rng = np.random.default_rng(seed)
    xy = np.vstack([[50.0, 50.0],
                    rng.uniform(0, 100, (n_customers, 2))])
    demand = np.concatenate([[0.0], rng.integers(5, 25, n_customers)])
    ready = np.concatenate([[0.0], rng.uniform(0, 600, n_customers)])
    due = np.concatenate([[2000.0], ready[1:] + rng.uniform(300, 900,
                                                            n_customers)])
    service = np.concatenate([[0.0], np.full(n_customers, 10.0)])
    return {'name': f'rand{n_customers}', 'num_vehicles': num_vehicles,
            'capacity': capacity, 'xy': xy, 'demand': demand,
            'ready': ready, 'due': due, 'service': service}


def vrptw_solve(inst: dict, key: jax.Array, num_sims: int = 512,
                noise: float = 0.15) -> Tuple[float, np.ndarray, int]:
    """Best of ``num_sims`` randomized time-aware greedy constructions.
    Returns (total distance, tour node sequence, vehicles used)."""
    sim = VRPTWSimulator(inst)
    tours = sim.construct(key, num_sims, noise=noise)
    dist, tour = sim.best(tours)
    vehicles = int(sim.num_vehicles_used(tour[None])[0])
    return float(dist), np.asarray(tour), vehicles
