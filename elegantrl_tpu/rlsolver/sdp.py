"""MaxCut SDP relaxation via low-rank Burer-Monteiro + hyperplane rounding.

Capability match for the reference's ``rlsolver/methods/sdp.py`` (108 LoC,
cvxpy interior-point solve of the Goemans-Williamson SDP + sign rounding).
cvxpy isn't in this image — and an interior-point SDP is the wrong shape for
a TPU anyway.  TPU-native redesign: solve the same relaxation

    max 1/4 sum_ij W_ij (1 - <v_i, v_j>),   ||v_i|| = 1

in its low-rank Burer-Monteiro form V in R^{n x k} (k ~ sqrt(2n) suffices
for the SDP optimum) by Riemannian projected gradient ascent — each step is
one (n, n) x (n, k) MXU matmul + row normalization — then round with many
random hyperplanes at once (one more matmul) and keep the best cut.
Recovers the GW 0.878-approximation guarantee quality in practice.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import edges_to_adjacency


def sdp_maxcut(edges: np.ndarray, num_nodes: int, key: jax.Array,
               rank: int = 0, num_steps: int = 300, lr: float = 0.1,
               num_roundings: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Returns (best_cut, x) with x in {0,1}^n.

    ``rank=0`` -> ceil(sqrt(2n)) (the Burer-Monteiro exactness threshold).
    """
    n = int(num_nodes)
    k = rank or max(2, int(math.ceil(math.sqrt(2.0 * n))))
    adj = jnp.asarray(edges_to_adjacency(edges, num_nodes))   # (n, n) sym

    k_init, k_round = jax.random.split(key)
    v = jax.random.normal(k_init, (n, k))
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)

    def ascent(v, _):
        # d/dV of -1/4 tr(W V V^T) = -1/2 W V; project onto the sphere
        # tangent (remove radial component) and retract by normalization
        g = -0.5 * (adj @ v)
        g = g - jnp.sum(g * v, axis=1, keepdims=True) * v
        v = v + lr * g
        return v / jnp.linalg.norm(v, axis=1, keepdims=True), None

    v, _ = jax.lax.scan(ascent, v, None, length=num_steps)

    # GW rounding: many random hyperplanes in one (n, k) x (k, R) matmul
    g = jax.random.normal(k_round, (k, num_roundings))
    xs = (v @ g > 0).astype(jnp.float32).T                    # (R, n)
    ax = xs @ adj
    cuts = jnp.sum(ax * (1.0 - xs), axis=-1)
    i = jnp.argmax(cuts)
    return cuts[i], xs[i]
