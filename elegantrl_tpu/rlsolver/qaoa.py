"""QAOA for MaxCut: exact statevector simulation with autodiff, pure JAX.

Capability match for the reference's ``rlsolver/methods/quantum.py``
(106 LoC, pennylane QAOA circuit).  pennylane isn't in this image; instead
the p-layer QAOA circuit is simulated exactly on the (2^n,) statevector —
feasible for the small instances the reference's script targets (n <= ~16)
— and the variational parameters (gammas, betas) are optimized by GRADIENT
ASCENT THROUGH THE SIMULATION (JAX autodiff differentiates the complex
statevector program end-to-end; pennylane needs parameter-shift rules).

Circuit: |+>^n, then p layers of exp(-i * gamma_l * C) (diagonal cost phase)
and exp(-i * beta_l * X_q) on every qubit (mixer).  Final answer = the best
cut among the 2^n basis states weighted by measurement probability (top-K
most probable states are checked exactly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cut_values(edges: np.ndarray, num_nodes: int) -> jnp.ndarray:
    """(2^n,) cut value of every basis state (bit i = side of node i)."""
    idx = np.arange(1 << num_nodes, dtype=np.int64)
    cuts = np.zeros(1 << num_nodes, np.float32)
    for i, j, w in np.asarray(edges):
        bi = (idx >> int(i)) & 1
        bj = (idx >> int(j)) & 1
        cuts += np.float32(w) * (bi != bj)
    return jnp.asarray(cuts)


def _apply_mixer(psi: jax.Array, beta: jax.Array, num_nodes: int) -> jax.Array:
    """exp(-i beta X_q) on every qubit: psi' = cos(b) psi - i sin(b) X psi."""
    c, s = jnp.cos(beta), jnp.sin(beta)
    for q in range(num_nodes):
        shape = (1 << (num_nodes - q - 1), 2, 1 << q)
        p = psi.reshape(shape)
        flipped = p[:, ::-1, :]
        psi = (c * p - 1j * s * flipped).reshape(-1)
    return psi


def qaoa_maxcut(edges: np.ndarray, num_nodes: int, key: jax.Array,
                p_layers: int = 3, num_steps: int = 150, lr: float = 0.05
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (best_cut, x, expectation).  ``num_nodes <= 16`` (statevector
    is 2^n complex64)."""
    n = int(num_nodes)
    assert n <= 16, "statevector QAOA is for small instances (n <= 16)"
    cuts = _cut_values(edges, n)
    dim = 1 << n
    psi0 = jnp.full(dim, 1.0 / np.sqrt(dim), jnp.complex64)

    def expectation(params):
        gammas, betas = params

        def layer(psi, gb):
            gamma, beta = gb
            psi = psi * jnp.exp(-1j * gamma * cuts)
            return _apply_mixer(psi, beta, n), None

        # scan over layers: reverse-mode AD through an unrolled complex
        # circuit makes XLA's CPU compile blow up exponentially in p
        psi, _ = jax.lax.scan(layer, psi0, (gammas, betas))
        probs = jnp.square(jnp.abs(psi))
        return jnp.sum(probs * cuts), probs

    grad_fn = jax.jit(jax.grad(lambda p: expectation(p)[0]))
    params = (0.1 * jnp.arange(1, p_layers + 1, dtype=jnp.float32),
              0.5 / jnp.arange(1, p_layers + 1, dtype=jnp.float32))
    for _ in range(num_steps):      # plain gradient ASCENT on <C>
        g = grad_fn(params)
        params = jax.tree.map(lambda x, gx: x + lr * gx, params, g)

    exp_c, probs = jax.jit(expectation)(params)
    # measure: check the most probable basis states exactly
    top = jnp.argsort(-probs)[:64]
    best_i = top[jnp.argmax(cuts[top])]
    bits = (best_i >> jnp.arange(n)) & 1
    return cuts[best_i], bits.astype(jnp.float32), exp_c
