"""Attention-model TSP constructor (Kool et al. style), TPU-native.

Capability match for the reference's vendored ``attention_model/AM_TSP``
tree (1,820 LoC of torch): a transformer encoder over city coordinates and
an autoregressive attention decoder that constructs tours city-by-city,
trained with REINFORCE against a greedy-rollout baseline.

TPU-native form: the encoder is two pre-norm self-attention blocks evaluated
as batched MXU matmuls over (num_sims, N, D); the decoder is a ``lax.scan``
over construction steps with visited-mask attention; training fuses
sample-rollout + greedy-baseline + policy gradient into one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

class AMParams(NamedTuple):
    embed: tuple                 # (w, b) coords -> D
    blocks: tuple                # per block: (wq, wk, wv, wo, w1, b1, w2, b2)
    proj_kv: tuple               # decoder (wk, wv, wq_ctx)
    first_last: jax.Array        # learned placeholder for first/last city (2, D)


def _linear(key, din, dout, scale=None):
    scale = scale if scale is not None else (1.0 / np.sqrt(din))
    return jax.random.uniform(key, (din, dout), jnp.float32, -scale, scale)


def make_attention_tsp(num_cities: int, embed_dim: int = 128,
                       num_heads: int = 8, num_blocks: int = 2,
                       lr: float = 1e-4, clip_logits: float = 10.0):
    D, H = embed_dim, num_heads
    Dh = D // H
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))

    def init(key) -> Tuple[AMParams, tuple]:
        ks = jax.random.split(key, 4 + num_blocks)
        blocks = []
        for b in range(num_blocks):
            kb = jax.random.split(ks[b], 8)
            blocks.append((
                _linear(kb[0], D, D), _linear(kb[1], D, D), _linear(kb[2], D, D),
                _linear(kb[3], D, D),
                _linear(kb[4], D, 2 * D), jnp.zeros(2 * D),
                _linear(kb[5], 2 * D, D), jnp.zeros(D)))
        params = AMParams(
            embed=(_linear(ks[-4], 2, D), jnp.zeros(D)),
            blocks=tuple(blocks),
            proj_kv=(_linear(ks[-3], D, D), _linear(ks[-2], D, D),
                     _linear(ks[-1], 3 * D, D)),
            first_last=jax.random.normal(jax.random.fold_in(ks[-1], 7),
                                         (2, D)) * 0.1)
        return params, optimizer.init(params)

    def _norm(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) / np.sqrt(D) + 1e-6)

    def _mha(x, wq, wk, wv, wo):
        B, N, _ = x.shape
        q = (x @ wq).reshape(B, N, H, Dh)
        k = (x @ wk).reshape(B, N, H, Dh)
        v = (x @ wv).reshape(B, N, H, Dh)
        att = jnp.einsum('bnhd,bmhd->bhnm', q, k) / np.sqrt(Dh)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum('bhnm,bmhd->bnhd', att, v).reshape(B, N, D)
        return out @ wo

    def encode(params: AMParams, coords):
        """coords (B, N, 2) -> embeddings (B, N, D)."""
        w, b = params.embed
        h = coords @ w + b
        for (wq, wk, wv, wo, w1, b1, w2, b2) in params.blocks:
            h = _norm(h + _mha(h, wq, wk, wv, wo))
            h = _norm(h + jax.nn.relu(h @ w1 + b1) @ w2 + b2)
        return h

    def decode(params: AMParams, emb, key, greedy: bool):
        """Construct tours autoregressively.  emb (B, N, D).
        Returns (tours (B, N) int32, logprob (B,))."""
        B, N, _ = emb.shape
        wk, wv, wq_ctx = params.proj_kv
        keys_g = emb @ wk                      # (B, N, D) glimpse keys
        graph_emb = jnp.mean(emb, axis=1)      # (B, D)

        def body(carry, key_t):
            visited, first, last, logp = carry     # (B, N), (B,), (B,), (B,)
            first_e = jnp.where(
                (first < 0)[:, None], params.first_last[0][None],
                jnp.take_along_axis(emb, jnp.maximum(first, 0)[:, None, None]
                                    .repeat(D, -1), 1)[:, 0])
            last_e = jnp.where(
                (last < 0)[:, None], params.first_last[1][None],
                jnp.take_along_axis(emb, jnp.maximum(last, 0)[:, None, None]
                                    .repeat(D, -1), 1)[:, 0])
            ctx = jnp.concatenate([graph_emb, first_e, last_e], -1) @ wq_ctx
            logits = jnp.einsum('bd,bnd->bn', ctx, keys_g) / np.sqrt(D)
            logits = clip_logits * jnp.tanh(logits)
            logits = jnp.where(visited, -jnp.inf, logits)
            if greedy:
                nxt = jnp.argmax(logits, axis=-1)
            else:
                nxt = jax.random.categorical(key_t, logits, axis=-1)
            lp = jnp.take_along_axis(jax.nn.log_softmax(logits),
                                     nxt[:, None], -1)[:, 0]
            visited = visited | jax.nn.one_hot(nxt, N, dtype=jnp.bool_)
            first = jnp.where(first < 0, nxt, first)
            return (visited, first, nxt.astype(jnp.int32), logp + lp), nxt

        init_c = (jnp.zeros((B, N), jnp.bool_),
                  jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
                  jnp.zeros(B))
        (_, _, _, logp), tours = jax.lax.scan(
            body, init_c, jax.random.split(key, N))
        return tours.T.astype(jnp.int32), logp

    @partial(jax.jit, static_argnums=(4,))
    def train_step(params, opt_state, coords, key, num_sims: int):
        """One REINFORCE step with greedy-rollout baseline on a batch of
        random instances (coords (num_sims, N, 2))."""
        sim_dist = jnp.sqrt(jnp.sum(jnp.square(
            coords[:, :, None, :] - coords[:, None, :, :]), -1))  # (B,N,N)

        def tour_len(tours):
            nxt = jnp.roll(tours, -1, axis=-1)
            return jnp.sum(
                sim_dist[jnp.arange(tours.shape[0])[:, None], tours, nxt], -1)

        emb = encode(params, coords)
        greedy_tours, _ = decode(params, emb, key, greedy=True)
        baseline = tour_len(greedy_tours)

        def loss_fn(p):
            emb2 = encode(p, coords)
            tours, logp = decode(p, emb2, key, greedy=False)
            cost = tour_len(tours)
            adv = jax.lax.stop_gradient(cost - baseline)
            return jnp.mean(adv * logp), (cost, baseline)

        (_, (cost, baseline)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.mean(cost), jnp.mean(baseline)

    @partial(jax.jit, static_argnums=(3,))
    def solve(params, coords, key, num_samples: int = 64):
        """Sample num_samples tours for one instance, return the best."""
        emb = encode(params, coords[None].repeat(num_samples, 0))
        tours, _ = decode(params, emb, key, greedy=False)
        g_tours, _ = decode(params, emb[:1], key, greedy=True)
        tours = jnp.concatenate([tours, g_tours], 0)
        d = jnp.sqrt(jnp.sum(jnp.square(
            coords[:, None, :] - coords[None, :, :]), -1))
        nxt = jnp.roll(tours, -1, axis=-1)
        lens = jnp.sum(d[tours, nxt], -1)
        i = jnp.argmin(lens)
        return lens[i], tours[i]

    return init, train_step, solve


def train_attention_tsp(num_cities: int = 20, num_steps: int = 200,
                        num_sims: int = 256, seed: int = 0,
                        verbose: bool = True):
    init, train_step, solve = make_attention_tsp(num_cities)
    key = jax.random.key(seed)
    k_init, key = jax.random.split(key)
    params, opt_state = init(k_init)
    for i in range(num_steps):
        key, k1, k2 = jax.random.split(key, 3)
        coords = jax.random.uniform(k1, (num_sims, num_cities, 2))
        params, opt_state, cost, baseline = train_step(
            params, opt_state, coords, k2, num_sims)
        if verbose and (i + 1) % max(1, num_steps // 8) == 0:
            print(f"| am_tsp step {i + 1}: sample cost {float(cost):.4f} "
                  f"greedy {float(baseline):.4f}", flush=True)
    return params, opt_state, solve
