"""GraphTRS: graph transformer + self-supervised embedding pretrain.

The depth half of the reference's L2A stack
(``rlsolver/methods/L2A/network.py:9-104`` GraphTRS,
``graph_embedding_pretrain.py:48-103``): a transformer over the node
sequence of a graph's adjacency rows, pretrained self-supervised on a graph
DISTRIBUTION so its per-node embeddings transfer to unseen instances.  The
reference's pretrain targets are reproduced in batched pure JAX:

- heat-diffusion "hot images" of the graph, averaged (``D⁻¹A`` walk) and
  summed (``A`` walk) over K steps — the reference's
  ``get_hot_image_of_graph(hot_type='avg'|'sum')``;
- the all-pairs shortest-path distance matrix — the reference's
  ``get_adjacency_distance_matrix``, here a min-plus matrix squaring
  (⌈log₂N⌉ doublings instead of a Python BFS per graph);
- a node-identity classification head over the encoder memory — the
  reference's ``get_node_classify`` vs an eye label.

TPU-native deltas (documented): pre-LN attention blocks (stabler than the
reference's post-LN ``nn.TransformerEncoderLayer`` without its LR warmup),
encoder-only trunk with two output heads (the reference's decoder consumes
the same memory; one trunk keeps every matmul MXU-batched), and target
computation fused on-device over the whole batch instead of a per-graph
CPU loop.

The trained embeddings plug into :func:`~.l2a.make_l2a` via its
``node_embed`` argument — L2A's policy then conditions on pretrained graph
structure exactly as the reference's ``PolicyTRS`` consumes GraphTRS
memory (``network.py:110-190``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .graphs import edges_to_adjacency, generate_graph


class GraphTRSParams(NamedTuple):
    w_in: jax.Array        # (N, D) adjacency-row lift
    layers: tuple          # per-layer dicts: attention + FFN + LN scales
    w_mem: jax.Array       # (D, D) encoder_mlp analog
    w_struct: jax.Array    # (D, 3N) [hot_avg, hot_sum, dist] head
    w_cls: jax.Array       # (D, N) node-identity head


def _attn_layer_init(key, dim: int, ff: int):
    ks = jax.random.split(key, 6)
    ortho = jax.nn.initializers.orthogonal()
    return {
        'wq': ortho(ks[0], (dim, dim)), 'wk': ortho(ks[1], (dim, dim)),
        'wv': ortho(ks[2], (dim, dim)), 'wo': ortho(ks[3], (dim, dim)) * 0.5,
        'ff1': ortho(ks[4], (dim, ff)), 'ff2': ortho(ks[5], (ff, dim)) * 0.5,
        'ln1': jnp.ones(dim), 'ln2': jnp.ones(dim),
    }


def _ln(x, scale):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale


def _attn_block(p, h, num_heads: int):
    """Pre-LN multi-head self-attention + FFN. h: (B, N, D)."""
    B, N, D = h.shape
    hd = D // num_heads
    x = _ln(h, p['ln1'])

    def split(w):
        return (x @ w).reshape(B, N, num_heads, hd)
    q, k, v = split(p['wq']), split(p['wk']), split(p['wv'])
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) / jnp.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum('bhqk,bkhd->bqhd', attn, v).reshape(B, N, D)
    h = h + o @ p['wo']
    x = _ln(h, p['ln2'])
    return h + jax.nn.gelu(x @ p['ff1']) @ p['ff2']


def make_graph_trs(num_nodes: int, embed_dim: int = 64, num_heads: int = 4,
                   num_layers: int = 2, ff_dim: int = 128, lr: float = 1e-3,
                   hot_steps: int = 4):
    """Returns (init, embed, pretrain_step).  ``embed(params, adj)`` maps a
    batch of dense adjacencies (B, N, N) to per-node embeddings (B, N, D)
    — the GraphTRS "memory" downstream policies condition on."""
    N, D = num_nodes, embed_dim
    assert D % num_heads == 0
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))

    def init(key):
        ks = jax.random.split(key, num_layers + 4)
        ortho = jax.nn.initializers.orthogonal()
        params = GraphTRSParams(
            w_in=ortho(ks[0], (N, D)),
            layers=tuple(_attn_layer_init(ks[1 + i], D, ff_dim)
                         for i in range(num_layers)),
            w_mem=ortho(ks[num_layers + 1], (D, D)),
            w_struct=ortho(ks[num_layers + 2], (D, 3 * N)) * 0.1,
            w_cls=ortho(ks[num_layers + 3], (D, N)) * 0.1)
        return params, optimizer.init(params)

    def embed(params: GraphTRSParams, adj):
        """(B, N, N) float adjacency -> (B, N, D) node embeddings."""
        h = jnp.tanh(adj @ params.w_in)
        for lp in params.layers:
            h = _attn_block(lp, h, num_heads)
        return jnp.tanh(h @ params.w_mem)

    def targets(adj):
        """Reference pretrain labels, batched on device. adj (B, N, N)."""
        deg = adj.sum(-1, keepdims=True) + 1e-6
        walk_avg = adj / deg
        eye = jnp.broadcast_to(jnp.eye(N), adj.shape)

        def diffuse(walk):
            def body(carry, _):
                carry = carry @ walk
                return carry, carry
            _, steps = jax.lax.scan(body, eye, None, length=hot_steps)
            return steps.sum(0) / hot_steps
        hot_avg = diffuse(walk_avg)
        hot_sum = diffuse(adj / jnp.maximum(deg.max(), 1.0))  # scale-bounded
        # min-plus squaring: all-pairs shortest paths in ceil(log2 N) steps
        big = jnp.float32(N)
        w = jnp.where(adj > 0, 1.0, big) * (1.0 - eye)

        def mp(w, _):
            w2 = jnp.min(w[:, :, :, None] + w[:, None, :, :], axis=2)
            return jnp.minimum(w, w2), None
        w, _ = jax.lax.scan(mp, w, None,
                            length=int(np.ceil(np.log2(max(N, 2)))))
        dist = jnp.minimum(w, big) / big
        return jnp.concatenate([hot_avg, hot_sum, dist], axis=-1)

    @jax.jit
    def pretrain_step(params, opt_state, adj):
        lab = targets(adj)
        eye_ids = jnp.arange(N)

        def loss_fn(p):
            mem = embed(p, adj)
            struct = mem @ p.w_struct                       # (B, N, 3N)
            cls_logits = mem @ p.w_cls                      # (B, N, N)
            l_struct = jnp.mean(jnp.square(struct - lab))
            l_cls = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                cls_logits, jnp.broadcast_to(eye_ids, cls_logits.shape[:2])))
            acc = jnp.mean(jnp.argmax(cls_logits, -1) == eye_ids)
            return l_struct + l_cls, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    return init, embed, pretrain_step


def pretrain_graph_trs(num_nodes: int, graph_type: str = 'ER',
                       num_graphs: int = 64, num_steps: int = 200,
                       batch_size: int = 16, embed_dim: int = 64,
                       seed: int = 0, verbose: bool = False):
    """Self-supervised pretrain over a generated graph distribution (the
    reference's ``train_graph_net_in_graph_distribution``,
    graph_embedding_pretrain.py:190).  Returns (params, embed_fn, history)
    where history is [(loss, node-identity accuracy), ...]."""
    adjs = np.stack([
        edges_to_adjacency(
            generate_graph(graph_type, num_nodes, seed=seed + i), num_nodes)
        for i in range(num_graphs)]).astype(np.float32)
    adjs = jnp.asarray(adjs)
    init, embed, pretrain_step = make_graph_trs(num_nodes,
                                                embed_dim=embed_dim)
    key = jax.random.key(seed)
    params, opt_state = init(key)
    history = []
    for step in range(num_steps):
        key, sub = jax.random.split(key)
        ids = jax.random.randint(sub, (batch_size,), 0, num_graphs)
        params, opt_state, loss, acc = pretrain_step(params, opt_state,
                                                     adjs[ids])
        if (step + 1) % max(1, num_steps // 10) == 0:
            history.append((float(loss), float(acc)))
            if verbose:
                print(f"| graph_trs step {step + 1}: loss {float(loss):.4f} "
                      f"node-id acc {float(acc):.3f}", flush=True)
    return params, embed, history
