"""Pallas TPU kernels for the framework's hot ops.

Two kernels, each with a reference jnp fallback and equality tests
(tests/test_pallas_kernels.py):

1. ``buffer_gather`` — replay-buffer minibatch gather.  Off-policy updates
   sample ``batch_size`` random (t, seq) transitions from the
   ``(max_size, num_seqs, dim)`` HBM-resident ring every SGD step (reference
   semantics: ``replay_buffer.py:120-134``).  XLA lowers fancy indexing to a
   generic dynamic-gather; this kernel instead scalar-prefetches the indices
   and issues row DMAs HBM->VMEM directly.

2. ``fused_mlp3`` — 3-layer Linear+GELU MLP forward in ONE kernel: weights
   are loaded to VMEM once and all three matmuls + activations run
   back-to-back on the MXU/VPU without HBM round-trips for the activations.
   Used for large-batch actor/critic inference (rollout exploration, eval).

Both kernels are optional fast paths: ``*_reference`` twins define the exact
semantics, and callers fall back to them off-TPU.

Measured on TPU v5e (in-dispatch loops, tunnel RTT subtracted): XLA's native
gather beats the DMA-per-row kernel ~2x at RL-typical row sizes (512 B rows
are too small to amortize DMA issue cost), and XLA's fused matmul chain
matches ``fused_mlp3`` within noise — so the DEFAULT paths use XLA, and
these kernels remain as validated infrastructure for shapes where manual
DMA/pipelining wins (wide observation rows, multi-row blocks).  The fused
GAE kernel likewise ties XLA (4.2 vs 4.1 ms per 100 calls at (64, 4096)) —
XLA's scan lowering is already optimal for this recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------- buffer gather
def buffer_gather_reference(buf: jax.Array, ids0: jax.Array, ids1: jax.Array
                            ) -> jax.Array:
    return buf[ids0, ids1]


_GATHER_ROWS = 8  # rows per grid step: satisfies the (8, 128) f32 min tile


def _gather_kernel(ids_ref, buf_ref, out_ref, scratch, sems):
    i = pl.program_id(0)
    # start all row DMAs, then wait: overlapped HBM->VMEM copies
    for r in range(_GATHER_ROWS):
        t = ids_ref[2 * (i * _GATHER_ROWS + r)]
        n = ids_ref[2 * (i * _GATHER_ROWS + r) + 1]
        pltpu.make_async_copy(buf_ref.at[t, n], scratch.at[r], sems.at[r]).start()
    for r in range(_GATHER_ROWS):
        t = ids_ref[2 * (i * _GATHER_ROWS + r)]
        n = ids_ref[2 * (i * _GATHER_ROWS + r) + 1]
        pltpu.make_async_copy(buf_ref.at[t, n], scratch.at[r], sems.at[r]).wait()
    out_ref[...] = scratch[...]


def buffer_gather(buf: jax.Array, ids0: jax.Array, ids1: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Gather rows ``buf[ids0[b], ids1[b], :]`` -> (B, dim) via per-row DMA
    with scalar-prefetched indices.  B is padded up to a multiple of 8."""
    batch = ids0.shape[0]
    dim = buf.shape[-1]
    pad = (-batch) % _GATHER_ROWS
    if pad:
        ids0 = jnp.concatenate([ids0, jnp.zeros(pad, ids0.dtype)])
        ids1 = jnp.concatenate([ids1, jnp.zeros(pad, ids1.dtype)])
    padded = batch + pad
    ids = jnp.stack([ids0.astype(jnp.int32), ids1.astype(jnp.int32)],
                    axis=1).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(padded // _GATHER_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_GATHER_ROWS, dim), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_GATHER_ROWS, dim), buf.dtype),
                        pltpu.SemaphoreType.DMA((_GATHER_ROWS,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded, dim), buf.dtype),
        interpret=interpret,
    )(ids, buf)
    return out[:batch]


# ------------------------------------------------------------------ fused GAE
def gae_vtrace_reference(rewards, undones, values, next_value, gamma, lam):
    from .gae import gae_vtrace
    return gae_vtrace(rewards, undones, values, next_value, gamma, lam)


def _gae_kernel(gamma_lam_ref, r_ref, m_ref, v_ref, nv_ref, adv_ref):
    """One lane-block (H, 128): the whole reverse V-trace recursion runs
    inside the kernel with everything VMEM-resident — replaces H sequential
    XLA loop iterations with one kernel invocation."""
    h = r_ref.shape[0]
    gamma = gamma_lam_ref[0]
    lam = gamma_lam_ref[1]

    def body(t, carry):
        next_v, adv = carry                      # (1, 128) each
        i = h - 1 - t
        r = r_ref[pl.ds(i, 1), :]
        m = m_ref[pl.ds(i, 1), :] * gamma
        v = v_ref[pl.ds(i, 1), :]
        nv = r + m * next_v
        adv = nv - v + m * lam * adv
        adv_ref[pl.ds(i, 1), :] = adv
        return v, adv

    nv0 = nv_ref[...]
    zero = jnp.zeros_like(nv0)
    jax.lax.fori_loop(0, h, body, (nv0, zero))


def gae_vtrace_pallas(rewards: jax.Array, undones: jax.Array,
                      values: jax.Array, next_value: jax.Array,
                      gamma: float, lam: float,
                      interpret: bool = False) -> jax.Array:
    """Pallas V-trace advantages; semantics of :func:`ops.gae.gae_vtrace`.
    Requires num_envs % 128 == 0 (lane width); callers fall back otherwise."""
    h, n = rewards.shape
    assert n % 128 == 0, "pad num_envs to a lane multiple or use the XLA path"
    gl = jnp.asarray([gamma, lam], jnp.float32)
    grid = (n // 128,)

    def cmap(i, gl_ref=None):
        return (0, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec((h, 128), cmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, 128), cmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, 128), cmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 128), cmap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, 128), cmap, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gae_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, n), jnp.float32),
        interpret=interpret,
    )(gl, rewards, undones, values, next_value[None, :])


# ----------------------------------------------------------------- fused MLP
def fused_mlp3_reference(x, w0, b0, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w0 + b0)
    h = jax.nn.gelu(h @ w1 + b1)
    return h @ w2 + b2


def _mlp3_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 out_ref):
    x = x_ref[...]
    h = jnp.dot(x, w0_ref[...], preferred_element_type=jnp.float32) + b0_ref[...]
    h = jax.nn.gelu(h)
    h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
    h = jax.nn.gelu(h)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)


def fused_mlp3(x: jax.Array, w0, b0, w1, b1, w2, b2,
               block_b: int = 512, interpret: bool = False) -> jax.Array:
    """One-kernel 3-layer MLP forward, tiled over the batch axis.  Weights
    live in VMEM for the whole grid; activations never touch HBM."""
    batch = x.shape[0]
    out_dim = w2.shape[1]
    block_b = min(block_b, batch)
    grid = (pl.cdiv(batch, block_b),)

    def xmap(i):
        return (i, 0)

    return pl.pallas_call(
        _mlp3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, x.shape[1]), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((w0.shape[0], w0.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b1.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[0], w2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b2.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, out_dim), xmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), x.dtype),
        interpret=interpret,
    )(x, w0, b0, w1, b1, w2, b2)
