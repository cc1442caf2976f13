"""Probe Mosaic lowering support for the ops the fused StockTrading rollout
body needs, on the real TPU:

1. dynamic sublane slice of a VMEM-resident table VALUE
   (``lax.dynamic_slice_in_dim(table, day, 1, axis=0)`` with traced day)
2. (1, N) -> (N, 1) relayout (``jnp.transpose``) for lane->sublane moves
3. scalar extraction from a vector row (``i[0, 0]``) feeding a dynamic slice
4. dynamic LANE-dim slice of a ref (``ref[:, pl.ds(day, 1)]``)

Each probe compiles + runs a minimal kernel and prints ok/FAIL with the
error head, so the stock-body design can pick the cheapest supported form.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"ok   {name}: {np.asarray(out).ravel()[:4]}")
    except Exception as e:  # noqa: BLE001
        head = str(e).splitlines()[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {head}")
        if os.environ.get('PROBE_VERBOSE'):
            traceback.print_exc()


T, R, B = 64, 16, 128


def probe_sublane_dynslice_value():
    def kernel(tab_ref, idx_ref, o_ref):
        tab = tab_ref[:]                       # (T, R) value
        day = idx_ref[0]
        row = jax.lax.dynamic_slice_in_dim(tab, day, 1, axis=0)  # (1, R)
        o_ref[:] = jnp.broadcast_to(jnp.sum(row), o_ref.shape)

    tab = jnp.arange(T * R, dtype=jnp.float32).reshape(T, R)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(tab, jnp.array([3], jnp.int32))


def probe_sublane_dynslice_ref():
    def kernel(tab_ref, idx_ref, o_ref):
        day = idx_ref[0]
        row = tab_ref[pl.ds(day, 1), :]        # (1, R) from ref
        o_ref[:] = jnp.broadcast_to(jnp.sum(row), o_ref.shape)

    tab = jnp.arange(T * R, dtype=jnp.float32).reshape(T, R)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(tab, jnp.array([3], jnp.int32))


def probe_transpose_1xN():
    def kernel(x_ref, o_ref):
        row = x_ref[:]                          # (1, R)
        col = jnp.transpose(row)                # (R, 1)
        o_ref[:] = jnp.broadcast_to(col, o_ref.shape)

    x = jnp.arange(R, dtype=jnp.float32).reshape(1, R)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
    )(x)


def probe_dynslice_then_transpose():
    """The composed op the stock body needs per step: table row -> column."""
    def kernel(tab_ref, idx_ref, o_ref):
        day = idx_ref[0]
        row = tab_ref[pl.ds(day, 1), :]         # (1, R)
        col = jnp.transpose(row)                # (R, 1)
        o_ref[:] = jnp.broadcast_to(col, o_ref.shape)

    tab = jnp.arange(T * R, dtype=jnp.float32).reshape(T, R)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
    )(tab, jnp.array([3], jnp.int32))


def probe_scalar_from_vmem():
    def kernel(i_ref, tab_ref, o_ref):
        day = i_ref[0, 0]                       # scalar from VMEM vector
        row = tab_ref[pl.ds(day, 1), :]
        o_ref[:] = jnp.broadcast_to(jnp.sum(row), o_ref.shape)

    tab = jnp.arange(T * R, dtype=jnp.float32).reshape(T, R)
    i = jnp.full((1, B), 5, jnp.int32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(i, tab)


def probe_lane_dynslice_ref():
    def kernel(tab_ref, idx_ref, o_ref):
        day = idx_ref[0]
        col = tab_ref[:, pl.ds(day, 1)]         # (R, 1) lane-dim dyn slice
        o_ref[:] = jnp.broadcast_to(col, o_ref.shape)

    tab = jnp.arange(R * T, dtype=jnp.float32).reshape(R, T)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
    )(tab, jnp.array([3], jnp.int32))


def probe_fori_scalar_carry():
    """fori_loop carrying (vector, scalar) — the running day counter."""
    def kernel(tab_ref, o_ref):
        def body(t, carry):
            acc, day = carry
            row = tab_ref[pl.ds(day, 1), :]
            return acc + jnp.transpose(row), (day + 1) % T
        acc, _ = jax.lax.fori_loop(
            0, 8, body, (jnp.zeros((R, 1), jnp.float32), 0))
        o_ref[:] = jnp.broadcast_to(acc, o_ref.shape)

    tab = jnp.arange(T * R, dtype=jnp.float32).reshape(T, R)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
    )(tab)


if __name__ == '__main__':
    print(f"platform: {jax.devices()[0].platform}")
    run("sublane_dynslice_value", probe_sublane_dynslice_value)
    run("sublane_dynslice_ref", probe_sublane_dynslice_ref)
    run("transpose_1xN", probe_transpose_1xN)
    run("dynslice_then_transpose", probe_dynslice_then_transpose)
    run("scalar_from_vmem", probe_scalar_from_vmem)
    run("lane_dynslice_ref", probe_lane_dynslice_ref)
    run("fori_scalar_carry", probe_fori_scalar_carry)
