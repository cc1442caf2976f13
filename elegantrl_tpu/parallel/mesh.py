"""Device-mesh data parallelism over the environment axis.

The reference scales by spawning one Learner process per GPU and exchanging
rollout tensors in an all-to-all pipe ring, then training every learner on
the union of all rollouts (``elegantrl/train/run.py:165-202, 305-320``).
TPU-native replacement: shard the env axis of the training carry over a
``jax.sharding.Mesh`` axis ``'dp'`` and jit the SAME fused train round.  XLA
partitions the rollout perfectly (env instances are independent), inserts
the gathers for cross-shard minibatch sampling, and keeps parameters
replicated — numerically identical to the single-device program over the
union of envs, which is exactly the reference's semantics (every learner
sees all data), but with ICI collectives instead of pickled pipes.

Sharding rules for the carry:
- env_state / obs: leading axis = env  ->  P('dp', ...)
- replay buffer arrays: axis 1 = num_seqs (env)  ->  P(None, 'dp', ...);
  PER tree: axis 0 = num_seqs -> P('dp'); ptr/size scalars replicated
- agent params / opt state / rng key: replicated
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_axes: Optional[Dict[str, int]] = None) -> Mesh:
    """Build a mesh from ``{'dp': n}`` (n = -1 or None means all devices)."""
    mesh_axes = dict(mesh_axes or {})
    if not mesh_axes:
        mesh_axes = {'dp': len(jax.devices())}
    names = tuple(mesh_axes.keys())
    sizes = [len(jax.devices()) if (v is None or v == -1) else int(v)
             for v in mesh_axes.values()]
    n = int(np.prod(sizes))
    devices = np.array(jax.devices()[:n]).reshape(sizes)
    return Mesh(devices, names)


def _put(mesh: Mesh, x: Any, spec) -> jax.Array:
    """Place ``x`` (identical full-size array on every process) with the
    given spec.  Single-process: plain device_put.  Multi-process: the mesh
    spans non-addressable devices, so build the global array from each
    process's local slice of the (replicated) host data."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, 'dtype') and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        impl = jax.random.key_impl(x)
        pad = (len(data.shape) - np.ndim(x)) * (None,)
        global_data = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec, *pad)), data, data.shape)
        return jax.random.wrap_key_data(global_data, impl=impl)
    data = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, data, data.shape)


def _shard(mesh: Mesh, tree: Any, spec_fn) -> Any:
    return jax.tree.map(lambda x: _put(mesh, x, spec_fn(x)), tree)


def shard_train_carry(mesh: Mesh, carry: Any, axis: str = 'dp') -> Any:
    """Apply the DP sharding layout to a runner ``TrainCarry``."""
    def env_spec(x):
        return P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()

    def buf_spec(x):
        if np.ndim(x) >= 2:
            return P(None, axis, *([None] * (np.ndim(x) - 2)))
        return P()

    def rep_spec(x):
        return P()

    agent_state = _shard(mesh, carry.agent_state, rep_spec)
    env_state = _shard(mesh, carry.env_state, env_spec)
    obs = _shard(mesh, carry.obs, env_spec)
    key = _put(mesh, carry.key, P())
    buf_state = carry.buf_state
    if buf_state is not None:
        new_fields = {}
        for name, val in buf_state._asdict().items():
            if val is None or name in ('ptr', 'size'):
                new_fields[name] = (val if val is None else _put(mesh, val, P()))
            elif name == 'per_tree':  # per-level arrays, each (num_seqs, L)
                new_fields[name] = jax.tree.map(
                    lambda x: _put(mesh, x, P(axis, None)), val)
            else:
                new_fields[name] = _put(mesh, val, buf_spec(val))
        buf_state = type(buf_state)(**new_fields)
    return type(carry)(agent_state, buf_state, env_state, obs, key)
