"""Checkpointing: whole agent/training pytrees as flat npz archives.

Replaces the reference's per-attribute ``th.save``/``th.load`` of pickled
modules (``AgentBase.save_or_load_agent``, AgentBase.py:280-297) with a
safe, framework-neutral format: each leaf stored under its pytree key path.
Loading requires a template pytree of the same structure (the usual JAX
pattern), so no arbitrary code is unpickled.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        elif hasattr(p, 'name'):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return '/'.join(parts)


def _is_prng_key(x) -> bool:
    return hasattr(x, 'dtype') and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def save_pytree(path: str, tree: Any) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    keyed = [(f"{i:04d}|{_path_str(kp)}",
              jax.random.key_data(leaf) if _is_prng_key(leaf) else leaf)
             for i, (kp, leaf) in enumerate(leaves)]
    # fetch all leaves in one device_get (async per-leaf copies, one wait)
    # instead of a blocking round-trip per leaf
    values = jax.device_get([v for _, v in keyed])
    # bf16 (storage_dtype) leaves round-trip through npz as opaque void
    # dtype; store them widened to f32 (lossless) — load_pytree re-casts to
    # the template's dtype.
    arrays = {}
    for (k, _), v in zip(keyed, values):
        a = np.asarray(v)
        if a.dtype.kind == 'V' or str(a.dtype) == 'bfloat16':
            a = a.astype(np.float32)
        arrays[k] = a
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, template: Any) -> Any:
    """Load leaves (by flatten order) into ``template``'s structure."""
    data = np.load(path)
    keys = sorted(data.files, key=lambda k: int(k.split('|')[0]))
    leaves = [data[k] for k in keys]
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    assert len(leaves) == len(t_leaves), \
        f"checkpoint has {len(leaves)} leaves, template has {len(t_leaves)}"
    out = []
    for l, t in zip(leaves, t_leaves):
        if _is_prng_key(t):
            out.append(jax.random.wrap_key_data(np.asarray(l)))
        elif hasattr(t, 'dtype'):
            out.append(np.asarray(l).astype(t.dtype))
        else:
            out.append(l)
    return jax.tree_util.tree_unflatten(treedef, out)
