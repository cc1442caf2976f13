"""Multi-host training: jax.distributed init + elastic resharding.

The reference's distributed story is per-GPU learner processes exchanging
rollouts over OS pipes (run.py:165-202) plus *paper-level* Podracer
elasticity claims (docs/source/about/cloud.rst:25-37 — no code exists).
TPU-native equivalents:

- :func:`init_distributed` — one SPMD program across hosts via
  ``jax.distributed.initialize``; after it, ``jax.devices()`` spans the pod
  slice and the same ``{'dp': N}`` mesh from ``parallel.mesh`` shards the
  env axis over ICI/DCN with XLA collectives;
- :func:`elastic_restore` — the Podracer-elasticity analog: training state
  is periodically checkpointed (``utils.checkpoint``); on membership change
  the job re-initializes with the new host set, rebuilds the mesh over the
  surviving devices and restores the checkpoint into the NEW sharding — a
  reshard-on-restore, not a live migration (sufficient for generational /
  tournament-style training where agents are selected between generations).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from ..utils.checkpoint import load_pytree
from .mesh import make_mesh, shard_train_carry


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX.  No-ops on a single host.  Returns the
    global device count."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())


def elastic_restore(checkpoint_path: str, template_carry: Any,
                    mesh_axes: Optional[Dict[str, int]] = None):
    """Restore a training carry from checkpoint and reshard it onto a mesh
    built from the CURRENT device set (which may have grown or shrunk since
    the checkpoint was written)."""
    carry = load_pytree(checkpoint_path, template_carry)
    mesh = make_mesh(mesh_axes)
    return shard_train_carry(mesh, carry), mesh
