"""Persistent XLA compilation cache.

The reference framework has zero compile time (eager PyTorch); here every
training program pays XLA compilation once per process.  Enabling JAX's
persistent compilation cache makes repeat runs of the same config
(re-running a script, the verification driver, resuming after a crash)
reuse the serialized executable: measured on the tunneled TPU, the
compile-dominated small-config path drops from 67 s to 26 s process
wall-clock (see docs/performance.md).

On by default at ``~/.cache/elegantrl_tpu/xla`` (override with
``ELEGANTRL_TPU_CACHE_DIR=/path``; disable with
``ELEGANTRL_TPU_CACHE_DIR=``).  Only programs that took >= 2 s to compile
are persisted, so test suites full of tiny jits don't spam the cache.
"""

from __future__ import annotations

import os

_active_dir: str | None = None
_configured = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable (or re-point, or disable) the persistent
    compilation cache.  Returns the active cache directory, or None when
    disabled via an empty ``path`` / ``ELEGANTRL_TPU_CACHE_DIR=``.  A repeat
    call with a different directory re-points the cache rather than being
    silently ignored."""
    global _active_dir, _configured
    if path is None:
        path = os.environ.get(
            'ELEGANTRL_TPU_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'elegantrl_tpu', 'xla'))
    path = path or None
    if _configured and path == _active_dir:
        return _active_dir
    import jax
    jax.config.update('jax_compilation_cache_dir', path)
    if path is not None:
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    _active_dir, _configured = path, True
    return _active_dir
