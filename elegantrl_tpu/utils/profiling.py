"""Tracing, throughput and speed-of-light accounting.

The reference has no profiling at all (SURVEY.md §5: wall-clock `Time` column
only).  This module adds the TPU-native observability layer:

- :func:`trace` — context manager around ``jax.profiler`` producing
  TensorBoard-loadable traces;
- :class:`ThroughputMeter` — env-steps/s and SGD-updates/s accounting with
  forced-fetch timing (correct on tunneled/async platforms where
  ``block_until_ready`` may return early);
- :func:`sol_report` — speed-of-light utilisation: given the per-round FLOP
  and HBM-byte counts of the fused program, reports the fraction of the
  chip's peak the program achieves and whether it is compute- or
  bandwidth-bound.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

# Peak numbers for common chips (per chip).  v5e: 197 TFLOP/s bf16,
# ~98 TFLOP/s f32 (MXU), 819 GB/s HBM.
CHIP_PEAKS = {
    'v5e': {'bf16_tflops': 197.0, 'f32_tflops': 98.0, 'hbm_gbps': 819.0},
    'v4': {'bf16_tflops': 275.0, 'f32_tflops': 137.0, 'hbm_gbps': 1228.0},
    'cpu': {'bf16_tflops': 1.0, 'f32_tflops': 1.0, 'hbm_gbps': 100.0},
}


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/tb'): ...`` -> profile in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_fetch(tree) -> float:
    """Force execution of everything ``tree`` depends on (tiny transfer)."""
    leaves = jax.tree.leaves(tree)
    return float(jnp.sum(leaves[0]).astype(jnp.float32)) if leaves else 0.0


class ThroughputMeter:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.updates = 0

    def add(self, env_steps: int, sgd_updates: int = 0):
        self.steps += env_steps
        self.updates += sgd_updates

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def report(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {'env_steps_per_s': self.steps / dt,
                'sgd_updates_per_s': self.updates / dt,
                'elapsed_s': dt}


def mlp_flops(dims: Sequence[int], batch: int, with_backward: bool = False) -> float:
    """2*B*sum(in*out) forward; x3 for backward."""
    fwd = 2.0 * batch * sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    return fwd * (3.0 if with_backward else 1.0)


@dataclass
class SolReport:
    achieved_tflops: float
    peak_tflops: float
    compute_util: float
    achieved_gbps: float
    peak_gbps: float
    bandwidth_util: float
    bound: str

    def __str__(self):
        return (f"SOL: {self.compute_util*100:.1f}% compute "
                f"({self.achieved_tflops:.2f}/{self.peak_tflops:.0f} TFLOP/s), "
                f"{self.bandwidth_util*100:.1f}% HBM "
                f"({self.achieved_gbps:.1f}/{self.peak_gbps:.0f} GB/s) "
                f"-> {self.bound}-bound")


def sol_report(flops: float, hbm_bytes: float, seconds: float,
               chip: str = 'v5e', dtype: str = 'f32') -> SolReport:
    peaks = CHIP_PEAKS.get(chip, CHIP_PEAKS['v5e'])
    peak_tf = peaks[f'{dtype}_tflops']
    peak_bw = peaks['hbm_gbps']
    a_tf = flops / seconds / 1e12
    a_bw = hbm_bytes / seconds / 1e9
    cu, bu = a_tf / peak_tf, a_bw / peak_bw
    return SolReport(a_tf, peak_tf, cu, a_bw, peak_bw, bu,
                     'compute' if cu >= bu else 'bandwidth')
