"""Peak-scale probe: env-count sweep above the committed 65,536-env bench
peak, to find where the fused-round throughput curve actually tops out
(docs/performance.md shows steps/s still rising at 65k).

Run on TPU: python scripts/peak_probe.py [env_counts ...]
Prints one line per count; append the winner to docs/performance.md and,
if decisively higher, raise bench.py's PEAK_ENVS.
"""
import sys
import time
from functools import partial

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_args
from elegantrl_tpu.train.runner import build_training
from elegantrl_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

HORIZON = 64
ROUNDS = 20


def fetch(x):
    return float(jnp.sum(x).astype(jnp.float32))


def measure(num_envs: int) -> float:
    args = _make_args(num_envs=num_envs, horizon_len=HORIZON,
                      batch_size=512 * num_envs // 4096)
    ctx = build_training(args)

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=n)
        return c2

    carry = run(ctx.carry, ROUNDS)
    fetch(carry.obs)                       # warmup + force execution
    ts = []
    for _ in range(3):
        carry = run(carry, ROUNDS)
        t0 = time.perf_counter()
        fetch(carry.obs)
        ts.append(time.perf_counter() - t0)
    return ROUNDS * num_envs * HORIZON / min(ts)


if __name__ == '__main__':
    counts = [int(c) for c in sys.argv[1:]] or [65536, 131072, 262144]
    for c in counts:
        try:
            sps = measure(c)
            print(f"| peak_probe {c} envs: {sps / 1e6:.1f}M env-steps/s",
                  flush=True)
        except Exception as e:
            print(f"| peak_probe {c} envs: FAILED {type(e).__name__}: {e}",
                  flush=True)
