"""Measure PER segment-tree op costs vs the surrounding SGD step on TPU —
the evidence base for VERDICT r1 weak #4 / next #6 (make a Pallas kernel
earn its keep, or retire the effort with numbers).

Measures, at the production PER shape (OFFPOL_PEND verify config with
if_use_per: buffer 1e6 x 8 seqs, batch 256):

- tree.sample (stratified descent over the CURRENT in-tree layout: 2-level
  fanout-256 wide tree — one (S, 256) cumsum-scan per level instead of the
  retired binary tree's 20 serial gather levels)
- tree.update_scattered (leaf scatter + wide-node re-reduction)
- one full DDPG PER objectives step (sample + critic + actor + PER update)

and the same for a small-buffer shape (4e3) where trees are VMEM-sized.
The historical binary-layout rows quoted in docs/performance.md were
measured with the pre-redesign SegmentTree (git history) and are not
reproducible from this script alone.

Run on TPU: ``python scripts/bench_per_kernels.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax               # noqa: E402
import jax.numpy as jnp  # noqa: E402


def fetch(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32))


def measure(fn, *args, iters=50):
    """Median of 5 timings of ``iters`` chained dispatches, RTT-corrected."""
    f = jax.jit(fn)
    out = f(*args)
    fetch(out)

    x = jnp.ones(8)
    g = jax.jit(lambda v: v + 1)
    fetch(g(x))
    t0 = time.perf_counter()
    fetch(g(x))
    rtt = time.perf_counter() - t0

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = f(*args)
        fetch(o)
        ts.append((time.perf_counter() - t0 - rtt) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def bench_shape(max_size, num_seqs, batch, chain=100):
    """Times the ops CHAINED inside one jit (lax.scan threading the tree
    through iterations) so per-dispatch overhead doesn't floor the numbers."""
    from elegantrl_tpu.ops.per import SegmentTree
    tree_def = SegmentTree(max_size, num_seqs)
    key = jax.random.key(0)
    tree = tree_def.init()
    prob = jax.random.uniform(key, (max_size, num_seqs)) + 0.1
    tree = jax.jit(tree_def.update)(tree, jnp.arange(max_size), prob)
    sub = batch // num_seqs

    def sample_chain(tree):
        def body(carry, i):
            acc = carry
            ids, prios = tree_def.sample(tree, jax.random.fold_in(key, i), sub)
            return acc + jnp.sum(prios), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(chain))
        return acc

    t_sample = measure(sample_chain, tree, iters=1) / chain

    ids0 = jax.random.randint(key, (batch,), 0, max_size)
    ids1 = jax.random.randint(key, (batch,), 0, num_seqs)

    def update_chain(tree):
        def body(tr, i):
            p = jax.random.uniform(jax.random.fold_in(key, i), (batch,)) + 0.1
            return tree_def.update_scattered(tr, ids0, ids1, p), None
        tr, _ = jax.lax.scan(body, tree, jnp.arange(chain))
        return tr

    t_update = measure(update_chain, tree, iters=1) / chain

    print(f"shape (M={max_size}, N={num_seqs}, B={batch}): "
          f"sample {t_sample*1e6:7.1f} us   update {t_update*1e6:7.1f} us")
    return t_sample, t_update


def bench_full_step():
    """One DDPG PER objectives step at the verify-config shape."""
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.agents import AgentDDPG
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.train.runner import build_training

    args = Config(AgentDDPG, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 8, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (64, 64)
    args.horizon_len = 100
    args.buffer_size = int(1e6)
    args.batch_size = 256
    args.repeat_times = 1.0
    args.if_use_per = True
    ctx = build_training(args)

    def one_round(c):
        return ctx.round_fn(c, None)[0]

    t_round = measure(one_round, ctx.carry, iters=5)
    print(f"full fused round (rollout 100x8 + PER updates): {t_round*1e3:.2f} ms")


def main():
    print("PER op costs (XLA batched segment tree), TPU:")
    bench_shape(int(1e6), 8, 256)      # verify-config production shape
    bench_shape(int(4e3), 64, 256)     # small-buffer VMEM-sized shape
    bench_shape(int(1e6), 1, 256)      # single-seq worst case
    bench_full_step()


if __name__ == '__main__':
    main()
