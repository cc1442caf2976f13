"""bf16 vs fp32 at MXU-sized nets: measure the update-dominated fused round.

docs/performance.md records that ``compute_dtype='bfloat16'`` is SLOWER at
tiny control-suite widths (RESULTS.md ``ppo_pendulum_bf16``) — the claim
that it wins at MXU-friendly widths needs its own measurement.  This times
the SAME fused PPO round (rollout + GAE + minibatch SGD scan) at
net_dims=(1024, 1024), batch 16384, 64 SGD updates per round — a config
whose FLOPs are ~98% wide-matmul updates — in fp32 and bf16.

Run on the TPU:  python scripts/bf16_wide_bench.py
Prints one JSON line; the result is recorded in docs/performance.md.
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.train.runner import build_training
from elegantrl_tpu.utils.compile_cache import enable_compilation_cache

NUM_ENVS = 1024
HORIZON = 128
BATCH = 16384
REPEAT = 8192.0          # update_times = H*repeat/batch = 64 per round
NET = (1024, 1024)
ROUNDS = 20


def fetch(x):
    return float(jnp.sum(x).astype(jnp.float32))


def measure_rtt():
    x = jnp.ones(8)
    f = jax.jit(lambda v: v + 1)
    fetch(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(compute_dtype: str, reps: int = 3) -> float:
    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': NUM_ENVS,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.net_dims = NET
    args.horizon_len = HORIZON
    args.batch_size = BATCH
    args.repeat_times = REPEAT
    args.random_seed = 0
    args.compute_dtype = compute_dtype
    ctx = build_training(args)

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=n)
        return c2

    carry = run(ctx.carry, ROUNDS)   # compile
    fetch(carry.obs)                 # force warmup execution
    rtt = measure_rtt()
    ts = []
    for _ in range(reps):
        carry2 = run(carry, ROUNDS)
        t0 = time.perf_counter()
        fetch(carry2.obs)
        ts.append(time.perf_counter() - t0)
        carry = carry2
    return max(min(ts) - rtt, 1e-9)


ROLLOUT_NET = (1024, 1024)
ROLLOUT_ENVS = 4096
ROLLOUT_H = 256
ROLLOUT_ROUNDS = 5


def measure_rollout_kernel(compute_dtype: str, reps: int = 3) -> float:
    """Kernel-path wide-net measurement (VERDICT r4 weak #7): a
    rollout-DOMINATED round (update_times=1) at net (1024,1024) on the
    fused rollout kernel, f32 vs bf16 matmuls (``ops/pallas_rollout.py:
    _bf16_dot`` — bf16 operands, f32 MXU accumulation).  The whole-loop
    fused UPDATE kernel cannot join this regime: params+Adam moments at
    1024 width are ~25 MB, over the 16 MB scoped-VMEM stack, so the wide
    update rides the scan path (measured separately above)."""
    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1',
                            'num_envs': ROLLOUT_ENVS,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.net_dims = ROLLOUT_NET
    args.horizon_len = ROLLOUT_H
    args.batch_size = 1024
    args.repeat_times = 4.0        # update_times = H*repeat/batch = 1
    args.random_seed = 0
    args.compute_dtype = compute_dtype
    args.use_pallas_rollout = True
    # 1024-wide activations at 2048 lanes overflow VMEM; 256 lanes keeps
    # (1024, 256) f32 activations at 1 MB apiece
    args.pallas_rollout_block = 256
    ctx = build_training(args)

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=n)
        return c2

    carry = run(ctx.carry, ROLLOUT_ROUNDS)
    fetch(carry.obs)
    rtt = measure_rtt()
    ts = []
    for _ in range(reps):
        carry2 = run(carry, ROLLOUT_ROUNDS)
        t0 = time.perf_counter()
        fetch(carry2.obs)
        ts.append(time.perf_counter() - t0)
        carry = carry2
    return max(min(ts) - rtt, 1e-9)


def main():
    enable_compilation_cache()
    dt_f32 = measure('float32')
    dt_bf16 = measure('bfloat16')
    updates = ROUNDS * int(HORIZON * REPEAT / BATCH)
    print(json.dumps({
        'config': f'PPO net{NET} batch={BATCH} {NUM_ENVS}envs '
                  f'h={HORIZON} (64 SGD updates/round)',
        'f32_round_s': round(dt_f32 / ROUNDS, 4),
        'bf16_round_s': round(dt_bf16 / ROUNDS, 4),
        'f32_updates_per_s': round(updates / dt_f32, 1),
        'bf16_updates_per_s': round(updates / dt_bf16, 1),
        'bf16_speedup': round(dt_f32 / dt_bf16, 2),
    }))
    rk_f32 = measure_rollout_kernel('float32')
    rk_bf16 = measure_rollout_kernel('bfloat16')
    # analytic matmul FLOPs of the rollout half: actor+critic fwd per
    # env-step, 2 * sum(in*out) each
    dims_a = (3, *ROLLOUT_NET, 1 * 2)      # mean rows + value head approx
    per_step = 2.0 * sum(dims_a[i] * dims_a[i + 1]
                         for i in range(len(dims_a) - 1)) * 2
    flops_round = per_step * ROLLOUT_ENVS * ROLLOUT_H
    print(json.dumps({
        'config': f'PPO fused-rollout-kernel net{ROLLOUT_NET} '
                  f'{ROLLOUT_ENVS}envs h={ROLLOUT_H} block=256 '
                  '(update_times=1)',
        'f32_round_s': round(rk_f32 / ROLLOUT_ROUNDS, 4),
        'bf16_round_s': round(rk_bf16 / ROLLOUT_ROUNDS, 4),
        'kernel_bf16_speedup': round(rk_f32 / rk_bf16, 2),
        'f32_achieved_tflops': round(
            flops_round * ROLLOUT_ROUNDS / rk_f32 / 1e12, 1),
        'bf16_achieved_tflops': round(
            flops_round * ROLLOUT_ROUNDS / rk_bf16 / 1e12, 1),
        'f32_mxu_util_vs_99tflops': round(
            flops_round * ROLLOUT_ROUNDS / rk_f32 / 1e12 / 99.0, 3),
        'bf16_mxu_util_vs_197tflops': round(
            flops_round * ROLLOUT_ROUNDS / rk_bf16 / 1e12 / 197.0, 3),
    }))


if __name__ == '__main__':
    main()
