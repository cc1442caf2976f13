"""Per-env-body speedup of the fused whole-rollout Pallas kernel.

For every env registered in ``ops/pallas_rollout.py:KERNEL_ENV_BODIES``,
time the FULL fused round (rollout + GAE + minibatch SGD) at 4096 envs /
horizon 64 twice — generic scan path (``use_pallas_rollout=False``) vs the
fused kernel (``use_pallas_rollout=True``) — and print env-steps/s plus the
ratio.  These are the numbers quoted in docs/performance.md ("Measured
per-env speedups at 4096 envs").

Run on TPU: ``python scripts/bench_rollout_envs.py [num_envs] [horizon]``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax               # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
HORIZON = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ONLY = sys.argv[3] if len(sys.argv) > 3 else None   # env-name substring
ROUNDS = 100
BATCH = 512


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


def bench(env_class, env_args, agent_class, use_pallas):
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.train.runner import build_training

    args = Config(agent_class=agent_class, env_class=env_class,
                  env_args=dict(env_args, num_envs=NUM_ENVS))
    args.horizon_len = HORIZON
    args.net_dims = (64, 64)
    args.batch_size = BATCH
    args.repeat_times = 8.0
    args.use_pallas_rollout = use_pallas
    ctx = build_training(args)

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=n)
        return c2

    carry = run(ctx.carry, ROUNDS)
    fetch(carry.obs)                       # force warmup execution
    rtt = measure_rtt()
    ts = []
    for _ in range(3):
        carry2 = run(carry, ROUNDS)
        t0 = time.perf_counter()
        fetch(carry2.obs)
        ts.append(time.perf_counter() - t0 - rtt)
        carry = carry2
    sec = sorted(ts)[1]
    return NUM_ENVS * HORIZON * ROUNDS / sec


def main():
    from elegantrl_tpu.agents import AgentDiscretePPO, AgentPPO
    from elegantrl_tpu.envs import (CartPoleEnv, HopperEnv, PendulumEnv,
                                    PointChasingDiscreteEnv,
                                    PointChasingVecEnv, StockTradingVecEnv)

    rows = [
        ('Pendulum-v1', PendulumEnv, AgentPPO,
         {'env_name': 'Pendulum-v1', 'max_step': 200, 'state_dim': 3,
          'action_dim': 1, 'if_discrete': False}),
        ('CartPole-v1', CartPoleEnv, AgentDiscretePPO,
         {'env_name': 'CartPole-v1', 'max_step': 500, 'state_dim': 4,
          'action_dim': 2, 'if_discrete': True}),
        ('HopperSlip-v0', HopperEnv, AgentPPO,
         {'env_name': 'HopperSlip-v0', 'max_step': 1000, 'state_dim': 6,
          'action_dim': 2, 'if_discrete': False}),
        ('PointChasingVecEnv', PointChasingVecEnv, AgentPPO,
         {'env_name': 'PointChasingVecEnv', 'max_step': 1024, 'state_dim': 8,
          'action_dim': 2, 'if_discrete': False}),
        ('PointChasingDiscreteEnv', PointChasingDiscreteEnv,
         AgentDiscretePPO,
         {'env_name': 'PointChasingDiscreteEnv', 'max_step': 1024,
          'state_dim': 8, 'action_dim': 9, 'if_discrete': True}),
        ('StockTradingEnv-v2', StockTradingVecEnv, AgentPPO,
         {'env_name': 'StockTradingEnv-v2', 'max_step': 1112,
          'state_dim': 151, 'action_dim': 15, 'if_discrete': False}),
    ]
    print(f"| num_envs={NUM_ENVS} horizon={HORIZON} rounds={ROUNDS} "
          f"batch={BATCH} net=(64,64) repeat=8")
    print(f"| {'env':26s} {'scan (M/s)':>11s} {'fused (M/s)':>12s} "
          f"{'speedup':>8s}")
    for name, env_class, agent_class, env_args in rows:
        if ONLY and ONLY not in name:
            continue
        slow = bench(env_class, env_args, agent_class, False)
        fast = bench(env_class, env_args, agent_class, True)
        print(f"| {name:26s} {slow / 1e6:11.1f} {fast / 1e6:12.1f} "
              f"{fast / slow:7.1f}x", flush=True)


if __name__ == '__main__':
    main()
