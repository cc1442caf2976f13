"""Scan-path vs fused-kernel throughput for OFF-POLICY exploration.

Times the rollout half alone (collect_rollout scan vs
``make_fused_offpolicy_rollout``) for each exploration head on its natural
env body, then one full TD3 round (rollout + replay insert + fused SGD
chunk) to show the end-to-end delta at a verify-row-shaped config.

Run on TPU: ``python scripts/bench_offpolicy_rollout.py [num_envs] [horizon]``
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
ROUNDS = 100


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


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


def bench_rollout_only(env_class, env_args, agent_class, use_pallas):
    """Time ONLY the exploration half: scan the rollout fn over ROUNDS
    rounds, threading (env_state, obs, key) and discarding the rollout
    through a cheap reduction so XLA cannot dead-code it."""
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.train import runner as R
    from elegantrl_tpu.agents.base import collect_rollout, \
        resolve_storage_dtype

    args = Config(agent_class=agent_class, env_class=env_class,
                  env_args=dict(env_args, num_envs=NUM_ENVS))
    args.horizon_len = HORIZON
    args.net_dims = (64, 64)
    args.use_pallas_rollout = use_pallas
    env = R._resolve_env_def(args)
    spec = env.spec
    args.state_dim, args.action_dim = spec.state_dim, spec.action_dim
    args.if_discrete = spec.if_discrete
    agent = R._make_agent(args, None)
    s = agent.init(jax.random.PRNGKey(0))
    store_dtype = resolve_storage_dtype(args)
    fast = R._maybe_pallas_rollout(args, env, agent, NUM_ENVS, HORIZON,
                                   1.0, store_dtype, None)
    if use_pallas and fast is None:
        raise RuntimeError('fused path not eligible')
    from elegantrl_tpu.envs.base import vec_reset
    env_state, obs = vec_reset(env, jax.random.PRNGKey(1), NUM_ENVS)

    def one(carry, _):
        env_state, obs, key = carry
        key, k = jax.random.split(key)
        if fast is not None:
            ro, env_state, obs = fast(s, env_state, obs, k)
        else:
            ro, env_state, obs = collect_rollout(
                env, s, agent.explore_action, agent.env_action, env_state,
                obs, k, HORIZON, 1.0, store_dtype=store_dtype)
        return (env_state, obs, key), jnp.sum(ro.rewards)

    @partial(jax.jit, static_argnums=1)
    def run(carry, n):
        carry, acc = jax.lax.scan(one, carry, None, length=n)
        return carry, jnp.sum(acc)

    carry = (env_state, obs, jax.random.PRNGKey(2))
    carry, acc = run(carry, ROUNDS)
    fetch(acc)
    rtt = measure_rtt()
    ts = []
    for _ in range(3):
        carry, acc = run(carry, ROUNDS)
        t0 = time.perf_counter()
        fetch(acc)
        ts.append(time.perf_counter() - t0 - rtt)
    sec = sorted(ts)[1]
    return NUM_ENVS * HORIZON * ROUNDS / sec


def bench_full_round(env_class, env_args, agent_class, use_pallas,
                     num_envs, horizon, batch):
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.train.runner import build_training

    args = Config(agent_class=agent_class, env_class=env_class,
                  env_args=dict(env_args, num_envs=num_envs))
    args.horizon_len = horizon
    args.net_dims = (128, 128)
    args.batch_size = batch
    args.buffer_size = 4096       # ring DEPTH per env sequence (x num_envs)
    args.repeat_times = 4.0
    args.gamma = 0.99
    args.use_pallas_rollout = use_pallas
    ctx = build_training(args)

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=n)
        return c2

    carry = run(ctx.carry, ROUNDS)
    fetch(carry.obs)
    rtt = measure_rtt()
    ts = []
    for _ in range(3):
        carry2 = run(carry, ROUNDS)
        t0 = time.perf_counter()
        fetch(carry2.obs)
        ts.append(time.perf_counter() - t0 - rtt)
        carry = carry2
    sec = sorted(ts)[1]
    return num_envs * horizon * ROUNDS / sec


def main():
    from elegantrl_tpu.agents import (AgentD3QN, AgentDQN, AgentModSAC,
                                      AgentSAC, AgentTD3)
    from elegantrl_tpu.envs import CartPoleEnv, HopperEnv, PendulumEnv

    pend = {'env_name': 'Pendulum-v1', 'max_step': 200, 'state_dim': 3,
            'action_dim': 1, 'if_discrete': False}
    cart = {'env_name': 'CartPole-v1', 'max_step': 500, 'state_dim': 4,
            'action_dim': 2, 'if_discrete': True}
    hop = {'env_name': 'HopperSlip-v0', 'max_step': 1000, 'state_dim': 6,
           'action_dim': 2, 'if_discrete': False}
    rows = [
        ('TD3/Pendulum', PendulumEnv, pend, AgentTD3),
        ('SAC/Pendulum', PendulumEnv, pend, AgentSAC),
        ('ModSAC/Pendulum', PendulumEnv, pend, AgentModSAC),
        ('SAC/HopperSlip', HopperEnv, hop, AgentSAC),
        ('DQN/CartPole', CartPoleEnv, cart, AgentDQN),
        ('D3QN/CartPole', CartPoleEnv, cart, AgentD3QN),
    ]
    print(f"| rollout half only: num_envs={NUM_ENVS} horizon={HORIZON} "
          f"rounds={ROUNDS} net=(64,64)")
    print(f"| {'head/env':20s} {'scan (M/s)':>11s} {'fused (M/s)':>12s} "
          f"{'speedup':>8s}")
    for name, env_class, env_args, agent_class in rows:
        slow = bench_rollout_only(env_class, env_args, agent_class, False)
        fast = bench_rollout_only(env_class, env_args, agent_class, True)
        print(f"| {name:20s} {slow / 1e6:11.1f} {fast / 1e6:12.1f} "
              f"{fast / slow:7.1f}x", flush=True)

    # full TD3 round at the td3_hopper verify-row shape
    # (verify_learning.py: 1024 envs, horizon 32, batch 1024, repeat 4)
    ne, hz, bs = 1024, 32, 1024
    slow = bench_full_round(HopperEnv, hop, AgentTD3, False, ne, hz, bs)
    fast = bench_full_round(HopperEnv, hop, AgentTD3, True, ne, hz, bs)
    print(f"| full TD3 round ({ne} envs x {hz} steps, batch {bs}): "
          f"scan {slow / 1e6:.1f}M -> fused {fast / 1e6:.1f}M env-steps/s "
          f"({fast / slow:.1f}x)", flush=True)


if __name__ == '__main__':
    main()
