"""Phase-timing probe for the SAC MuJoCo host-rollout round.

RESULTS.md's sac_*_mujoco_host rows sustain ~400-630 env-steps/s
(~3.3 s per 2048-step round) — far above the ~150 ms the loop-anatomy
table (docs/performance.md) predicts from its lander measurements.  This
times each phase of the real config's round to find where the time goes:

    python scripts/host_sac_profile.py [env_id] [rounds]
"""

import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentSAC
from elegantrl_tpu.envs.gym_parity import gym_env_def, get_env_args
from elegantrl_tpu.train.runner import build_training
from elegantrl_tpu.utils.compile_cache import enable_compilation_cache


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else 'Hopper-v5'
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    enable_compilation_cache()

    env = gym_env_def(env_id, num_threads=16)
    args = Config(AgentSAC, env, get_env_args(env, num_envs=64))
    args.net_dims = (256, 256)
    args.gamma = 0.99
    args.horizon_len = 32
    args.repeat_times = 2048
    args.learning_rate = 3e-4
    args.batch_size = 512
    args.buffer_size = int(3.2e4)
    args.reward_scale = 2 ** -2
    args.cwd = '/tmp/host_sac_profile'

    ctx = build_training(args)
    agent, envd = ctx.agent, ctx.env
    carry = ctx.carry

    from elegantrl_tpu.envs.host_env import (host_collect_rollout,
                                             make_explore_env_fn,
                                             make_params_fetcher)
    cpu = jax.devices('cpu')[0]
    params_fetch = make_params_fetcher(agent.explore_view, agent.explore_merge,
                                       carry.agent_state, cpu)
    explore_env_jit = make_explore_env_fn(agent)

    @jax.jit
    def update_packed(carry, rollout, last_obs):
        carry, metrics = ctx.update_from_rollout(carry, rollout, last_obs)
        return carry, metrics['obj_critic']

    obs_host = np.asarray(carry.obs)
    with jax.default_device(cpu):
        k_host = jax.random.key(7)

    t_fetch = t_roll = t_up = t_updisp = t_sync = 0.0
    # warm up compiles (one full round) before timing
    for i in range(n_rounds + 1):
        if i == 1:
            t_fetch = t_roll = t_up = t_updisp = t_sync = 0.0
            t_all0 = time.perf_counter()
        t0 = time.perf_counter()
        params_cpu = params_fetch(carry.agent_state)
        t1 = time.perf_counter()
        with jax.default_device(cpu):
            k_host, k_roll = jax.random.split(k_host)
        arrs, obs_host = host_collect_rollout(
            envd.host_pool, explore_env_jit, params_cpu,
            obs_host, k_roll, int(args.horizon_len),
            float(args.reward_scale), cpu)
        t2 = time.perf_counter()
        rollout = jax.tree.map(jnp.asarray, arrs)
        last = jnp.asarray(obs_host)
        t3 = time.perf_counter()
        carry, objc = update_packed(carry, rollout, last)
        t4 = time.perf_counter()
        float(objc)        # force the update to completion
        t5 = time.perf_counter()
        t_fetch += t1 - t0
        t_roll += t2 - t1
        t_up += t3 - t2
        t_updisp += t4 - t3
        t_sync += t5 - t4
    t_total = time.perf_counter() - t_all0

    n = n_rounds
    print(f"env={env_id} rounds={n} horizon={args.horizon_len} x 64 envs "
          f"({args.horizon_len * 64} steps/round), 128 SGD updates/round")
    print(f"  params fetch    : {1e3 * t_fetch / n:8.1f} ms/round")
    print(f"  host rollout    : {1e3 * t_roll / n:8.1f} ms/round")
    print(f"  rollout upload  : {1e3 * t_up / n:8.1f} ms/round")
    print(f"  update dispatch : {1e3 * t_updisp / n:8.1f} ms/round")
    print(f"  update sync     : {1e3 * t_sync / n:8.1f} ms/round")
    print(f"  TOTAL           : {1e3 * t_total / n:8.1f} ms/round "
          f"({args.horizon_len * 64 * n / t_total:.0f} env-steps/s)")
    # per-step rollout breakdown: pure env stepping vs inference+overhead
    a = np.zeros((64, envd.spec.action_dim), np.float32)
    t0 = time.perf_counter()
    for _ in range(200):
        envd.host_pool.step(a)
    dt = time.perf_counter() - t0
    print(f"  pool.step alone : {1e3 * dt / 200:8.2f} ms/step "
          f"({200 * 64 / dt:.0f} env-steps/s raw)")


if __name__ == '__main__':
    main()
