"""Benchmark: PPO env-steps/s on Pendulum with 4096 vectorized envs, 1 chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Baseline: the reference trains Pendulum PPO (4 workers, 1 GPU) through
8.08e4 env steps in 202 s wall-clock == ~400 env-steps/s
(``/root/reference/examples/demo_A2C_PPO.py:44-53``; see BASELINE.md).
``vs_baseline`` is our sustained env-steps/s divided by that rate.  The
measured program is the full fused actor-learner round (rollout + GAE +
128 minibatch SGD steps per round), not rollout alone.
"""

import json
import time

import jax

from __graft_entry__ import _make_args
from elegantrl_tpu.train.runner import build_training

NUM_ENVS = 4096
HORIZON = 64
ROUNDS = 20
BASELINE_STEPS_PER_SEC = 8.08e4 / 202.0  # reference demo_A2C_PPO.py:44-53


def main():
    args = _make_args(num_envs=NUM_ENVS, horizon_len=HORIZON, batch_size=512)
    ctx = build_training(args)
    step = jax.jit(lambda c: ctx.round_fn(c, None)[0], donate_argnums=0)

    carry = step(ctx.carry)        # compile + warmup
    carry = step(carry)
    jax.block_until_ready(carry)

    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        carry = step(carry)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0

    steps = ROUNDS * NUM_ENVS * HORIZON
    sps = steps / dt
    print(json.dumps({
        "metric": "ppo_pendulum_env_steps_per_s_4096envs_1chip",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
