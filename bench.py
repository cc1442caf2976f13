"""Benchmark: PPO env-steps/s on Pendulum with 4096 vectorized envs, 1 chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Baseline: the reference trains Pendulum PPO (4 workers, 1 GPU) through
8.08e4 env steps in 202 s wall-clock == ~400 env-steps/s
(``/root/reference/examples/demo_A2C_PPO.py:44-53``; see BASELINE.md).
``vs_baseline`` is our sustained env-steps/s divided by that rate.  The
measured program is the full fused actor-learner round (rollout + GAE +
minibatch SGD), scanned ROUNDS times inside one dispatch.

Timing methodology: on the tunneled TPU platform ``block_until_ready``
returns before execution completes, so each measurement forces execution
with a scalar fetch; the fetch round-trip (measured on a trivial op) is
subtracted.
"""

import json
import os
import subprocess
import sys
import time

NUM_ENVS = 4096
HORIZON = 64
ROUNDS = 200
BASELINE_STEPS_PER_SEC = 8.08e4 / 202.0  # reference demo_A2C_PPO.py:44-53


def main():
    """The tunneled TPU occasionally wedges a fresh process's device claim
    (all threads futex-wait; recovers after minutes).  Run the measurement in
    a child process with a timeout and one retry so a single wedge can't eat
    the benchmark."""
    for attempt in range(3):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=900)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(120)  # let the relay recover the grant
    raise SystemExit("bench: device claim failed 3 times")


def child():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_args
    from elegantrl_tpu.train.runner import build_training

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

    args = _make_args(num_envs=NUM_ENVS, horizon_len=HORIZON, batch_size=512)
    ctx = build_training(args)

    def run(c):
        c2, _ = jax.lax.scan(ctx.round_fn, c, None, length=ROUNDS)
        return c2

    step = jax.jit(run)
    carry = step(ctx.carry)                     # compile
    fetch(carry.obs)                            # force warmup execution
    rtt = measure_rtt()

    ts = []
    for _ in range(3):
        carry2 = step(carry)
        t0 = time.perf_counter()
        fetch(carry2.obs)
        ts.append(time.perf_counter() - t0)
        carry = carry2
    dt = max(min(ts) - rtt, 1e-9)

    steps = ROUNDS * NUM_ENVS * HORIZON
    sps = steps / dt
    print(json.dumps({
        "metric": "ppo_pendulum_env_steps_per_s_4096envs_1chip",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    child() if "--child" in sys.argv else main()
