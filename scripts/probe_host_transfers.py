"""Measure per-round host-rollout transfer costs on the tunneled TPU.

Times the three device interactions of the host-rollout loop for a
ModSAC-sized agent state (the modsac_lander_host config):
  1. params fetch     device -> cpu   (jax.device_put of the state pytree)
  2. packed fetch     one flat-array fetch of the same bytes (ravel_pytree)
  3. rollout upload   cpu -> device   (one round's rollout pytree)
  4. update dispatch+exec (jitted no-op-ish reduction over the state)

Run on the real TPU: ``python scripts/probe_host_transfers.py``.
"""
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentModSAC
from elegantrl_tpu.train.runner import build_training
from elegantrl_tpu.envs.pendulum import PendulumEnv


def t(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    args = Config(AgentModSAC, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 16, 'max_step': 200,
                   'state_dim': 8, 'action_dim': 2, 'if_discrete': False})
    args.net_dims = (256, 256)
    args.horizon_len = 64
    args.buffer_size = int(5e4)
    args.batch_size = 1024
    ctx = build_training(args)
    state = ctx.carry.agent_state
    cpu = jax.devices('cpu')[0]

    leaves = jax.tree.leaves(state)
    nbytes = sum(x.size * x.dtype.itemsize for x in leaves)
    print(f"agent_state: {len(leaves)} leaves, {nbytes/1e6:.2f} MB")

    def fetch_tree():
        s = jax.device_put(state, cpu)
        jax.block_until_ready(s)
        _ = float(jnp.sum(jax.tree.leaves(s)[0]))  # force (axon: block lies)

    flat0, unravel = ravel_pytree(state)
    pack = jax.jit(lambda s: ravel_pytree(s)[0])

    def fetch_flat():
        f = np.asarray(pack(state))
        _ = f[0]

    ro = {
        'states': np.zeros((64, 16, 8), np.float32),
        'actions': np.zeros((64, 16, 2), np.float32),
        'rewards': np.zeros((64, 16), np.float32),
    }

    def upload_rollout():
        d = jax.device_put(ro)
        _ = float(jnp.sum(d['rewards']))

    metr = jax.jit(lambda s: jnp.stack(
        [jnp.sum(x) for x in jax.tree.leaves(s)[:4]]))

    def fetch_metrics():
        _ = np.asarray(metr(state))

    print(f"params fetch (pytree device_put): {t(fetch_tree)*1e3:8.1f} ms")
    print(f"params fetch (flat ravel+1 xfer): {t(fetch_flat)*1e3:8.1f} ms")
    print(f"rollout upload (3-leaf pytree):   {t(upload_rollout)*1e3:8.1f} ms")
    print(f"metrics fetch (packed 4-scalar):  {t(fetch_metrics)*1e3:8.1f} ms")


if __name__ == '__main__':
    main()
