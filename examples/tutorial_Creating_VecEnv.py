"""Tutorial 5 — creating your own vectorized environment.

Runnable port of the reference's ``tutorial_Creating_ChasingVecEnv.ipynb``
flow, restated for the pure-functional env protocol.  The reference builds a
stateful torch VecEnv class with in-place batch tensors; here an env is
three pure functions over a state pytree, and the framework vmaps/scans them
— one definition gives you 1 env or 100k envs.

The example task: a 1-D "reach the target" toy (position + velocity,
acceleration action) built from scratch below, then trained with PPO.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python examples/tutorial_Creating_VecEnv.py
Expected: avgR rises above -2 within ~3e4 steps (a random policy sits
around -10), printing the eval table along the way.
"""

import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402

from elegantrl_tpu.config import Config                     # noqa: E402
from elegantrl_tpu.agents import AgentPPO                   # noqa: E402
from elegantrl_tpu.envs.base import EnvDef, EnvSpec, VecEnv  # noqa: E402
from elegantrl_tpu.train.runner import train_agent          # noqa: E402


# ---- Step 1: the state pytree.  One INSTANCE, no batch axis: the
# framework adds vectorization with vmap.
class ReachState(NamedTuple):
    pos: jax.Array      # ()
    vel: jax.Array      # ()
    target: jax.Array   # ()
    t: jax.Array        # () int32


# ---- Step 2: three pure functions.
def reach_init(key: jax.Array) -> ReachState:
    k1, k2 = jax.random.split(key)
    return ReachState(pos=jax.random.uniform(k1, (), jnp.float32, -1.0, 1.0),
                      vel=jnp.zeros(()),
                      target=jax.random.uniform(k2, (), jnp.float32, -2.0, 2.0),
                      t=jnp.zeros((), jnp.int32))


def reach_obs(s: ReachState) -> jax.Array:
    return jnp.stack([s.pos, s.vel, s.target - s.pos])


def reach_step(s: ReachState, action: jax.Array, key: jax.Array):
    del key                                   # deterministic dynamics
    acc = jnp.clip(action[0], -1.0, 1.0)
    vel = s.vel * 0.9 + acc * 0.2
    pos = s.pos + vel * 0.1
    dist = jnp.abs(s.target - pos)
    reward = -dist * 0.1 + jnp.where(dist < 0.05, 1.0, 0.0)
    t = s.t + 1
    terminal = dist < 0.05
    truncate = jnp.logical_and(t >= 100, jnp.logical_not(terminal))
    return ReachState(pos, vel, s.target, t), reward, terminal, truncate


# ---- Step 3: bundle as an EnvDef with the six protocol attributes the
# reference stamps onto every env (config.py:134-135).
def make_reach() -> EnvDef:
    spec = EnvSpec(env_name='Reach1D-v0', num_envs=1, max_step=100,
                   state_dim=3, action_dim=1, if_discrete=False)
    return EnvDef(spec=spec, init=reach_init, obs=reach_obs, step=reach_step)


# Optional: a stateful adapter with gym-style reset()/step() for external
# tooling (the framework itself consumes the EnvDef directly).
class ReachEnv(VecEnv):
    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_reach(), num_envs=num_envs, seed=seed)


# ---- Step 4: train on it — nothing else to write.
def main():
    args = Config(AgentPPO, ReachEnv,
                  {'env_name': 'Reach1D-v0', 'num_envs': 32, 'max_step': 100,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (32, 32)
    args.gamma = 0.95
    args.horizon_len = 100
    args.repeat_times = 16
    args.batch_size = 128
    args.learning_rate = 1e-3
    args.eval_per_step = 6400
    args.eval_times = 16
    args.break_step = int(4e4)
    return train_agent(args)


if __name__ == '__main__':
    main()
