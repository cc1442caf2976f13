"""Pendulum-v1 re-derived in pure JAX.

Capability match for the reference's canonical custom-env demo
(``elegantrl/envs/CustomGymEnv.py:24-44``), which wraps gymnasium
Pendulum-v1 with action scaled x2 (policy acts in [-1,1], torque in [-2,2])
and reward scaled x0.5.  Dynamics re-derived from the classic pendulum
swing-up equations of motion (g=10, m=1, l=1, dt=0.05):

    theta_dot' = clip(theta_dot + (3g/(2l) sin(theta) + 3/(m l^2) u) dt, +-8)
    theta'     = theta + theta_dot' dt
    cost       = wrap(theta)^2 + 0.1 theta_dot^2 + 0.001 u^2

Episodes truncate at 200 steps (TimeLimit), never terminate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_G = 10.0
_M = 1.0
_L = 1.0
_DT = 0.05
_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0
_MAX_STEP = 200


class PendulumState(NamedTuple):
    theta: jax.Array      # ()
    theta_dot: jax.Array  # ()
    t: jax.Array          # () int32 step counter for truncation


def _wrap_angle(x: jax.Array) -> jax.Array:
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


def _init(key: jax.Array) -> PendulumState:
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
    theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
    return PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))


def _obs(s: PendulumState) -> jax.Array:
    return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])


def _step(s: PendulumState, action: jax.Array, key: jax.Array):
    del key  # deterministic dynamics
    # action in [-1, 1] from the policy; the reference wrapper multiplies by 2.
    u = jnp.clip(action[..., 0] * 2.0, -_MAX_TORQUE, _MAX_TORQUE)
    cost = (jnp.square(_wrap_angle(s.theta))
            + 0.1 * jnp.square(s.theta_dot)
            + 0.001 * jnp.square(u))
    theta_dot = s.theta_dot + (3.0 * _G / (2.0 * _L) * jnp.sin(s.theta)
                               + 3.0 / (_M * _L ** 2) * u) * _DT
    theta_dot = jnp.clip(theta_dot, -_MAX_SPEED, _MAX_SPEED)
    theta = s.theta + theta_dot * _DT
    t = s.t + 1
    # Reference wrapper halves the reward (CustomGymEnv.py:44).
    reward = -cost * 0.5
    terminal = jnp.zeros((), jnp.bool_)
    truncate = t >= _MAX_STEP
    return PendulumState(theta, theta_dot, t), reward, terminal, truncate


def make_pendulum() -> EnvDef:
    spec = EnvSpec(env_name='Pendulum-v1', num_envs=1, max_step=_MAX_STEP,
                   state_dim=3, action_dim=1, if_discrete=False)
    return EnvDef(spec=spec, init=_init, obs=_obs, step=_step)


class PendulumEnv(VecEnv):
    """Reference-protocol stateful wrapper (drop-in for
    ``elegantrl.envs.CustomGymEnv.PendulumEnv``)."""

    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_pendulum(), num_envs=num_envs, seed=seed)
