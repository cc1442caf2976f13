"""CartPole-v1 re-derived in pure JAX (discrete-action DQN test env).

The reference uses gymnasium ``CartPole-v1`` as its DQN fixture
(``examples/demo_DQN_variants.py``, ``unit_tests/agents/test_agents.py``).
Dynamics re-derived from the classic cart-pole equations (Barto-Sutton-
Anderson), Euler integration dt=0.02, force +-10 N:

    temp      = (F + m_p l w^2 sin(th)) / (m_c + m_p)
    th_acc    = (g sin(th) - cos(th) temp) / (l (4/3 - m_p cos^2(th)/(m_c+m_p)))
    x_acc     = temp - m_p l th_acc cos(th) / (m_c + m_p)

Terminal when |x| > 2.4 or |theta| > 12 deg; truncate at 500 steps;
reward 1.0 every step.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_GRAVITY = 9.8
_M_CART = 1.0
_M_POLE = 0.1
_M_TOTAL = _M_CART + _M_POLE
_L_HALF = 0.5  # half pole length
_POLEMASS_LENGTH = _M_POLE * _L_HALF
_FORCE = 10.0
_DT = 0.02
_THETA_LIMIT = 12.0 * 2.0 * math.pi / 360.0
_X_LIMIT = 2.4
_MAX_STEP = 500


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array  # int32 step counter


def _init(key: jax.Array) -> CartPoleState:
    v = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
    return CartPoleState(v[0], v[1], v[2], v[3], jnp.zeros((), jnp.int32))


def _obs(s: CartPoleState) -> jax.Array:
    return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot])


def _step(s: CartPoleState, action: jax.Array, key: jax.Array):
    del key
    force = jnp.where(action.astype(jnp.int32) == 1, _FORCE, -_FORCE)
    cos_t = jnp.cos(s.theta)
    sin_t = jnp.sin(s.theta)
    temp = (force + _POLEMASS_LENGTH * jnp.square(s.theta_dot) * sin_t) / _M_TOTAL
    theta_acc = (_GRAVITY * sin_t - cos_t * temp) / (
        _L_HALF * (4.0 / 3.0 - _M_POLE * jnp.square(cos_t) / _M_TOTAL))
    x_acc = temp - _POLEMASS_LENGTH * theta_acc * cos_t / _M_TOTAL

    x = s.x + _DT * s.x_dot
    x_dot = s.x_dot + _DT * x_acc
    theta = s.theta + _DT * s.theta_dot
    theta_dot = s.theta_dot + _DT * theta_acc
    t = s.t + 1

    terminal = ((jnp.abs(x) > _X_LIMIT) | (jnp.abs(theta) > _THETA_LIMIT))
    truncate = jnp.logical_and(t >= _MAX_STEP, jnp.logical_not(terminal))
    reward = jnp.ones((), jnp.float32)
    return CartPoleState(x, x_dot, theta, theta_dot, t), reward, terminal, truncate


def make_cartpole() -> EnvDef:
    spec = EnvSpec(env_name='CartPole-v1', num_envs=1, max_step=_MAX_STEP,
                   state_dim=4, action_dim=2, if_discrete=True)
    return EnvDef(spec=spec, init=_init, obs=_obs, step=_step)


class CartPoleEnv(VecEnv):
    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_cartpole(), num_envs=num_envs, seed=seed)
