"""Point-chasing pursuit env in pure JAX.

Capability match for the reference's ``PointChasingEnv`` /
``PointChasingVecEnv`` / ``PointChasingDiscreteEnv``
(``elegantrl/envs/PointChasingEnv.py``): point 1 (the agent) chases point 0
(random walker).  Same dynamics:

    a       <- a / max(||a||, 1)
    v1      <- 0.75 v1 + a;          p1 += 0.01 v1
    v0      <- 0.50 v0 + U[0,1)^dim; p0 += 0.01 v0
    reward  =  prev_distance - distance - 0.02 ||a||
    terminal = distance < dim  or  step == 2^10

The discrete variant encodes a 3^dim action grid (each dim in {-1, 0, +1},
reference ``PointChasingEnv.py:185-210``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_MAX_STEP = 2 ** 10
_INIT_DISTANCE = 8.0


class ChasingState(NamedTuple):
    p0: jax.Array  # (dim,) position of the random walker
    v0: jax.Array
    p1: jax.Array  # (dim,) position of the chaser (agent)
    v1: jax.Array
    distance: jax.Array  # () previous-step distance, for delta reward
    t: jax.Array         # () int32


def _make_init(dim: int):
    def init(key: jax.Array) -> ChasingState:
        k0, k1 = jax.random.split(key)
        p0 = jax.random.normal(k0, (dim,), jnp.float32)
        p1 = jax.random.normal(k1, (dim,), jnp.float32) - _INIT_DISTANCE
        distance = jnp.sqrt(jnp.sum(jnp.square(p0 - p1)))
        return ChasingState(p0, jnp.zeros(dim), p1, jnp.zeros(dim),
                            distance, jnp.zeros((), jnp.int32))
    return init


def _obs(s: ChasingState) -> jax.Array:
    return jnp.concatenate([s.p0, s.v0, s.p1, s.v1])


def _make_step(dim: int):
    def step(s: ChasingState, action: jax.Array, key: jax.Array):
        action_l2 = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(action))), 1.0)
        action = action / action_l2

        v1 = s.v1 * 0.75 + action
        p1 = s.p1 + v1 * 0.01

        v0 = s.v0 * 0.50 + jax.random.uniform(key, (dim,), jnp.float32)
        p0 = s.p0 + v0 * 0.01

        distance = jnp.sqrt(jnp.sum(jnp.square(p0 - p1)))
        reward = s.distance - distance - action_l2 * 0.02

        t = s.t + 1
        terminal = jnp.logical_or(distance < dim, t >= _MAX_STEP)
        truncate = jnp.zeros((), jnp.bool_)
        return (ChasingState(p0, v0, p1, v1, distance, t),
                reward, terminal, truncate)
    return step


def make_point_chasing(dim: int = 2) -> EnvDef:
    spec = EnvSpec(env_name='PointChasingVecEnv', num_envs=1, max_step=_MAX_STEP,
                   state_dim=dim * 4, action_dim=dim, if_discrete=False)
    return EnvDef(spec=spec, init=_make_init(dim), obs=_obs, step=_make_step(dim))


def make_point_chasing_discrete(dim: int = 2) -> EnvDef:
    """3^dim discrete action grid; index digit d (base 3) maps to {-1,0,+1}."""
    cont_step = _make_step(dim)

    def step(s: ChasingState, action: jax.Array, key: jax.Array):
        idx = action.astype(jnp.int32)
        digits = (idx // (3 ** jnp.arange(dim))) % 3
        cont_action = digits.astype(jnp.float32) - 1.0
        return cont_step(s, cont_action, key)

    spec = EnvSpec(env_name='PointChasingDiscreteEnv', num_envs=1,
                   max_step=_MAX_STEP, state_dim=dim * 4, action_dim=3 ** dim,
                   if_discrete=True)
    return EnvDef(spec=spec, init=_make_init(dim), obs=_obs, step=step)


class PointChasingVecEnv(VecEnv):
    def __init__(self, dim: int = 2, env_num: int = 32, num_envs: int = None,
                 seed: int = 0, **_kwargs):
        super().__init__(make_point_chasing(dim),
                         num_envs=num_envs or env_num, seed=seed)


class PointChasingEnv(PointChasingVecEnv):
    def __init__(self, dim: int = 2, seed: int = 0, **_kwargs):
        super().__init__(dim=dim, env_num=1, seed=seed)


class PointChasingDiscreteEnv(VecEnv):
    def __init__(self, dim: int = 2, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_point_chasing_discrete(dim), num_envs=num_envs, seed=seed)
