"""LunarLander (discrete + continuous) re-derived in pure JAX.

Capability match for the reference's LunarLander baselines
(``examples/demo_DDPG_TD3_SAC.py`` LunarLanderContinuous-v2,
``examples/demo_A2C_PPO_discrete.py`` LunarLander-v2).  The original is a
Box2D rigid-body simulation; this is a faithful *re-derivation* of the
control problem — same observation layout, action semantics, reward shaping
and termination rules as gymnasium's implementation — over point-mass +
rotation dynamics with leg-contact landing, rather than a bit-exact Box2D
port:

- obs (8,): [x, y, vx, vy, theta, omega, leg1_contact, leg2_contact]
  with gym's scalings;
- discrete actions {noop, left engine, main engine, right engine};
  continuous actions [main in -1..1 (fires if > 0), lateral in -1..1
  (fires if |a| > 0.5)];
- reward = shaping delta (-100*dist - 100*speed - 100*|angle|
  + 10 per leg contact) - fuel (0.3 main / 0.03 side per step);
  +100 on safe landing, -100 on crash / flying out; episodes truncate
  at 1000 steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_FPS = 50.0
_DT = 1.0 / _FPS
_GRAVITY = -10.0
_MAIN_POWER = 13.0
_SIDE_POWER = 0.6
_MASS = 1.0  # full main thrust = 13 vs gravity 10: TWR 1.3, like the game
_INERTIA = 1.0
_LEG_DX = 0.18          # leg horizontal offset (normalized units)
_LEG_DY = -0.26         # leg vertical offset from center
_INIT_Y = 1.4
_INIT_FORCE = 8.0       # random initial push, like gym's INITIAL_RANDOM
_MAX_STEP = 1000
_VEL_SCALE = 5.0        # obs velocity scaling ~ (VIEWPORT/SCALE/2)/FPS terms


class LanderState(NamedTuple):
    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    theta: jax.Array
    omega: jax.Array
    t: jax.Array
    prev_shaping: jax.Array


def _leg_contacts(x, y, theta):
    """Leg tip heights; contact when tip at/below ground (y=0)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    tips = []
    for dx in (-_LEG_DX, _LEG_DX):
        ly = y + dx * s + _LEG_DY * c
        tips.append(ly <= 0.0)
    return tips[0], tips[1]


def _shaping(x, y, vx, vy, theta, leg1, leg2):
    return (-100.0 * jnp.sqrt(x * x + y * y)
            - 100.0 * jnp.sqrt(vx * vx + vy * vy) / _VEL_SCALE
            - 100.0 * jnp.abs(theta)
            + 10.0 * leg1.astype(jnp.float32)
            + 10.0 * leg2.astype(jnp.float32))


def _init(key: jax.Array) -> LanderState:
    k1, k2 = jax.random.split(key)
    fx = jax.random.uniform(k1, (), jnp.float32, -_INIT_FORCE, _INIT_FORCE)
    fy = jax.random.uniform(k2, (), jnp.float32, -_INIT_FORCE, _INIT_FORCE)
    x = jnp.zeros(())
    y = jnp.asarray(_INIT_Y)
    vx, vy = fx * _DT * 4.0, fy * _DT * 4.0
    l1, l2 = _leg_contacts(x, y, jnp.zeros(()))
    shaping = _shaping(x, y, vx, vy, jnp.zeros(()), l1, l2)
    return LanderState(x, y, vx, vy, jnp.zeros(()), jnp.zeros(()),
                       jnp.zeros((), jnp.int32), shaping)


def _obs(s: LanderState) -> jax.Array:
    l1, l2 = _leg_contacts(s.x, s.y, s.theta)
    return jnp.stack([s.x, s.y, s.vx / _VEL_SCALE, s.vy / _VEL_SCALE,
                      s.theta, s.omega,
                      l1.astype(jnp.float32), l2.astype(jnp.float32)])


def _dynamics(s: LanderState, main: jax.Array, side: jax.Array,
              key: jax.Array):
    """main in [0,1] (throttle), side in [-1,1] (signed lateral throttle)."""
    del key
    c, sn = jnp.cos(s.theta), jnp.sin(s.theta)
    # main engine thrusts along the body's up axis
    fx = -sn * main * _MAIN_POWER
    fy = c * main * _MAIN_POWER
    # side engines push laterally and torque the body
    fx = fx + c * side * _SIDE_POWER * 6.0
    fy = fy + sn * side * _SIDE_POWER * 6.0
    torque = -side * _SIDE_POWER * 4.0

    vx = s.vx + (fx / _MASS) * _DT
    vy = s.vy + (fy / _MASS + _GRAVITY) * _DT
    omega = s.omega + (torque / _INERTIA) * _DT
    x = s.x + vx * _DT
    y = s.y + vy * _DT
    theta = s.theta + omega * _DT

    l1, l2 = _leg_contacts(x, y, theta)
    grounded = jnp.logical_or(l1, l2)
    vy_impact, vx_impact = vy, vx  # pre-damping velocities at contact
    # ground contact: kill downward velocity, damp horizontal + rotation
    vy = jnp.where(grounded & (vy < 0), 0.0, vy)
    vx = jnp.where(grounded, vx * 0.5, vx)
    omega = jnp.where(grounded, omega * 0.5, omega)

    t = s.t + 1
    new = LanderState(x, y, vx, vy, theta, omega, t, s.prev_shaping)

    # shaping uses the physical (pre-damping) velocities so a hard impact
    # keeps its -100*speed penalty instead of being zeroed for free
    shaping = _shaping(x, y, vx_impact, vy_impact, theta, l1, l2)
    reward = shaping - s.prev_shaping
    reward = reward - 0.30 * main - 0.03 * jnp.abs(side)
    new = new._replace(prev_shaping=shaping)

    # termination: a hard or tilted first contact is a crash; a gentle,
    # upright, at-rest two-leg contact is a safe landing (gym semantics:
    # body contact / out-of-view = game over, resting = success)
    was_grounded = jnp.logical_or(*_leg_contacts(s.x, s.y, s.theta))
    first_contact = grounded & jnp.logical_not(was_grounded)
    crashed = first_contact & ((vy_impact < -1.2) | (jnp.abs(theta) > 0.4))
    crashed = crashed | (grounded & (jnp.abs(theta) > 0.4))
    out = jnp.abs(x) > 1.5
    landed = (l1 & l2 & (jnp.abs(theta) < 0.2)
              & (jnp.abs(vx) < 0.05) & (jnp.abs(vy) < 0.05)
              & (jnp.abs(omega) < 0.05))
    terminal = crashed | out | landed
    reward = jnp.where(crashed | out, reward - 100.0, reward)
    reward = jnp.where(landed, reward + 100.0, reward)
    truncate = jnp.logical_and(t >= _MAX_STEP, jnp.logical_not(terminal))
    return new, reward, terminal, truncate


def make_lunar_lander(continuous: bool = False) -> EnvDef:
    if continuous:
        def step(s, action, key):
            # gym semantics: main fires if a0 > 0 with power 0.5+0.5*a0;
            # side fires if |a1| > 0.5
            main = jnp.where(action[0] > 0.0, 0.5 + 0.5 * jnp.clip(action[0], 0, 1), 0.0)
            side = jnp.where(jnp.abs(action[1]) > 0.5,
                             jnp.sign(action[1]) * jnp.abs(jnp.clip(action[1], -1, 1)),
                             0.0)
            return _dynamics(s, main, side, key)

        spec = EnvSpec(env_name='LunarLanderContinuous-v2', num_envs=1,
                       max_step=_MAX_STEP, state_dim=8, action_dim=2,
                       if_discrete=False)
    else:
        def step(s, action, key):
            a = action.astype(jnp.int32)
            main = jnp.where(a == 2, 1.0, 0.0)
            side = jnp.where(a == 1, -1.0, jnp.where(a == 3, 1.0, 0.0))
            return _dynamics(s, main, side, key)

        spec = EnvSpec(env_name='LunarLander-v2', num_envs=1,
                       max_step=_MAX_STEP, state_dim=8, action_dim=4,
                       if_discrete=True)
    return EnvDef(spec=spec, init=_init, obs=_obs, step=step)


class LunarLanderEnv(VecEnv):
    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_lunar_lander(False), num_envs=num_envs, seed=seed)


class LunarLanderContinuousEnv(VecEnv):
    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_lunar_lander(True), num_envs=num_envs, seed=seed)
