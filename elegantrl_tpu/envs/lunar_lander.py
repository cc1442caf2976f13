"""LunarLander (discrete + continuous) re-derived in pure JAX.

Capability match for the reference's LunarLander baselines
(``examples/demo_DDPG_TD3_SAC.py`` LunarLanderContinuous-v2,
``examples/demo_A2C_PPO_discrete.py`` LunarLander-v2).  The original is a
Box2D rigid-body simulation; this is a re-derivation of the control problem
over point-mass + rotation dynamics with leg-contact landing, rather than a
bit-exact Box2D port.

The dynamics are CALIBRATED against gymnasium's Box2D implementation in
observation units (measured per-step responses on this machine; see
``scripts/physics_parity.py`` which reproduces the measurement):

- gravity:         d(obs_vy)/step = -0.0267
- full main:       +0.0372 * throttle along body up   (throttle in [0.5, 1])
- full side:       +-0.0359/step on obs_omega, 0.0089 lateral on obs_vx
- integration:     dx = 0.0100 * vx, dy = 0.0225 * vy, dtheta = 0.05 * omega
  (per step, semi-implicit: velocities update first)
- reset:           y ~= 1.41, vx ~ U(+-0.84), vy ~ U(+-0.55), omega ~ U(+-0.19)

Observation/action/reward semantics follow gym: obs (8,) = [x, y, vx, vy,
theta, omega, leg1, leg2]; continuous action [main (fires if > 0, throttle
0.5 + 0.5a), side (fires if |a| > 0.5)]; discrete {noop, left, main, right};
reward = shaping delta (-100 dist - 100 speed - 100|theta| + 10/leg)
- fuel (0.3 main / 0.03 side), +-100 terminal bonus; |x| >= 1 or body
contact = crash; at-rest leg contact = landed; truncate at 1000 steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_MAX_STEP = 1000

# calibrated per-step deltas in observation units (see module docstring)
_GRAVITY_DVY = -0.0267
_MAIN_DV = 0.0372        # at throttle 1.0, along body-up, on the vy channel
_VXY_RATIO = 0.0089 / 0.00592  # obs_vx and obs_vy use different unit scales
_SIDE_DVX = 0.0089       # at full side power, lateral, on the vx channel
_SIDE_DOMEGA = 0.0359
_DX_PER_VX = 0.0100
_DY_PER_VY = 0.0225
_DTHETA_PER_OMEGA = 0.05

_INIT_Y = 1.41
_INIT_VX = 0.84
_INIT_VY = 0.55
_INIT_OMEGA = 0.19
_LEG_DX = 0.12           # leg horizontal offset in obs units (tilt lever)
_BODY_CLEARANCE = 0.05   # body touches ground this far below leg contact


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
    """Leg tip heights; contact when tip at/below ground (obs y = 0 is the
    pad surface at leg level, matching gym's obs convention)."""
    s = jnp.sin(theta)
    return (y - _LEG_DX * s) <= 0.0, (y + _LEG_DX * s) <= 0.0


def _shaping(x, y, vx, vy, theta, leg1, leg2):
    """Gym's shaping, which operates directly on observation values."""
    return (-100.0 * jnp.sqrt(x * x + y * y)
            - 100.0 * jnp.sqrt(vx * vx + vy * vy)
            - 100.0 * jnp.abs(theta)
            + 10.0 * leg1.astype(jnp.float32)
            + 10.0 * leg2.astype(jnp.float32))


def _init(key: jax.Array) -> LanderState:
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.zeros(())
    y = jnp.asarray(_INIT_Y)
    vx = jax.random.uniform(k1, (), jnp.float32, -_INIT_VX, _INIT_VX)
    vy = jax.random.uniform(k2, (), jnp.float32, -_INIT_VY, _INIT_VY)
    omega = jax.random.uniform(k3, (), jnp.float32, -_INIT_OMEGA, _INIT_OMEGA)
    l1, l2 = _leg_contacts(x, y, jnp.zeros(()))
    shaping = _shaping(x, y, vx, vy, jnp.zeros(()), l1, l2)
    return LanderState(x, y, vx, vy, jnp.zeros(()), omega,
                       jnp.zeros((), jnp.int32), shaping)


def _obs(s: LanderState) -> jax.Array:
    l1, l2 = _leg_contacts(s.x, s.y, s.theta)
    return jnp.stack([s.x, s.y, s.vx, s.vy, s.theta, s.omega,
                      l1.astype(jnp.float32), l2.astype(jnp.float32)])


def _dynamics(s: LanderState, main: jax.Array, side: jax.Array,
              key: jax.Array):
    """``main``: throttle in {0} u [0.5, 1]; ``side``: signed throttle in
    {0} u +-[0.5, 1] (gym's power semantics, applied by the action maps)."""
    del key
    c, sn = jnp.cos(s.theta), jnp.sin(s.theta)
    # main engine along body up; side engines push laterally + torque.
    # obs_vx and obs_vy are in different unit scales (gym scales by viewport
    # half-width vs half-height), hence the _VXY_RATIO on cross terms.
    dvx = (-sn * main * _MAIN_DV * _VXY_RATIO + c * side * _SIDE_DVX)
    dvy = (c * main * _MAIN_DV + sn * side * _SIDE_DVX / _VXY_RATIO
           + _GRAVITY_DVY)
    domega = -side * _SIDE_DOMEGA

    vx = s.vx + dvx
    vy = s.vy + dvy
    omega = s.omega + domega
    # semi-implicit Euler like Box2D: positions integrate the NEW velocities
    x = s.x + _DX_PER_VX * vx
    y = s.y + _DY_PER_VY * vy
    theta = s.theta + _DTHETA_PER_OMEGA * omega

    l1, l2 = _leg_contacts(x, y, theta)
    grounded = jnp.logical_or(l1, l2)
    vy_impact, vx_impact = vy, vx  # pre-damping velocities at contact
    # ground contact: kill downward velocity, damp horizontal + rotation
    vy = jnp.where(grounded & (vy < 0), 0.0, vy)
    vx = jnp.where(grounded, vx * 0.5, vx)
    omega = jnp.where(grounded, omega * 0.5, omega)
    # legs settle: the body rocks onto both legs (theta decays to 0) like the
    # Box2D lander coming to rest on its two leg fixtures
    settling = grounded & (jnp.abs(theta) < 0.4)
    theta = jnp.where(settling, theta * 0.8, theta)
    y = jnp.where(settling & (y < 0), 0.0, y)

    t = s.t + 1
    new = LanderState(x, y, vx, vy, theta, omega, t, s.prev_shaping)

    # shaping uses the physical (pre-damping) velocities so a hard impact
    # keeps its -100*speed penalty instead of being zeroed for free
    shaping = _shaping(x, y, vx_impact, vy_impact, theta, l1, l2)
    reward = shaping - s.prev_shaping
    reward = reward - 0.30 * main - 0.03 * jnp.abs(side)
    new = new._replace(prev_shaping=shaping)

    # termination (gym semantics): body/ground contact or |x| >= 1 = crash;
    # gentle upright at-rest leg contact = landed.  A hard vertical impact
    # is also a crash: in Box2D the body's momentum carries it into the
    # ground through the legs, while this point-mass model zeroes vy at
    # contact — without this check a policy could slam down at any speed
    # and still collect the +100 landing bonus (obs vy -0.55 ~= the fastest
    # survivable Box2D touchdown; free fall reaches ~-1.8)
    body_hit = (y - jnp.abs(_LEG_DX * jnp.sin(theta))) < -_BODY_CLEARANCE
    hard_impact = grounded & (vy_impact < -0.55)
    crashed = body_hit | hard_impact | (grounded & (jnp.abs(theta) > 0.4))
    out = jnp.abs(x) >= 1.0
    landed = (grounded & (jnp.abs(theta) < 0.1)
              & (jnp.abs(vx) < 0.02) & (jnp.abs(vy) < 0.02)
              & (jnp.abs(omega) < 0.02))
    terminal = crashed | out | landed
    reward = jnp.where(crashed | out, reward - 100.0, reward)
    reward = jnp.where(landed, reward + 100.0, reward)
    truncate = jnp.logical_and(t >= _MAX_STEP, jnp.logical_not(terminal))
    return new, reward, terminal, truncate


def make_lunar_lander(continuous: bool = False) -> EnvDef:
    if continuous:
        def step(s, action, key):
            # gym: main fires if a0 > 0 with throttle 0.5 + 0.5*clip(a0);
            # side fires if |a1| > 0.5 with throttle clip(|a1|, 0.5, 1)
            main = jnp.where(action[0] > 0.0,
                             0.5 + 0.5 * jnp.clip(action[0], 0, 1), 0.0)
            side = jnp.where(jnp.abs(action[1]) > 0.5,
                             jnp.sign(action[1])
                             * jnp.clip(jnp.abs(action[1]), 0.5, 1.0), 0.0)
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
