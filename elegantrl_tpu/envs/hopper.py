"""Hopper-style planar locomotion env in pure JAX (SLIP hopping model).

BASELINE.json config 3 calls for "Hopper-style continuous control x1k envs".
MuJoCo's Hopper is an articulated 4-body chain; a faithful rigid-body port is
future work (or use the host-env escape hatch with mujoco installed).  This
env captures the same CONTROL PROBLEM — rhythmic hopping for forward
velocity with an alive bonus and control cost — using the classic
spring-loaded-inverted-pendulum (SLIP) locomotion template:

- state: body (x, z, vx, vz), leg angle/length, phase (flight/stance);
- actions: [leg-angle target (+-0.5 rad), leg thrust (0..1)];
- flight: ballistic body, leg servo to target angle; touchdown when the foot
  reaches the ground;
- stance: radial spring leg (stiffness k) + thrust along the leg, liftoff
  when the leg re-extends;
- reward = vx + 0.5 alive - 0.05 ||a||^2  (Hopper-style shaping);
  terminal when the body falls below crouch height; truncate at 1000 steps.

Thousands of instances hop in lockstep under vmap/scan like every other env
here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import EnvDef, EnvSpec, VecEnv

_DT = 0.01
_G = 9.8
_LEG_LEN = 0.55
_SPRING_K = 300.0
_THRUST = 60.0
_MASS = 1.0
_MIN_Z = 0.25
_MAX_STEP = 1000


class HopperState(NamedTuple):
    x: jax.Array        # body horizontal position
    z: jax.Array        # body height
    vx: jax.Array
    vz: jax.Array
    leg_angle: jax.Array   # from vertical, + = forward
    leg_len: jax.Array     # current (compressed) leg length
    foot_x: jax.Array      # stance foot anchor
    stance: jax.Array      # bool: in ground contact
    t: jax.Array


def _init(key: jax.Array) -> HopperState:
    k1, k2 = jax.random.split(key)
    z = 0.9 + jax.random.uniform(k1, (), jnp.float32, -0.05, 0.05)
    vx = jax.random.uniform(k2, (), jnp.float32, -0.1, 0.1)
    return HopperState(jnp.zeros(()), z, vx, jnp.zeros(()),
                       jnp.zeros(()), jnp.asarray(_LEG_LEN), jnp.zeros(()),
                       jnp.zeros((), jnp.bool_), jnp.zeros((), jnp.int32))


def _obs(s: HopperState) -> jax.Array:
    return jnp.stack([s.z, s.vx, s.vz, s.leg_angle,
                      s.leg_len / _LEG_LEN, s.stance.astype(jnp.float32)])


def _step(s: HopperState, action: jax.Array, key: jax.Array):
    del key
    target_angle = jnp.clip(action[0], -1.0, 1.0) * 0.5
    thrust = jnp.clip(action[1], -1.0, 1.0) * 0.5 + 0.5

    def flight(s):
        # servo the leg toward the target angle; ballistic body
        leg_angle = s.leg_angle + 10.0 * (target_angle - s.leg_angle) * _DT
        vz = s.vz - _G * _DT
        z = s.z + vz * _DT
        x = s.x + s.vx * _DT
        foot_z = z - _LEG_LEN * jnp.cos(leg_angle)
        touchdown = (foot_z <= 0.0) & (vz < 0)
        foot_x = jnp.where(touchdown, x + _LEG_LEN * jnp.sin(leg_angle), s.foot_x)
        return HopperState(x, z, s.vx, vz, leg_angle,
                           jnp.asarray(_LEG_LEN), foot_x, touchdown, s.t)

    def stance(s):
        # spring + thrust along the leg from the anchored foot
        dx = s.x - s.foot_x
        dz = s.z
        leg_len = jnp.sqrt(dx * dx + dz * dz)
        compress = jnp.maximum(_LEG_LEN - leg_len, 0.0)
        force = _SPRING_K * compress + _THRUST * thrust
        ux, uz = dx / (leg_len + 1e-6), dz / (leg_len + 1e-6)
        ax = force * ux / _MASS
        az = force * uz / _MASS - _G
        vx = s.vx + ax * _DT
        vz = s.vz + az * _DT
        x = s.x + vx * _DT
        z = s.z + vz * _DT
        new_len = jnp.sqrt((x - s.foot_x) ** 2 + z * z)
        liftoff = (new_len >= _LEG_LEN) & (vz > 0)
        leg_angle = jnp.arctan2(x - s.foot_x, z)
        return HopperState(x, z, vx, vz, leg_angle, new_len, s.foot_x,
                           jnp.logical_not(liftoff), s.t)

    new = jax.lax.cond(s.stance, stance, flight, s)
    t = s.t + 1
    new = new._replace(t=t)

    reward = (new.vx + 0.5
              - 0.05 * (jnp.square(action[0]) + jnp.square(action[1])))
    terminal = new.z < _MIN_Z
    truncate = jnp.logical_and(t >= _MAX_STEP, jnp.logical_not(terminal))
    return new, reward, terminal, truncate


def make_hopper() -> EnvDef:
    spec = EnvSpec(env_name='HopperSlip-v0', num_envs=1, max_step=_MAX_STEP,
                   state_dim=6, action_dim=2, if_discrete=False)
    return EnvDef(spec=spec, init=_init, obs=_obs, step=_step)


class HopperEnv(VecEnv):
    def __init__(self, num_envs: int = 1, seed: int = 0, **_kwargs):
        super().__init__(make_hopper(), num_envs=num_envs, seed=seed)
