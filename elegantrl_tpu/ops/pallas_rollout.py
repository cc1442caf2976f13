"""Fused whole-rollout Pallas kernel: MLP actor/critic + inlined env step.

Why this exists: the profiler-measured account of the flagship bench config
(scripts/profile_sol.py) shows the fused PPO round is OP-LAUNCH-LATENCY
bound — the rollout ``lax.scan`` alone issues ~35 tiny (~1-2 us) ops per
step x horizon_len steps (actor matmuls, critic matmuls, RNG hashing, env
elementwise math, 7 dynamic-update-slices for the stacked outputs), while
HBM and MXU utilisation both sit near 10%.  Unrolling amortises the loop
bookkeeping but not the per-op latency.  The TPU-native fix is ONE kernel
that keeps the policy weights and the env state resident in VMEM and runs
the entire horizon in a ``fori_loop``, touching HBM only to write the
(H, ...) rollout tensors — the irreducible traffic.

Scope: PPO (Gaussian head) and DiscretePPO (categorical head) with the
default 2-hidden-layer MLP — plus, via ``make_fused_offpolicy_rollout``,
the off-policy families' exploration (DDPG/TD3 noisy-deterministic,
SAC/ModSAC tanh-Gaussian, DQN-family epsilon-greedy; see OFFPOLICY_HEADS
below) — over any env with a registered KERNEL ENV BODY
— a pure elementwise step function the kernel inlines.  Registered bodies:
Pendulum-v1, CartPole-v1, HopperSlip-v0, PointChasingVecEnv,
PointChasingDiscreteEnv (the env modules re-stated in transposed row form;
exact-math parity tested in tests/test_pallas_rollout.py).  Bodies with env
randomness (PointChasing's walker) declare ``n_step`` uniform rows, drawn
from the same stream as the exploration noise.  The generic ``agents/base.py:collect_rollout``
scan remains the general path (the runner auto-selects, train/runner.py).

Layout: everything transposed — activations are (features, envs) so the
env axis rides the 128-wide lane dimension and feature dims sit on
sublanes; MLP layers are ``W^T @ x`` matmuls on the MXU.  Env state lives
as (rows, B) f32 + (rows, B) i32 blocks.  Outputs stay in the kernel-native
time-major-transposed layout ((H, S, B) / (H, B)) all the way into the PPO
update (the 'tsn' extras marker; agents/ppo.py gathers minibatches from
either layout) — un-transposing them cost a measured ~210 us/round.

Long horizons: the grid is (env_blocks, time_chunks) with the env state
carried across time chunks in VMEM scratch (chunks iterate innermost, so
the per-block state survives; chunk 0 loads it from the inputs, the last
chunk stores it to the outputs).  Each chunk writes its (CH, ..., B) slice
of the rollout tensors to HBM, so VMEM residency is bounded by the CHUNK
length, not the horizon — the reference-demo-shaped horizon-2048 config
(cfg2) rides the same kernel.

RNG: exploration noise and reset uniforms are drawn with the TPU core's
native PRNG (``pltpu.prng_random_bits`` seeded from the caller's key and
the block id, normals via Box-Muller, Gumbel-max for categorical sampling)
— deterministic given the key, distribution-identical to (but a different
stream than) the scan path's ``jax.random`` draws.  The CPU interpreter's
``prng_random_bits`` is a constant stub, so interpret mode streams
host-drawn noise in as a regular input instead; parity tests recompute
every stored quantity from the kernel's own stored states/actions, and the
TPU-only statistical test checks the internal draws.

Behavioral contract matched (exact math, tested):
- stored states/actions/logprobs/values/rewards/undones/unmasks exactly as
  ``collect_rollout`` + the env module + ``agents/ppo.py`` produce them
  (reference AgentBase.py:130-170 buffer-item contract);
- masked auto-reset on terminal|truncate per envs/base.py:vec_step;
- quantize-before-act under bf16 storage (agents/base.py contract: the
  stored state, the acting input and the update-time re-eval see
  bit-identical values so the first-epoch PPO ratio is exactly 1).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dists import _LOG_SQRT_2PI

_TWO_PI = 2.0 * math.pi


def _wrap_angle(x):
    """((x + pi) mod 2pi) - pi without jnp.mod (Mosaic-friendly floor form)."""
    y = x + math.pi
    return y - jnp.floor(y / _TWO_PI) * _TWO_PI - math.pi


_ATAN_C = (9.9999990555e-01, -3.3332657853e-01, 1.9986537489e-01,
           -1.4164333375e-01, 1.0507319787e-01, -7.2479506621e-02,
           3.9899560039e-02, -1.4458697067e-02, 2.4682466247e-03)


def _atan2(y, x):
    """atan2 from an odd minimax polynomial (f32 max abs err ~1.2e-7 —
    one ulp): Mosaic has no atan/atan2 lowering, so the hopper body builds
    it from mul/add/select.  Range reduction: atan(t)=pi/2-atan(1/t) for
    |t|>1; quadrants from the signs."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    t2 = t * t
    p = jnp.full_like(t, _ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * t2 + c
    r = p * t
    r = jnp.where(ay > ax, 0.5 * math.pi - r, r)   # undo the 1/t reduction
    r = jnp.where(x < 0, math.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _uniform_from_bits(bits):
    """Random bits -> f32 uniforms in [0, 1): (bits & 0xFFFFFF) * 2^-24.
    ``prng_random_bits`` yields int32 and Mosaic can't cast uint32->f32, so
    keep the low 24 bits with a mask (non-negative int32, exact in f32).
    """
    return (bits & 0xFFFFFF).astype(jnp.float32) * (2.0 ** -24)


class KernelEnvBody(NamedTuple):
    """An env inlineable into the fused rollout kernel.

    All row tensors are (rows, B) f32 / i32 with the env axis on lanes.
    ``step`` must NOT auto-reset; ``reset`` applies the masked re-init.
    The math must match the env module's ``(init, obs, step)`` exactly
    (parity-tested against ``vec_step``).
    """
    env_name: str
    state_dim: int
    action_dim: int          # env action dim (continuous) or n_actions
    n_f32: int               # f32 state rows
    n_i32: int               # i32 state rows (step counters etc.)
    n_reset: int             # uniforms consumed by reset
    pack: Callable           # env_state pytree -> (f32 (n_f32, N), i32)
    unpack: Callable         # (f32, i32) -> env_state pytree
    obs: Callable            # (f32, i32) -> (S, B)
    step: Callable           # (f32, i32, env_action, u (n_step, B)) ->
    #                          (f32', i32', reward (1,B), terminal (1,B)
    #                          bool, truncate (1,B) bool)
    reset: Callable          # (f32', i32', u (n_reset, B), done) -> masked
    n_step: int = 0          # uniforms consumed by step (env randomness,
    #                          e.g. PointChasing's random walker)
    # --- optional market-data extension (StockTrading) ---
    # tables: static (T, rows) f32 arrays kept VMEM-resident for the whole
    # kernel; bodies fetch day-indexed rows through a ``fetch(ti, day)``
    # callable -> (1, rows) the kernel (refs + pl.ds) or a test (values +
    # lax.dynamic_slice) provides.  When non-empty, the extended signatures
    # apply:
    #   scalar_init(i32_scratch_ref) -> scalars   (a TUPLE of lane-UNIFORM
    #                                              values, e.g. the shared
    #                                              day counter)
    #   obs(f, i, scal, fetch) -> (S, B)
    #   step(f, i, a, u, scal, fetch) -> (f2, i2, reward, term, trunc, scal2)
    #     where scal2 is again a tuple with scal's structure (fori_loop
    #     carries it alongside the state rows)
    #   reset(f, i, u, done, fetch) -> (f2, i2)   (fetch appended so reset
    #     can read table rows — Pallas kernels cannot capture array
    #     constants, so day-0 data must come through the refs).
    tables: tuple = ()
    scalar_init: Any = None


# ---------------------------------------------------------------- Pendulum

def _pend_pack(s):
    return (jnp.stack([s.theta, s.theta_dot]), s.t.reshape(1, -1))


def _pend_unpack(f, i, proto):
    return type(proto)(theta=f[0], theta_dot=f[1], t=i[0])


def _pend_obs(f, i):
    th, thdot = f[0:1], f[1:2]
    return jnp.concatenate([jnp.cos(th), jnp.sin(th), thdot], axis=0)


def _pend_step(f, i, a, u):
    """envs/pendulum.py:55-71: g=10 m=1 l=1 dt=0.05, action x2 torque wrap,
    reward x0.5, 200-step truncation, never terminates."""
    th, thdot = f[0:1], f[1:2]
    u_trq = jnp.clip(a[0:1] * 2.0, -2.0, 2.0)
    cost = (jnp.square(_wrap_angle(th)) + 0.1 * jnp.square(thdot)
            + 0.001 * jnp.square(u_trq))
    reward = -0.5 * cost
    thdot2 = jnp.clip(thdot + (15.0 * jnp.sin(th) + 3.0 * u_trq) * 0.05,
                      -8.0, 8.0)
    th2 = th + thdot2 * 0.05
    tc2 = i[0:1] + 1
    trunc = tc2 >= 200
    return (jnp.concatenate([th2, thdot2], axis=0), tc2, reward,
            jnp.zeros_like(trunc), trunc)


def _pend_reset(f, i, u, done):
    th = jnp.where(done, -math.pi + _TWO_PI * u[0:1], f[0:1])
    thdot = jnp.where(done, -1.0 + 2.0 * u[1:2], f[1:2])
    tc = jnp.where(done, 0, i[0:1])
    return jnp.concatenate([th, thdot], axis=0), tc


PENDULUM_BODY = KernelEnvBody(
    env_name='Pendulum-v1', state_dim=3, action_dim=1, n_f32=2, n_i32=1,
    n_reset=2, pack=_pend_pack, unpack=_pend_unpack, obs=_pend_obs,
    step=_pend_step, reset=_pend_reset)


# ---------------------------------------------------------------- CartPole

def _cp_pack(s):
    return (jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]),
            s.t.reshape(1, -1))


def _cp_unpack(f, i, proto):
    return type(proto)(x=f[0], x_dot=f[1], theta=f[2], theta_dot=f[3],
                       t=i[0])


def _cp_obs(f, i):
    return f  # obs IS the 4 state rows


_CP_THETA_LIMIT = 12.0 * 2.0 * math.pi / 360.0


def _cp_step(f, i, a, u):
    """envs/cartpole.py:56-75: Euler dt=0.02, force +-10 N, terminal on
    |x|>2.4 or |theta|>12deg, truncate at 500, reward 1."""
    x, x_dot, theta, theta_dot = f[0:1], f[1:2], f[2:3], f[3:4]
    force = jnp.where(a[0:1] > 0.5, 10.0, -10.0)   # action row carries 0/1
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    temp = (force + 0.05 * jnp.square(theta_dot) * sin_t) / 1.1
    theta_acc = (9.8 * sin_t - cos_t * temp) / (
        0.5 * (4.0 / 3.0 - 0.1 * jnp.square(cos_t) / 1.1))
    x_acc = temp - 0.05 * theta_acc * cos_t / 1.1
    x2 = x + 0.02 * x_dot
    x_dot2 = x_dot + 0.02 * x_acc
    theta2 = theta + 0.02 * theta_dot
    theta_dot2 = theta_dot + 0.02 * theta_acc
    t2 = i[0:1] + 1
    terminal = (jnp.abs(x2) > 2.4) | (jnp.abs(theta2) > _CP_THETA_LIMIT)
    trunc = (t2 >= 500) & jnp.logical_not(terminal)
    reward = jnp.ones_like(x2)
    return (jnp.concatenate([x2, x_dot2, theta2, theta_dot2], axis=0), t2,
            reward, terminal, trunc)


def _cp_reset(f, i, u, done):
    fresh = -0.05 + 0.1 * u                        # 4 rows in [-0.05, 0.05)
    f2 = jnp.where(done, fresh, f)
    t2 = jnp.where(done, 0, i[0:1])
    return f2, t2


CARTPOLE_BODY = KernelEnvBody(
    env_name='CartPole-v1', state_dim=4, action_dim=2, n_f32=4, n_i32=1,
    n_reset=4, pack=_cp_pack, unpack=_cp_unpack, obs=_cp_obs,
    step=_cp_step, reset=_cp_reset)


# ---------------------------------------------------------------- Hopper

def _hop_pack(s):
    return (jnp.stack([s.x, s.z, s.vx, s.vz, s.leg_angle, s.leg_len,
                       s.foot_x, s.stance.astype(jnp.float32)]),
            s.t.reshape(1, -1))


def _hop_unpack(f, i, proto):
    return type(proto)(x=f[0], z=f[1], vx=f[2], vz=f[3], leg_angle=f[4],
                       leg_len=f[5], foot_x=f[6], stance=f[7] > 0.5,
                       t=i[0])


def _hop_obs(f, i):
    return jnp.concatenate([f[1:2], f[2:3], f[3:4], f[4:5],
                            f[5:6] / 0.55, f[7:8]], axis=0)


def _hop_step(f, i, a, u):
    """envs/hopper.py:68-113 (SLIP): the lax.cond(stance, ...) branches are
    evaluated on all lanes and blended with where — identical math to what
    XLA's vmap-of-cond lowers to."""
    x, z, vx, vz = f[0:1], f[1:2], f[2:3], f[3:4]
    leg_angle, leg_len, foot_x, stance = f[4:5], f[5:6], f[6:7], f[7:8]
    target_angle = jnp.clip(a[0:1], -1.0, 1.0) * 0.5
    thrust = jnp.clip(a[1:2], -1.0, 1.0) * 0.5 + 0.5
    DT, G, LEG, K, THR = 0.01, 9.8, 0.55, 300.0, 60.0

    # flight branch
    fl_angle = leg_angle + 10.0 * (target_angle - leg_angle) * DT
    fl_vz = vz - G * DT
    fl_z = z + fl_vz * DT
    fl_x = x + vx * DT
    foot_z = fl_z - LEG * jnp.cos(fl_angle)
    touchdown = (foot_z <= 0.0) & (fl_vz < 0)
    fl_foot_x = jnp.where(touchdown, fl_x + LEG * jnp.sin(fl_angle), foot_x)

    # stance branch
    dx = x - foot_x
    st_len = jnp.sqrt(dx * dx + z * z)
    compress = jnp.maximum(LEG - st_len, 0.0)
    force = K * compress + THR * thrust
    ux, uz = dx / (st_len + 1e-6), z / (st_len + 1e-6)
    st_vx = vx + force * ux * DT
    st_vz = vz + (force * uz - G) * DT
    st_x = x + st_vx * DT
    st_z = z + st_vz * DT
    new_len = jnp.sqrt(jnp.square(st_x - foot_x) + jnp.square(st_z))
    liftoff = (new_len >= LEG) & (st_vz > 0)
    st_angle = _atan2(st_x - foot_x, st_z)

    in_st = stance > 0.5
    x2 = jnp.where(in_st, st_x, fl_x)
    z2 = jnp.where(in_st, st_z, fl_z)
    vx2 = jnp.where(in_st, st_vx, vx)
    vz2 = jnp.where(in_st, st_vz, fl_vz)
    angle2 = jnp.where(in_st, st_angle, fl_angle)
    len2 = jnp.where(in_st, new_len, LEG)
    foot2 = jnp.where(in_st, foot_x, fl_foot_x)
    # float-branch select: a where with BOOLEAN branches crashes the Mosaic
    # compile helper (minimal repro: where(a, !b, c) on i1 vectors)
    stance2 = jnp.where(in_st,
                        1.0 - liftoff.astype(jnp.float32),
                        touchdown.astype(jnp.float32))
    t2 = i[0:1] + 1
    reward = vx2 + 0.5 - 0.05 * (jnp.square(a[0:1]) + jnp.square(a[1:2]))
    terminal = z2 < 0.25
    trunc = (t2 >= 1000) & jnp.logical_not(terminal)
    f2 = jnp.concatenate([x2, z2, vx2, vz2, angle2, len2, foot2, stance2],
                         axis=0)
    return f2, t2, reward, terminal, trunc


def _hop_reset(f, i, u, done):
    """envs/hopper.py:_init: z ~ 0.9 +- 0.05, vx ~ +-0.1, rest zero."""
    z0 = 0.9 + (-0.05 + 0.1 * u[0:1])
    vx0 = -0.1 + 0.2 * u[1:2]
    zero = jnp.zeros_like(z0)
    fresh = jnp.concatenate([zero, z0, vx0, zero, zero,
                             jnp.full_like(z0, 0.55), zero, zero], axis=0)
    f2 = jnp.where(done, fresh, f)
    t2 = jnp.where(done, 0, i[0:1])
    return f2, t2


HOPPER_BODY = KernelEnvBody(
    env_name='HopperSlip-v0', state_dim=6, action_dim=2, n_f32=8, n_i32=1,
    n_reset=2, pack=_hop_pack, unpack=_hop_unpack, obs=_hop_obs,
    step=_hop_step, reset=_hop_reset)


# ----------------------------------------------------------- PointChasing

_CHASE_DIM = 2  # the default env dim (envs/point_chasing.py); rows below
#                 are laid out [p0(dim), v0(dim), p1(dim), v1(dim), dist(1)]


def _chase_pack(s):
    return (jnp.concatenate([s.p0.T, s.v0.T, s.p1.T, s.v1.T,
                             s.distance[None]], axis=0),
            s.t.reshape(1, -1))


def _chase_unpack(f, i, proto):
    d = _CHASE_DIM
    return type(proto)(p0=f[0:d].T, v0=f[d:2 * d].T, p1=f[2 * d:3 * d].T,
                       v1=f[3 * d:4 * d].T, distance=f[4 * d], t=i[0])


def _chase_obs(f, i):
    return f[0:4 * _CHASE_DIM]   # obs IS [p0, v0, p1, v1]


def _chase_cont_step(f, i, a, u):
    """envs/point_chasing.py:56-74: L2-capped chase action, leaky-integrator
    velocities, random walker fed by ``u`` (the per-step uniform rows the
    scan path draws with ``jax.random.uniform(key, (dim,))``)."""
    d = _CHASE_DIM
    action_l2 = jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.square(a), axis=0, keepdims=True)), 1.0)
    an = a / action_l2
    v1 = f[3 * d:4 * d] * 0.75 + an
    p1 = f[2 * d:3 * d] + v1 * 0.01
    v0 = f[d:2 * d] * 0.50 + u
    p0 = f[0:d] + v0 * 0.01
    dist = jnp.sqrt(jnp.sum(jnp.square(p0 - p1), axis=0, keepdims=True))
    reward = f[4 * d:4 * d + 1] - dist - action_l2 * 0.02
    t2 = i[0:1] + 1
    terminal = (dist < float(d)) | (t2 >= 1024)
    trunc = jnp.zeros_like(terminal)
    f2 = jnp.concatenate([p0, v0, p1, v1, dist], axis=0)
    return f2, t2, reward, terminal, trunc


def _chase_disc_step(f, i, a, u):
    """envs/point_chasing.py:87-91: base-3 digit decode of the action index
    (row carries the index as f32), each digit mapped to {-1, 0, +1}, then
    the continuous step.  mod via the floor form (no jnp.mod in Mosaic)."""
    idx = a[0:1]
    rows = []
    for k in range(_CHASE_DIM):
        q = jnp.floor(idx / float(3 ** k))
        digit = q - 3.0 * jnp.floor(q / 3.0)
        rows.append(digit - 1.0)
    return _chase_cont_step(f, i, jnp.concatenate(rows, axis=0), u)


def _chase_reset(f, i, u, done):
    """envs/point_chasing.py:41-47: p0 ~ N(0,1)^dim, p1 ~ N(0,1)^dim - 8,
    v = 0, distance = ||p0-p1||, t = 0.  Normals via Box-Muller from the
    2*dim reset uniforms (cos row -> p0, sin row -> p1): distribution-
    identical to the scan path's jax.random.normal draws."""
    d = _CHASE_DIM
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u[0:d]))
    ang = _TWO_PI * u[d:2 * d]
    p0 = r * jnp.cos(ang)
    p1 = r * jnp.sin(ang) - _INIT_DIST
    dist = jnp.sqrt(jnp.sum(jnp.square(p0 - p1), axis=0, keepdims=True))
    zero = jnp.zeros_like(p0)
    fresh = jnp.concatenate([p0, zero, p1, zero, dist], axis=0)
    f2 = jnp.where(done, fresh, f)
    t2 = jnp.where(done, 0, i[0:1])
    return f2, t2


_INIT_DIST = 8.0

CHASING_BODY = KernelEnvBody(
    env_name='PointChasingVecEnv', state_dim=4 * _CHASE_DIM,
    action_dim=_CHASE_DIM, n_f32=4 * _CHASE_DIM + 1, n_i32=1,
    n_reset=2 * _CHASE_DIM, n_step=_CHASE_DIM,
    pack=_chase_pack, unpack=_chase_unpack, obs=_chase_obs,
    step=_chase_cont_step, reset=_chase_reset)

CHASING_DISCRETE_BODY = CHASING_BODY._replace(
    env_name='PointChasingDiscreteEnv', action_dim=3 ** _CHASE_DIM,
    step=_chase_disc_step)


KERNEL_ENV_BODIES = {b.env_name: b for b in
                     (PENDULUM_BODY, CARTPOLE_BODY, HOPPER_BODY,
                      CHASING_BODY, CHASING_DISCRETE_BODY)}


# ------------------------------------------------------------ StockTrading

def _row_to_col(row):
    """(1, R) table row -> (R, 1) column.  Isolated so the lane->sublane
    relayout strategy can be swapped in one place if Mosaic's transpose
    lowering regresses (fallback: transposed tables + lane-dim dyn slice)."""
    return jnp.transpose(row)


def make_stock_body(close, tech, initial_amount: float = 1e6,
                    max_stock: float = 1e2, cost_pct: float = 1e-3,
                    gamma: float = 0.99,
                    if_random_reset: bool = True) -> KernelEnvBody:
    """Fused-rollout body for ``envs/stock_trading.py:make_stock_trading``
    (the AI4Finance flagship env; reference
    ``elegantrl/envs/StockTradingEnv.py:64-97``).

    The market tables (close (T, S), tech (T, 8S)) stay VMEM-resident for
    the whole kernel (~600 KB at the reference 1113x15 shape) and the
    day-indexed rows are fetched with one dynamic sublane slice per step —
    replacing the scan path's per-step gather + 15-iteration ``lax.scan``
    trade loop (~60 extra tiny ops/step of launch latency) with in-kernel
    vector ops.

    Lane-uniformity invariant: every env starts at day 0 (``init``) and the
    episode terminates only by the shared day counter, so ``day`` is the
    same on all lanes forever; the body carries it as the kernel scalar
    (``scalar_init``) that feeds the table fetches.  The per-lane i32 day
    row is still maintained for pack/unpack fidelity.

    Episode bookkeeping matched exactly (parity-tested): dead-zone 0.1,
    integer lots via trunc, sequential per-stock cash constraint,
    transaction cost both ways, delta-total-asset reward x 2^-12, terminal
    mean-reward/(1-gamma) bonus, cumulative_returns recorded at terminal,
    random reset jitter (cash U[0.75,1.25) x initial, |N(0,1)|x2^7 share
    lots via in-body Box-Muller).
    """
    close = jnp.asarray(close, jnp.float32)
    tech = jnp.asarray(tech, jnp.float32)
    T, S = close.shape
    TECH = tech.shape[1]
    max_step = T - 1
    env_reward_scale = 2.0 ** -12
    state_dim = 1 + S + S + TECH
    n_pairs = (S + 1) // 2            # Box-Muller pairs for S share normals
    n_reset = 1 + 2 * n_pairs

    def pack(s):
        return (jnp.concatenate([
            s.amount[None], s.shares.T, s.total_asset[None],
            s.reward_sum[None], s.cumulative_returns[None]], axis=0),
            s.day.reshape(1, -1))

    def unpack(f, i, proto):
        return type(proto)(day=i[0], amount=f[0], shares=f[1:1 + S].T,
                           total_asset=f[1 + S], reward_sum=f[2 + S],
                           cumulative_returns=f[3 + S])

    def scalar_init(i_ref):
        return (i_ref[0, 0],)

    def obs(f, i, scal, fetch):
        day = scal[0]
        B = f.shape[1]
        close_col = _row_to_col(fetch(0, day))        # (S, 1)
        tech_col = _row_to_col(fetch(1, day))         # (TECH, 1)
        return jnp.concatenate([
            jnp.tanh(f[0:1] * 2.0 ** -18),
            jnp.tanh(f[1:1 + S] * 2.0 ** -10),
            jnp.broadcast_to(close_col * 2.0 ** -7, (S, B)),
            jnp.broadcast_to(tech_col * 2.0 ** -6, (TECH, B)),
        ], axis=0)

    def step(f, i, a, u, scal, fetch):
        day2 = scal[0] + 1
        prices = _row_to_col(fetch(0, day2))          # (S, 1) close[day+1]
        amount = f[0:1]
        a = jnp.where(jnp.abs(a) < 0.1, 0.0, a)
        ax = a * max_stock
        a_int = jnp.sign(ax) * jnp.floor(jnp.abs(ax))  # trunc toward zero
        # sequential cash-constrained trade loop, unrolled over stocks:
        # in-kernel vector ops, no launch latency (StockTradingEnv.py:77-87)
        new_shares = []
        for k in range(S):
            price_k = prices[k:k + 1]                 # (1, 1)
            a_k = a_int[k:k + 1]
            share_k = f[1 + k:2 + k]
            can_buy = jnp.floor(amount / price_k)
            buy = jnp.where(a_k > 0, jnp.minimum(can_buy, a_k), 0.0)
            sell = jnp.where(a_k > 0, 0.0, jnp.clip(-a_k, 0.0, share_k))
            amount = (amount - price_k * buy * (1.0 + cost_pct)
                      + price_k * sell * (1.0 - cost_pct))
            new_shares.append(share_k + buy - sell)
        shares2 = jnp.concatenate(new_shares, axis=0)  # (S, B)
        # the env's exact reduction form (summation ORDER matters: totals
        # sit near 1e6 in f32, and reward is the cancellation-prone delta)
        total = jnp.sum(prices * shares2, axis=0, keepdims=True) + amount
        total_prev = f[1 + S:2 + S]
        reward = (total - total_prev) * env_reward_scale
        reward_sum2 = f[2 + S:3 + S] + reward
        i2 = i[0:1] + 1
        terminal = i2 >= max_step
        bonus = (reward_sum2 / i2.astype(jnp.float32)) / (1.0 - gamma)
        reward_out = jnp.where(terminal, reward + bonus, reward)
        cum2 = jnp.where(terminal, total / initial_amount * 100.0,
                         f[3 + S:4 + S])
        trunc = jnp.zeros_like(terminal)
        f2 = jnp.concatenate([amount, shares2, total, reward_sum2, cum2],
                             axis=0)
        scal2 = jnp.where(day2 >= max_step, 0, day2)
        return f2, i2, reward_out, terminal, trunc, (scal2,)

    def reset(f, i, u, done, fetch):
        close0_col = _row_to_col(fetch(0, 0))        # day-0 prices (S, 1)
        if if_random_reset:
            amount0 = initial_amount * (u[0:1] * 0.5 + 0.75)
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - u[1:1 + n_pairs]))
            ang = _TWO_PI * u[1 + n_pairs:1 + 2 * n_pairs]
            z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)],
                                axis=0)[0:S]
            shares0 = jnp.floor(jnp.abs(jnp.clip(z, -2.0, 2.0))) * 2.0 ** 7
        else:
            amount0 = jnp.full_like(u[0:1], initial_amount)
            shares0 = jnp.zeros((S, u.shape[1]), jnp.float32)
        total0 = (jnp.sum(close0_col * shares0, axis=0, keepdims=True)
                  + amount0)
        zero = jnp.zeros_like(amount0)
        fresh = jnp.concatenate([amount0, shares0, total0, zero, zero],
                                axis=0)
        f2 = jnp.where(done, fresh, f)
        i2 = jnp.where(done, 0, i[0:1])
        return f2, i2

    return KernelEnvBody(
        env_name='StockTradingEnv-v2', state_dim=state_dim, action_dim=S,
        n_f32=4 + S, n_i32=1, n_reset=n_reset, n_step=0,
        pack=pack, unpack=unpack, obs=obs, step=step, reset=reset,
        tables=(close, tech), scalar_init=scalar_init)


# ------------------------------------------------------------- the kernel

def _bf16_dot(compute_dtype):
    """Matmul helper for the kernels: f32 by default; with
    ``compute_dtype='bfloat16'`` the operands are cast to bf16 and the MXU
    accumulates in f32 (``preferred_element_type``) — the wide-net regime
    where the v5e's 197 TFLOP/s bf16 peak is ~2x its ~99 f32 peak
    (VERDICT r4 weak #7: bf16 never reached the kernels' compute path)."""
    if str(compute_dtype) in ('bfloat16', 'bf16'):
        def dot(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return dot


def _make_kernel(body: KernelEnvBody, chunk: int, n_chunks: int, block: int,
                 reward_scale: float, discrete: bool,
                 quantize: bool = False, internal_rng: bool = False,
                 compute_dtype=None):
    _dot = _bf16_dot(compute_dtype)
    CH, B = chunk, block
    S, A = body.state_dim, body.action_dim
    # random rows per step: internal draws uniforms (2A for Box-Muller when
    # continuous); the external/interpret path streams normals directly (A);
    # both append the env's own per-step uniforms then the reset uniforms
    NZ = ((A if discrete else 2 * A) + body.n_step + body.n_reset
          if internal_rng else A + body.n_step + body.n_reset)

    n_tabs = len(body.tables)
    extended = n_tabs > 0

    def kernel(*refs):
        tab_refs = refs[2:2 + n_tabs]
        rest = refs[:2] + refs[2 + n_tabs:]
        if internal_rng:
            (f_ref, i_ref, seed_ref,
             avg_ref, nstd_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, wa_ref, ba_ref,
             c1_ref, cb1_ref, c2_ref, cb2_ref, cv_ref, cbv_ref,
             std_ref,
             states_o, actions_o, logp_o, rew_o, term_o, trunc_o, val_o,
             f_o, i_o, f_s, i_s) = rest
            noise_ref = None
        else:
            (f_ref, i_ref,
             noise_ref,                  # (CH, NZ, B) uniforms/normals
             avg_ref, nstd_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, wa_ref, ba_ref,
             c1_ref, cb1_ref, c2_ref, cb2_ref, cv_ref, cbv_ref,
             std_ref,
             states_o, actions_o, logp_o, rew_o, term_o, trunc_o, val_o,
             f_o, i_o, f_s, i_s) = rest
        fetch = (lambda ti, day: tab_refs[ti][pl.ds(day, 1), :]) \
            if extended else None
        c = pl.program_id(1)
        if internal_rng:
            # one seed per (key, block): mix the block id into word 0 with a
            # golden-ratio odd constant; re-seeding identically each chunk
            # would repeat the stream, so skip the chunk's worth of draws by
            # folding the chunk id in too (prng_seed takes max 2 words)
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * (-1640531527)
                + c * 1013904223,
                seed_ref[1])

        @pl.when(c == 0)
        def _load():
            f_s[:] = f_ref[:]
            i_s[:] = i_ref[:]

        avg = avg_ref[:]
        nstd = nstd_ref[:] + 1e-4
        w1, b1 = w1_ref[:], b1_ref[:]
        w2, b2 = w2_ref[:], b2_ref[:]
        wa, ba = wa_ref[:], ba_ref[:]
        c1, cb1 = c1_ref[:], cb1_ref[:]
        c2, cb2 = c2_ref[:], cb2_ref[:]
        cv, cbv = cv_ref[:], cbv_ref[:]
        if not discrete:
            std = std_ref[:]
            log_std = jnp.log(std)

        def mlp(wb1, bb1, wb2, bb2, wo, bo, xn):
            h = jax.nn.gelu(_dot(wb1, xn) + bb1)
            h = jax.nn.gelu(_dot(wb2, h) + bb2)
            return _dot(wo, h) + bo

        def step(t, carry):
            f, i, scal = carry                             # state rows
            x = (body.obs(f, i, scal, fetch) if extended
                 else body.obs(f, i))                      # (S, B)
            if quantize:  # storage-precision round BEFORE acting
                x = x.astype(jnp.bfloat16).astype(jnp.float32)
            states_o[pl.ds(t, 1)] = x[None]
            xn = (x - avg) / nstd
            out = mlp(w1, b1, w2, b2, wa, ba, xn)          # (A, B)
            v = mlp(c1, cb1, c2, cb2, cv, cbv, xn)         # (1, B)
            val_o[pl.ds(t, 1)] = v
            if internal_rng:
                u_all = _uniform_from_bits(pltpu.prng_random_bits((NZ, B)))
            else:
                u_all = noise_ref[pl.ds(t, 1)].reshape(NZ, B)
            if discrete:
                # Gumbel-max categorical sample (== jax.random.categorical
                # up to the stream); logp = logits[a] - logsumexp(logits)
                g = -jnp.log(-jnp.log(
                    jnp.maximum(u_all[0:A], 1e-12)) + 1e-12)
                perturbed = out + g
                action = jnp.argmax(perturbed, axis=0)[None].astype(jnp.int32)
                onehot = (jax.lax.broadcasted_iota(jnp.int32, (A, B), 0)
                          == action).astype(jnp.float32)
                m = jnp.max(out, axis=0, keepdims=True)
                lse = m + jnp.log(jnp.sum(jnp.exp(out - m), axis=0,
                                          keepdims=True))
                logp = jnp.sum(out * onehot, axis=0, keepdims=True) - lse
                actions_o[pl.ds(t, 1)] = action            # (1, B) int32
                env_a = action.astype(jnp.float32)         # (1, B) idx row
                u_env = u_all[A:]
            else:
                if internal_rng:   # Box-Muller: 2A uniforms -> A normals
                    z = jnp.sqrt(-2.0 * jnp.log(1.0 - u_all[0:A])) * jnp.cos(
                        _TWO_PI * u_all[A:2 * A])
                    u_env = u_all[2 * A:]
                else:              # host-drawn normals streamed in directly
                    z = u_all[0:A]
                    u_env = u_all[A:]
                action = out + std * z                     # raw stored action
                actions_o[pl.ds(t, 1)] = action[None]
                logp = jnp.sum(-0.5 * jnp.square(z) - log_std
                               - _LOG_SQRT_2PI, axis=0, keepdims=True)
                env_a = jnp.tanh(action)                   # agents/ppo.py
            logp_o[pl.ds(t, 1)] = logp
            u_step = u_env[0:body.n_step]
            u_reset = u_env[body.n_step:body.n_step + body.n_reset]
            if extended:
                f2, i2, reward, terminal, trunc, scal2 = body.step(
                    f, i, env_a, u_step, scal, fetch)
            else:
                f2, i2, reward, terminal, trunc = body.step(f, i, env_a,
                                                            u_step)
                scal2 = scal
            rew_o[pl.ds(t, 1)] = reward * reward_scale
            term_o[pl.ds(t, 1)] = terminal.astype(jnp.float32)
            trunc_o[pl.ds(t, 1)] = trunc.astype(jnp.float32)
            done = terminal | trunc
            if extended:
                f2, i2 = body.reset(f2, i2, u_reset, done, fetch)
            else:
                f2, i2 = body.reset(f2, i2, u_reset, done)
            return f2, i2, scal2

        scal0 = body.scalar_init(i_s) if extended else ()
        f, i, _ = jax.lax.fori_loop(0, CH, step, (f_s[:], i_s[:], scal0))
        f_s[:], i_s[:] = f, i

        @pl.when(c == n_chunks - 1)
        def _store():
            f_o[:] = f_s[:]
            i_o[:] = i_s[:]

    return kernel


def make_fused_rollout(body: KernelEnvBody, net_dims, horizon_len: int,
                       num_envs: int, reward_scale: float, discrete: bool,
                       store_dtype=None, block: int = 1024,
                       chunk: int = None, interpret: bool = False,
                       compute_dtype=None):
    """Build ``rollout_fn(agent_state, env_state, obs, key) ->
    (Rollout, env_state', obs')`` — the drop-in fast path for
    ``collect_rollout`` on (PPO x registered env body)."""
    from ..agents.base import Rollout

    D1, D2 = (int(d) for d in net_dims)
    S, A = body.state_dim, body.action_dim
    F, I = body.n_f32, body.n_i32
    B = min(block, num_envs)
    if num_envs % B:
        raise ValueError(f"num_envs={num_envs} not divisible by block={B}")
    H = int(horizon_len)
    CH = int(chunk or H)
    if H % CH:
        raise ValueError(f"horizon_len={H} not divisible by chunk={CH}")
    n_chunks = H // CH
    if store_dtype is not None and store_dtype != jnp.bfloat16:
        raise ValueError(f'unsupported store_dtype {store_dtype} for the '
                         'fused rollout kernel (only bfloat16 / None)')
    internal_rng = not interpret   # interpreter's prng_random_bits is a stub
    NZ = A + body.n_step + body.n_reset   # external rows (normals direct)
    kernel = _make_kernel(body, CH, n_chunks, B, float(reward_scale),
                          discrete, quantize=store_dtype is not None,
                          internal_rng=internal_rng,
                          compute_dtype=compute_dtype)

    env_f_spec = pl.BlockSpec((F, B), lambda b, c: (0, b),
                              memory_space=pltpu.VMEM)
    env_i_spec = pl.BlockSpec((I, B), lambda b, c: (0, b),
                              memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda b, c: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if internal_rng:
        noise_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]   # (2,) seed
    else:
        noise_spec = [pl.BlockSpec((CH, NZ, B), lambda b, c: (c, 0, b),
                                   memory_space=pltpu.VMEM)]
    in_specs = [
        env_f_spec, env_i_spec,
        *[full(t.shape) for t in body.tables],
        *noise_spec,
        full((S, 1)), full((S, 1)),                   # avg, nstd
        full((D1, S)), full((D1, 1)), full((D2, D1)), full((D2, 1)),
        full((A, D2)), full((A, 1)),
        full((D1, S)), full((D1, 1)), full((D2, D1)), full((D2, 1)),
        full((1, D2)), full((1, 1)),
        full((A, 1)),                                 # std (unused if discrete)
    ]
    hb_spec = pl.BlockSpec((CH, B), lambda b, c: (c, b),
                           memory_space=pltpu.VMEM)
    act_dtype = jnp.int32 if discrete else jnp.float32
    act_shape = ((H, num_envs) if discrete else (H, A, num_envs))
    act_spec = (hb_spec if discrete else
                pl.BlockSpec((CH, A, B), lambda b, c: (c, 0, b),
                             memory_space=pltpu.VMEM))
    out_specs = (
        pl.BlockSpec((CH, S, B), lambda b, c: (c, 0, b),
                     memory_space=pltpu.VMEM),
        act_spec,
        hb_spec, hb_spec, hb_spec, hb_spec, hb_spec,
        env_f_spec, env_i_spec,
    )
    out_shape = (
        jax.ShapeDtypeStruct((H, S, num_envs), jnp.float32),
        jax.ShapeDtypeStruct(act_shape, act_dtype),
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # logprobs
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # rewards
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # terminals
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # truncates
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # values
        jax.ShapeDtypeStruct((F, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((I, num_envs), jnp.int32),
    )
    call = pl.pallas_call(
        kernel,
        grid=(num_envs // B, n_chunks),
        in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((F, B), jnp.float32),
                        pltpu.VMEM((I, B), jnp.int32)],
        # wide nets (e.g. 1024x1024 weights + (1024, B) activations) need
        # more than Mosaic's default 16M scoped-vmem stack; the v5e has
        # far more VMEM than the default reserves
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def rollout_fn(agent_state, env_state, obs, key
                   ) -> Tuple[Rollout, object, jax.Array]:
        del obs  # the packed rows are the authoritative state
        (w1, b1), (w2, b2), (wa, ba) = agent_state.act['mlp']
        (c1, cb1), (c2, cb2), (cv, cbv) = agent_state.cri
        if discrete:
            std = jnp.ones((A, 1), jnp.float32)       # placeholder input
        else:
            std = jnp.exp(agent_state.act['std_log']).reshape(A, 1)
        if internal_rng:
            noise = jax.lax.bitcast_convert_type(
                jax.random.key_data(key).reshape(2), jnp.int32)
        else:
            if discrete:
                noise = jax.random.uniform(key, (H, NZ, num_envs),
                                           jnp.float32)
            else:
                kz, ku = jax.random.split(key)
                noise = jnp.concatenate([
                    jax.random.normal(kz, (H, A, num_envs), jnp.float32),
                    jax.random.uniform(ku,
                                       (H, body.n_step + body.n_reset,
                                        num_envs), jnp.float32),
                ], axis=1)
        f0, i0 = body.pack(env_state)
        col = lambda v: v.reshape(-1, 1)
        (states_t, actions_t, logprobs, rewards, terms, truncs, values,
         f1, i1) = call(
            f0, i0.reshape(I, -1).astype(jnp.int32),
            *body.tables,
            noise,
            col(agent_state.norm_avg), col(agent_state.norm_std),
            w1.T, col(b1), w2.T, col(b2), wa.T, col(ba),
            c1.T, col(cb1), c2.T, col(cb2), cv.T, col(cbv),
            std)
        # Keep the kernel-native transposed layout (H, S, N)/(H, A, N) and
        # flag it with the 'tsn' extras marker — the PPO update gathers
        # minibatches from either layout, and skipping the un-transpose
        # saves the round's single largest non-kernel op (~210 us measured,
        # scripts/profile_sol.py 'data formatting').
        if store_dtype is not None:
            states_t = states_t.astype(store_dtype)
        rollout = Rollout(
            states=states_t, actions=actions_t, logprobs=logprobs,
            rewards=rewards,
            undones=1.0 - terms,
            unmasks=1.0 - truncs,
            extras={'values': values,
                    'tsn': jnp.zeros((H, 0), jnp.float32)})
        env_state2 = body.unpack(f1, i1, env_state)
        i1 = i1.astype(jnp.int32)
        if body.tables:
            # host-side fetch: dynamic slice over the value tables; scal is
            # the lane-uniform scalar row (lane 0 of the i32 carry)
            fetch = lambda ti, day: jax.lax.dynamic_slice_in_dim(  # noqa
                body.tables[ti], day, 1, axis=0)
            last_obs = body.obs(f1, i1, (i1[0, 0],), fetch).T   # (N, S)
        else:
            last_obs = body.obs(f1, i1).T                       # (N, S)
        return rollout, env_state2, last_obs

    return rollout_fn


def make_sharded_fused_rollout(body: KernelEnvBody, net_dims,
                               horizon_len: int, num_envs: int,
                               reward_scale: float, mesh, discrete: bool,
                               store_dtype=None, block: int = 1024,
                               chunk: int = None, interpret: bool = False,
                               compute_dtype=None):
    """Mesh-DP wrapper for the fused rollout kernel: ``shard_map`` over the
    mesh's first axis, each device running the single-chip kernel on its
    ``num_envs / mesh.size`` env shard.

    Env lanes are fully independent (the kernel never communicates across
    lanes), so sharding the env axis is exact — the only cross-shard concern
    is RNG, handled by folding ``axis_index`` into the rollout key per shard
    (each device draws a distinct stream; same recipe as the scan path's
    implicit per-lane streams).  Outputs keep the kernel-native transposed
    layout with the env axis LAST, so rollout tensors shard on their trailing
    dim and flow straight into the jitted mesh-DP update half (XLA inserts
    the cross-shard gathers for global minibatch sampling, exactly as it
    does for the scan path — parallel/mesh.py).

    Replaces the reference's per-GPU Worker processes + pipe all-to-all
    (elegantrl/train/run.py:165-202): same semantics (every learner sees
    all data), ICI collectives instead of pickled pipes.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..agents.base import Rollout

    axis = mesh.axis_names[0]
    ndev = int(math.prod(mesh.devices.shape))
    if num_envs % ndev:
        raise ValueError(f'num_envs={num_envs} not divisible by mesh size '
                         f'{ndev}')
    local = make_fused_rollout(body, net_dims, horizon_len,
                               num_envs // ndev, reward_scale,
                               discrete=discrete, store_dtype=store_dtype,
                               block=block, chunk=chunk, interpret=interpret,
                               compute_dtype=compute_dtype)

    def shard_fn(agent_state, env_state, obs, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return local(agent_state, env_state, obs, key)

    env_sp = P(axis)                       # leading env axis on every leaf
    ro_sp = Rollout(
        states=P(None, None, axis),
        actions=P(None, axis) if discrete else P(None, None, axis),
        logprobs=P(None, axis), rewards=P(None, axis),
        undones=P(None, axis), unmasks=P(None, axis),
        extras={'values': P(None, axis), 'tsn': P(None, axis)})
    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(P(), env_sp, env_sp, P()),
                     out_specs=(ro_sp, env_sp, env_sp),
                     check_vma=False)


def make_pendulum_ppo_rollout(net_dims, horizon_len: int, num_envs: int,
                              reward_scale: float, store_dtype=None,
                              block: int = 1024, chunk: int = None,
                              interpret: bool = False):
    """Back-compat alias: the original Pendulum-only entry point."""
    return make_fused_rollout(PENDULUM_BODY, net_dims, horizon_len, num_envs,
                              reward_scale, discrete=False,
                              store_dtype=store_dtype, block=block,
                              chunk=chunk, interpret=interpret)


# -------------------------------------------------- off-policy exploration
#
# The same op-count attack applied to the off-policy families' rollout half.
# Their exploration is strictly SIMPLER than PPO's (no logprob, no critic
# value, no stored extras — reference AgentBase.explore_vec_env stores only
# (state, action, reward, undone, unmask), AgentBase.py:130-170), so the
# kernel drops the critic/logp plumbing and swaps the policy head:
#
#   'ddpg'     clip(tanh(mlp(x)) + noise_std * z, -1, 1)        (DDPG/TD3,
#              agents/ddpg_td3.py:actor_noisy — explore_noise_std static)
#   'sac'      tanh(mean + exp(clip(log_std)) * z) where [mean|log_std] =
#              head(gelu-MLP enc) — agents/sac.py:get_action, if_raw_out=False
#   'modsac'   same sample; enc is RAW-output (no trailing gelu) and the
#              avg/std heads read it separately — agents/sac.py:actor_dist
#   'dqn'      per-env epsilon-greedy over q = mlp(x)           (plain DQN,
#              agents/dqn.py + agents/off_policy.py:epsilon_greedy)
#   'dqn_enc'  same, q = val1(raw-enc(x))                  (Double/twin DQN)
#   'dqn_duel' same, q = val - mean(val) + adv over the raw enc (Dueling/D3QN
#              greedy path, agents/dqn.py:q_greedy_values)
#
# Heads with 6 weight tensors reuse the (w1,b1,w2,b2,wo,bo) slot list; the
# two-head variants (modsac, dqn_duel) append (w3,b3).  Outputs come back in
# the STANDARD (H, N, dim) layout (one cheap transpose on exit) because the
# replay buffer ring, the H-term harvesters and the metrics all consume that
# layout — unlike PPO there is no update-side gather to teach the transposed
# form to, and the transpose is ~1% of the scan path's cost at these shapes.

OFFPOLICY_HEADS = ('ddpg', 'sac', 'modsac', 'dqn', 'dqn_enc', 'dqn_duel')
_TWO_HEAD = ('modsac', 'dqn_duel')


def _make_offpolicy_kernel(body: KernelEnvBody, chunk: int, n_chunks: int,
                           block: int, reward_scale: float, head: str,
                           head_cfg: dict, quantize: bool,
                           internal_rng: bool, compute_dtype=None):
    _dot = _bf16_dot(compute_dtype)
    CH, B = chunk, block
    A = body.action_dim
    discrete = head.startswith('dqn')
    if discrete:
        NZ = 2 + body.n_step + body.n_reset          # coin + rand-action row
    elif internal_rng:
        NZ = 2 * A + body.n_step + body.n_reset      # Box-Muller pairs
    else:
        NZ = A + body.n_step + body.n_reset          # normals streamed in
    n_w = 8 if head in _TWO_HEAD else 6
    n_tabs = len(body.tables)
    extended = n_tabs > 0
    noise_std = float(head_cfg.get('noise_std', 0.0))
    std_lo, std_hi = head_cfg.get('std_clip', (-16.0, 2.0))
    explore_rate = float(head_cfg.get('explore_rate', 0.25))

    def kernel(*refs):
        tab_refs = refs[2:2 + n_tabs]
        rest = refs[:2] + refs[2 + n_tabs:]
        (f_ref, i_ref, rng_ref, *wrefs,
         states_o, actions_o, rew_o, trm_o, trc_o, f_o, i_o, f_s, i_s) = rest
        assert len(wrefs) == n_w
        fetch = (lambda ti, day: tab_refs[ti][pl.ds(day, 1), :]) \
            if extended else None
        c = pl.program_id(1)
        if internal_rng:
            # same (key, block, chunk) seeding recipe as the PPO kernel
            pltpu.prng_seed(
                rng_ref[0] + pl.program_id(0) * (-1640531527)
                + c * 1013904223,
                rng_ref[1])

        @pl.when(c == 0)
        def _load():
            f_s[:] = f_ref[:]
            i_s[:] = i_ref[:]

        w = [r[:] for r in wrefs]

        def policy(x, u_all):
            """(action_store, env_action, rows-of-noise-consumed)."""
            h1 = jax.nn.gelu(_dot(w[0], x) + w[1])
            l2 = _dot(w[2], h1) + w[3]
            if head == 'ddpg':
                out = _dot(w[4], jax.nn.gelu(l2)) + w[5]
                z = jnp.sqrt(-2.0 * jnp.log(1.0 - u_all[0:A])) * jnp.cos(
                    _TWO_PI * u_all[A:2 * A]) if internal_rng else u_all[0:A]
                a = jnp.clip(jnp.tanh(out) + noise_std * z, -1.0, 1.0)
                return a, a
            if head in ('sac', 'modsac'):
                if head == 'sac':
                    out = _dot(w[4], jax.nn.gelu(l2)) + w[5]
                    mean, log_std = out[0:A], out[A:2 * A]
                else:                      # modsac: raw enc, split heads
                    mean = _dot(w[4], l2) + w[5]
                    log_std = _dot(w[6], l2) + w[7]
                log_std = jnp.clip(log_std, std_lo, std_hi)
                z = jnp.sqrt(-2.0 * jnp.log(1.0 - u_all[0:A])) * jnp.cos(
                    _TWO_PI * u_all[A:2 * A]) if internal_rng else u_all[0:A]
                a = jnp.tanh(mean + jnp.exp(log_std) * z)
                return a, a
            # DQN family: epsilon-greedy over the head's q-values
            if head == 'dqn':
                q = _dot(w[4], jax.nn.gelu(l2)) + w[5]
            else:
                q = _dot(w[4], l2) + w[5]
                if head == 'dqn_duel':
                    adv = _dot(w[6], l2) + w[7]
                    q = q - jnp.mean(q, axis=0, keepdims=True) + adv
            greedy = jnp.argmax(q, axis=0)[None].astype(jnp.int32)
            rand = jnp.floor(u_all[1:2] * A).astype(jnp.int32)
            action = jnp.where(u_all[0:1] < explore_rate, rand, greedy)
            return action, action.astype(jnp.float32)

        def step(t, carry):
            f, i, scal = carry
            x = (body.obs(f, i, scal, fetch) if extended
                 else body.obs(f, i))
            if quantize:   # storage round BEFORE acting (base.py contract)
                x = x.astype(jnp.bfloat16).astype(jnp.float32)
            states_o[pl.ds(t, 1)] = x[None]
            if internal_rng:
                u_all = _uniform_from_bits(pltpu.prng_random_bits((NZ, B)))
            else:
                u_all = rng_ref[pl.ds(t, 1)].reshape(NZ, B)
            action, env_a = policy(x, u_all)
            if discrete:
                actions_o[pl.ds(t, 1)] = action
                u_env = u_all[2:]
            else:
                actions_o[pl.ds(t, 1)] = action[None]
                u_env = u_all[2 * A:] if internal_rng else u_all[A:]
            u_step = u_env[0:body.n_step]
            u_reset = u_env[body.n_step:body.n_step + body.n_reset]
            if extended:
                f2, i2, reward, terminal, trunc, scal2 = body.step(
                    f, i, env_a, u_step, scal, fetch)
            else:
                f2, i2, reward, terminal, trunc = body.step(f, i, env_a,
                                                            u_step)
                scal2 = scal
            rew_o[pl.ds(t, 1)] = reward * reward_scale
            trm_o[pl.ds(t, 1)] = terminal.astype(jnp.float32)
            trc_o[pl.ds(t, 1)] = trunc.astype(jnp.float32)
            done = terminal | trunc
            if extended:
                f2, i2 = body.reset(f2, i2, u_reset, done, fetch)
            else:
                f2, i2 = body.reset(f2, i2, u_reset, done)
            return f2, i2, scal2

        scal0 = body.scalar_init(i_s) if extended else ()
        f, i, _ = jax.lax.fori_loop(0, CH, step, (f_s[:], i_s[:], scal0))
        f_s[:], i_s[:] = f, i

        @pl.when(c == n_chunks - 1)
        def _store():
            f_o[:] = f_s[:]
            i_o[:] = i_s[:]

    return kernel, NZ, n_w


def _offpolicy_weights(head: str, agent_state):
    """Flatten the head's actor params into the kernel's transposed slot
    list (weight layouts per agents/ddpg_td3.py:init / sac.py:init /
    dqn.py:init)."""
    col = lambda v: v.reshape(-1, 1)
    if head == 'ddpg':
        (w1, b1), (w2, b2), (wo, bo) = agent_state.act
    elif head == 'sac':
        (w1, b1), (w2, b2) = agent_state.act['enc']
        ((wo, bo),) = agent_state.act['head']
    elif head == 'modsac':
        (w1, b1), (w2, b2) = agent_state.act['enc']
        ((wa, ba),) = agent_state.act['avg']
        ((ws, bs),) = agent_state.act['std']
        return (w1.T, col(b1), w2.T, col(b2), wa.T, col(ba), ws.T, col(bs))
    elif head == 'dqn':
        (w1, b1), (w2, b2), (wo, bo) = agent_state.q['mlp']
    elif head == 'dqn_enc':
        (w1, b1), (w2, b2) = agent_state.q['enc']
        ((wo, bo),) = agent_state.q['val1']
    elif head == 'dqn_duel':
        (w1, b1), (w2, b2) = agent_state.q['enc']
        ((wv, bv),) = agent_state.q['val1']
        ((wadv, badv),) = agent_state.q['adv1']
        return (w1.T, col(b1), w2.T, col(b2), wv.T, col(bv),
                wadv.T, col(badv))
    else:
        raise ValueError(f'unknown off-policy kernel head {head!r}')
    return (w1.T, col(b1), w2.T, col(b2), wo.T, col(bo))


def make_fused_offpolicy_rollout(body: KernelEnvBody, net_dims,
                                 horizon_len: int, num_envs: int,
                                 reward_scale: float, head: str,
                                 head_cfg: dict = None, store_dtype=None,
                                 block: int = 1024, chunk: int = None,
                                 interpret: bool = False,
                                 compute_dtype=None):
    """Build ``rollout_fn(agent_state, env_state, obs, key) ->
    (Rollout, env_state', obs')`` — the fused fast path for the off-policy
    families' exploration (DDPG/TD3/SAC/ModSAC/DQN-family x registered env
    body).  Returns the STANDARD (H, N, dim) rollout layout."""
    from ..agents.base import Rollout

    head_cfg = dict(head_cfg or {})
    if head not in OFFPOLICY_HEADS:
        raise ValueError(f'head must be one of {OFFPOLICY_HEADS}, got {head}')
    D1, D2 = (int(d) for d in net_dims)
    S, A = body.state_dim, body.action_dim
    F, I = body.n_f32, body.n_i32
    discrete = head.startswith('dqn')
    B = min(block, num_envs)
    if num_envs % B:
        raise ValueError(f"num_envs={num_envs} not divisible by block={B}")
    H = int(horizon_len)
    CH = int(chunk or H)
    if H % CH:
        raise ValueError(f"horizon_len={H} not divisible by chunk={CH}")
    n_chunks = H // CH
    if store_dtype is not None and store_dtype != jnp.bfloat16:
        raise ValueError(f'unsupported store_dtype {store_dtype} for the '
                         'fused rollout kernel (only bfloat16 / None)')
    internal_rng = not interpret
    kernel, NZ, n_w = _make_offpolicy_kernel(
        body, CH, n_chunks, B, float(reward_scale), head, head_cfg,
        quantize=store_dtype is not None, internal_rng=internal_rng,
        compute_dtype=compute_dtype)

    env_f_spec = pl.BlockSpec((F, B), lambda b, c: (0, b),
                              memory_space=pltpu.VMEM)
    env_i_spec = pl.BlockSpec((I, B), lambda b, c: (0, b),
                              memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda b, c: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if internal_rng:
        noise_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        noise_spec = [pl.BlockSpec((CH, NZ, B), lambda b, c: (c, 0, b),
                                   memory_space=pltpu.VMEM)]
    w_shapes = [(D1, S), (D1, 1), (D2, D1), (D2, 1)]
    if head == 'sac':
        w_shapes += [(2 * A, D2), (2 * A, 1)]
    elif head == 'modsac':
        w_shapes += [(A, D2), (A, 1), (A, D2), (A, 1)]
    elif head == 'dqn_duel':
        w_shapes += [(A, D2), (A, 1), (1, D2), (1, 1)]
    else:                                   # ddpg / dqn / dqn_enc
        w_shapes += [(A, D2), (A, 1)]
    in_specs = [env_f_spec, env_i_spec,
                *[full(t.shape) for t in body.tables],
                *noise_spec,
                *[full(s) for s in w_shapes]]
    hb_spec = pl.BlockSpec((CH, B), lambda b, c: (c, b),
                           memory_space=pltpu.VMEM)
    act_dtype = jnp.int32 if discrete else jnp.float32
    act_shape = ((H, num_envs) if discrete else (H, A, num_envs))
    act_spec = (hb_spec if discrete else
                pl.BlockSpec((CH, A, B), lambda b, c: (c, 0, b),
                             memory_space=pltpu.VMEM))
    out_specs = (
        pl.BlockSpec((CH, S, B), lambda b, c: (c, 0, b),
                     memory_space=pltpu.VMEM),
        act_spec, hb_spec, hb_spec, hb_spec,
        env_f_spec, env_i_spec,
    )
    out_shape = (
        jax.ShapeDtypeStruct((H, S, num_envs), jnp.float32),
        jax.ShapeDtypeStruct(act_shape, act_dtype),
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # rewards
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # terminals
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # truncates
        jax.ShapeDtypeStruct((F, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((I, num_envs), jnp.int32),
    )
    call = pl.pallas_call(
        kernel,
        grid=(num_envs // B, n_chunks),
        in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((F, B), jnp.float32),
                        pltpu.VMEM((I, B), jnp.int32)],
        # wide nets (e.g. 1024x1024 weights + (1024, B) activations) need
        # more than Mosaic's default 16M scoped-vmem stack; the v5e has
        # far more VMEM than the default reserves
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def rollout_fn(agent_state, env_state, obs, key):
        del obs
        weights = _offpolicy_weights(head, agent_state)
        if internal_rng:
            noise = jax.lax.bitcast_convert_type(
                jax.random.key_data(key).reshape(2), jnp.int32)
        elif discrete:
            noise = jax.random.uniform(key, (H, NZ, num_envs), jnp.float32)
        else:
            kz, ku = jax.random.split(key)
            noise = jnp.concatenate([
                jax.random.normal(kz, (H, A, num_envs), jnp.float32),
                jax.random.uniform(ku, (H, body.n_step + body.n_reset,
                                        num_envs), jnp.float32),
            ], axis=1)
        f0, i0 = body.pack(env_state)
        (states_t, actions_t, rewards, terms, truncs, f1, i1) = call(
            f0, i0.reshape(I, -1).astype(jnp.int32),
            *body.tables, noise, *weights)
        states = jnp.moveaxis(states_t, 1, 2)            # (H, N, S)
        actions = (actions_t if discrete
                   else jnp.moveaxis(actions_t, 1, 2))   # (H, N, A)
        if store_dtype is not None:
            states = states.astype(store_dtype)
            if not discrete:   # base.py: quantize stored actions when no logp
                actions = actions.astype(store_dtype)
        rollout = Rollout(states=states, actions=actions, logprobs=None,
                          rewards=rewards, undones=1.0 - terms,
                          unmasks=1.0 - truncs, extras=None)
        env_state2 = body.unpack(f1, i1, env_state)
        i1 = i1.astype(jnp.int32)
        if body.tables:
            fetch = lambda ti, day: jax.lax.dynamic_slice_in_dim(  # noqa
                body.tables[ti], day, 1, axis=0)
            last_obs = body.obs(f1, i1, (i1[0, 0],), fetch).T
        else:
            last_obs = body.obs(f1, i1).T
        return rollout, env_state2, last_obs

    return rollout_fn


def make_sharded_offpolicy_rollout(body: KernelEnvBody, net_dims,
                                   horizon_len: int, num_envs: int,
                                   reward_scale: float, mesh, head: str,
                                   head_cfg: dict = None, store_dtype=None,
                                   block: int = 1024, chunk: int = None,
                                   interpret: bool = False,
                                   compute_dtype=None):
    """Mesh-DP wrapper for the off-policy fused rollout: same recipe as
    ``make_sharded_fused_rollout`` (env lanes independent, per-shard RNG via
    ``fold_in(axis_index)``), but the outputs are STANDARD-layout (H, N, dim)
    with the env axis SECOND, so rollout tensors shard on axis 1 — aligned
    with the replay ring's ``(M, N, dim)`` num_seqs sharding
    (parallel/mesh.py:shard_train_carry), so the buffer insert is
    communication-free and only the minibatch sample gathers cross-shard."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..agents.base import Rollout

    axis = mesh.axis_names[0]
    ndev = int(math.prod(mesh.devices.shape))
    if num_envs % ndev:
        raise ValueError(f'num_envs={num_envs} not divisible by mesh size '
                         f'{ndev}')
    local = make_fused_offpolicy_rollout(
        body, net_dims, horizon_len, num_envs // ndev, reward_scale,
        head=head, head_cfg=head_cfg, store_dtype=store_dtype,
        block=block, chunk=chunk, interpret=interpret,
        compute_dtype=compute_dtype)

    def shard_fn(agent_state, env_state, obs, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return local(agent_state, env_state, obs, key)

    discrete = head.startswith('dqn')
    env_sp = P(axis)
    ro_sp = Rollout(
        states=P(None, axis, None),
        actions=P(None, axis) if discrete else P(None, axis, None),
        logprobs=None, rewards=P(None, axis),
        undones=P(None, axis), unmasks=P(None, axis), extras=None)
    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(P(), env_sp, env_sp, P()),
                     out_specs=(ro_sp, env_sp, env_sp),
                     check_vma=False)
