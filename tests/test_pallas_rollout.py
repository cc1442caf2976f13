"""Exact-math parity tests for the fused whole-rollout Pallas kernel
(``ops/pallas_rollout.py``) against the generic ``collect_rollout`` scan
path, run on CPU via the TPU interpreter.

The kernel consumes noise drawn OUTSIDE the kernel with ``jax.random`` and
streamed in as an input (ops/pallas_rollout.py design note) — deterministic
given the key but a different split sequence than the scan path — so parity
is checked *deterministically* by recomputing
every stored quantity from the kernel's own stored states/actions with the
reference-path pure functions: actor mean, logprob, critic value, reward,
dynamics transition, truncation bookkeeping.  A separate statistical test
checks the action noise is standard normal.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elegantrl_tpu.agents.ppo import make_ppo, _norm_state
from elegantrl_tpu.envs.pendulum import make_pendulum, PendulumState
from elegantrl_tpu.ops.nets import mlp_apply
from elegantrl_tpu.ops.dists import normal_logprob
from elegantrl_tpu.ops.pallas_rollout import make_pendulum_ppo_rollout
from elegantrl_tpu.config import Config


NET_DIMS = (16, 16)
H, N = 12, 16


@pytest.fixture(scope="module")
def setup():
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 3, 1, args)
    key = jax.random.PRNGKey(0)
    s = agent.init(key)
    # non-trivial state norm so the kernel's norm path is exercised
    s = s._replace(norm_avg=jnp.array([0.1, -0.2, 0.3]),
                   norm_std=jnp.array([0.9, 1.1, 2.0]))
    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    env_state = jax.vmap(env.init)(keys)
    # stagger step counters so truncation fires mid-rollout for some envs
    env_state = env_state._replace(
        t=(jnp.arange(N) * 17 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    fast = make_pendulum_ppo_rollout(NET_DIMS, H, N, reward_scale=1.0,
                                     block=8, interpret=True)
    rollout, env_state2, obs2 = fast(s, env_state, obs,
                                     jax.random.PRNGKey(3))
    # the fast path keeps the kernel-native transposed layout and flags it
    assert 'tsn' in rollout.extras
    assert rollout.states.shape == (H, 3, N)
    assert rollout.actions.shape == (H, 1, N)
    # un-transpose once here so the value/dynamics parity assertions below
    # read the reference (H, N, dim) layout
    rollout = rollout._replace(states=jnp.moveaxis(rollout.states, 1, 2),
                               actions=jnp.moveaxis(rollout.actions, 1, 2))
    return s, env, env_state, obs, rollout, env_state2, obs2


def test_shapes_and_first_state(setup):
    s, env, env_state, obs, rollout, _, _ = setup
    assert rollout.states.shape == (H, N, 3)
    assert rollout.actions.shape == (H, N, 1)
    assert rollout.logprobs.shape == (H, N)
    assert rollout.extras['values'].shape == (H, N)
    np.testing.assert_allclose(rollout.states[0], obs, rtol=1e-6)


def test_logprob_value_parity(setup):
    """Recompute logprob and value from stored (state, action) with the
    scan-path pure functions — must match what the kernel stored."""
    s, env, _, _, rollout, _, _ = setup
    x = _norm_state(rollout.states.reshape(-1, 3), s.norm_avg, s.norm_std)
    mean = mlp_apply(s.act['mlp'], x)
    std = jnp.exp(s.act['std_log'])
    lp = jnp.sum(normal_logprob(rollout.actions.reshape(-1, 1), mean, std),
                 axis=-1)
    np.testing.assert_allclose(lp.reshape(H, N), rollout.logprobs,
                               rtol=2e-4, atol=2e-5)
    v = mlp_apply(s.cri, x)[:, 0]
    np.testing.assert_allclose(v.reshape(H, N), rollout.extras['values'],
                               rtol=2e-4, atol=2e-5)


def test_reward_dynamics_parity(setup):
    """Stored rewards and the t->t+1 state transition must match the pure
    env step applied to the kernel's stored states/actions."""
    s, env, env_state, _, rollout, env_state2, obs2 = setup
    costh = rollout.states[..., 0]
    sinth = rollout.states[..., 1]
    thdot = rollout.states[..., 2]
    th = jnp.arctan2(sinth, costh)           # wrapped, fine for cos/sin math
    u = jnp.clip(jnp.tanh(rollout.actions[..., 0]) * 2.0, -2.0, 2.0)
    cost = th ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2
    np.testing.assert_allclose(rollout.rewards, -0.5 * cost,
                               rtol=1e-4, atol=1e-5)
    thdot2 = jnp.clip(thdot + (15.0 * sinth + 3.0 * u) * 0.05, -8.0, 8.0)
    th2 = th + thdot2 * 0.05
    trunc = 1.0 - rollout.unmasks            # (H, N)
    # where NOT truncated, next stored obs must equal the deterministic step
    nxt_cos, nxt_sin = jnp.cos(th2), jnp.sin(th2)
    keep = (trunc[:-1] == 0.0)
    np.testing.assert_allclose(
        jnp.where(keep, rollout.states[1:, :, 0], 0.0),
        jnp.where(keep, nxt_cos[:-1], 0.0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        jnp.where(keep, rollout.states[1:, :, 2], 0.0),
        jnp.where(keep, thdot2[:-1], 0.0), rtol=1e-4, atol=1e-4)
    # final env_state continues the chain (last step not truncated)
    last_keep = trunc[-1] == 0.0
    np.testing.assert_allclose(
        jnp.where(last_keep, jnp.cos(env_state2.theta), 0.0),
        jnp.where(last_keep, nxt_cos[-1], 0.0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        obs2, jnp.stack([jnp.cos(env_state2.theta),
                         jnp.sin(env_state2.theta),
                         env_state2.theta_dot], axis=-1), rtol=1e-6)


def test_truncation_bookkeeping(setup):
    """Truncation must fire exactly when the step counter hits 200, reset
    state into the init ranges, and zero the counter."""
    s, env, env_state, _, rollout, env_state2, _ = setup
    t0 = np.asarray(env_state.t)
    trunc = np.asarray(1.0 - rollout.unmasks)
    for n in range(N):
        t = t0[n]
        for h in range(H):
            t += 1
            expect = float(t >= 200)
            assert trunc[h, n] == expect, (h, n, t)
            if t >= 200:
                t = 0
    # undones all ones (Pendulum never terminates)
    assert np.all(np.asarray(rollout.undones) == 1.0)
    # post-reset states in init ranges
    reset_rows = np.argwhere(trunc[:-1] == 1.0)
    for h, n in reset_rows:
        thdot = float(rollout.states[h + 1, n, 2])
        assert -1.0 <= thdot <= 1.0, (h, n, thdot)


def test_noise_exact_parity(setup):
    """The kernel's exploration noise is drawn OUTSIDE the kernel with
    jax.random; z = (action - mean)/std must reproduce that draw exactly
    (up to f32 roundoff), so the fast path is deterministic given the key
    and the noise is threefry-quality by construction."""
    s, env, _, _, rollout, _, _ = setup
    kz, _ = jax.random.split(jax.random.PRNGKey(3))
    z_expect = jax.random.normal(kz, (H, 1, N), jnp.float32)
    x = _norm_state(rollout.states.reshape(-1, 3), s.norm_avg, s.norm_std)
    mean = mlp_apply(s.act['mlp'], x).reshape(H, N, 1)
    std = jnp.exp(s.act['std_log'])
    z = (rollout.actions - mean) / std
    np.testing.assert_allclose(np.asarray(z)[..., 0],
                               np.asarray(z_expect)[:, 0, :],
                               rtol=1e-3, atol=1e-4)


def test_runner_fast_path_trains(capsys):
    """End-to-end: the runner with use_pallas_rollout='interpret' must run
    rounds and produce finite improving metrics (CPU, tiny shapes)."""
    from elegantrl_tpu.train.runner import build_training
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.agents import AgentPPO

    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 16,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.horizon_len = 32
    args.net_dims = (16, 16)
    args.batch_size = 64
    args.repeat_times = 2.0
    args.use_pallas_rollout = 'interpret'
    ctx = build_training(args)
    assert 'pallas fused-rollout fast path enabled' in capsys.readouterr().out
    carry, metrics = jax.jit(ctx.round_fn)(ctx.carry, None)
    assert np.isfinite(float(metrics['obj_critic']))
    assert np.isfinite(float(metrics['obj_actor']))


# ---------------------------------------------------------------------------
# Generalized kernel env bodies (round 4): exact-math parity of each
# registered KernelEnvBody against its env module's (obs, step), plus
# interpret-mode integration for the CartPole (discrete head) and
# HopperSlip fast paths.
# ---------------------------------------------------------------------------
from elegantrl_tpu.ops.pallas_rollout import (
    CARTPOLE_BODY, HOPPER_BODY, PENDULUM_BODY, KERNEL_ENV_BODIES,
    make_fused_rollout)
from elegantrl_tpu.envs.cartpole import make_cartpole
from elegantrl_tpu.envs.hopper import make_hopper
from elegantrl_tpu.envs.point_chasing import (make_point_chasing,
                                              make_point_chasing_discrete)
from elegantrl_tpu.ops.dists import categorical_logprob


def _random_states(env, n, key, steps=5, discrete=False, a_dim=1):
    """Valid env states: init then a few random steps (keeps ranges real)."""
    keys = jax.random.split(key, n)
    state = jax.vmap(env.init)(keys)
    k = jax.random.PRNGKey(99)
    for _ in range(steps):
        k, ka, ks = jax.random.split(k, 3)
        if discrete:
            a = jax.random.randint(ka, (n,), 0, a_dim)
        else:
            a = jax.random.uniform(ka, (n, a_dim), jnp.float32, -1, 1)
        step_keys = jax.random.split(ks, n)
        state, _, _, _ = jax.vmap(env.step)(state, a, step_keys)
    return state


@pytest.mark.parametrize("name,make_env,discrete", [
    ("Pendulum-v1", None, False),
    ("CartPole-v1", make_cartpole, True),
    ("HopperSlip-v0", make_hopper, False),
    ("PointChasingVecEnv", make_point_chasing, False),
    ("PointChasingDiscreteEnv", make_point_chasing_discrete, True),
])
def test_body_step_parity(name, make_env, discrete):
    """body.step/obs must reproduce the env module's step/obs exactly.
    Bodies with n_step > 0 (PointChasing's walker) are fed the SAME
    uniforms the env module draws from its per-env step keys."""
    from elegantrl_tpu.envs.pendulum import make_pendulum
    env = make_env() if make_env else make_pendulum()
    body = KERNEL_ENV_BODIES[name]
    n = 32
    state = _random_states(env, n, jax.random.PRNGKey(1),
                           discrete=discrete, a_dim=env.spec.action_dim)
    if discrete:
        act = jax.random.randint(jax.random.PRNGKey(2), (n,), 0,
                                 env.spec.action_dim)
        act_rows = act.astype(jnp.float32)[None]            # (1, B)
    else:
        act = jax.random.uniform(jax.random.PRNGKey(2),
                                 (n, env.spec.action_dim), jnp.float32,
                                 -0.99, 0.99)
        act_rows = act.T                                    # (A, B)
    f, i = body.pack(state)
    # obs parity
    obs_body = body.obs(f, i)
    obs_env = jax.vmap(env.obs)(state)
    np.testing.assert_allclose(np.asarray(obs_body.T), np.asarray(obs_env),
                               rtol=1e-6, atol=1e-7)
    # step parity: replicate the env module's per-step uniform draws so a
    # randomness-consuming body sees identical walker noise
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    u_rows = jax.vmap(
        lambda k: jax.random.uniform(k, (body.n_step,), jnp.float32))(
            keys).T if body.n_step else jnp.zeros((0, n), jnp.float32)
    f2, i2, rew, term, trunc = body.step(f, i, act_rows, u_rows)
    s2, rew_e, term_e, trunc_e = jax.vmap(env.step)(state, act, keys)
    f2_e, i2_e = body.pack(s2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f2_e),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2[0]), np.asarray(i2_e[0]))
    np.testing.assert_allclose(np.asarray(rew[0]), np.asarray(rew_e),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(term[0]) > 0,
                                  np.asarray(term_e))
    np.testing.assert_array_equal(np.asarray(trunc[0]) > 0,
                                  np.asarray(trunc_e))


def test_cartpole_discrete_fast_path():
    """Interpret-mode CartPole rollout: stored logprobs/values recompute
    from stored states/actions with the scan-path pure functions; terminal
    bookkeeping (undones) reflects pole falls; reset ranges honored."""
    from elegantrl_tpu.ops.dists import categorical_entropy
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 4, 2, args, discrete=True)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_cartpole()
    n, h = 16, 24
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_rollout(CARTPOLE_BODY, NET_DIMS, h, n, 1.0,
                              discrete=True, block=8, interpret=True)
    ro, es2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert ro.actions.shape == (h, n) and ro.actions.dtype == jnp.int32
    assert ro.states.shape == (h, 4, n)
    states = jnp.moveaxis(ro.states, 1, 2).reshape(-1, 4)
    logits = mlp_apply(s.act['mlp'],
                       _norm_state(states, s.norm_avg, s.norm_std))
    lp = categorical_logprob(logits, ro.actions.reshape(-1))
    np.testing.assert_allclose(np.asarray(lp.reshape(h, n)),
                               np.asarray(ro.logprobs), rtol=2e-4, atol=2e-5)
    v = mlp_apply(s.cri, _norm_state(states, s.norm_avg, s.norm_std))[:, 0]
    np.testing.assert_allclose(np.asarray(v.reshape(h, n)),
                               np.asarray(ro.extras['values']),
                               rtol=2e-4, atol=2e-5)
    # rewards are all 1.0 on CartPole; dones eventually happen from random
    # inits + random policy within 24 steps for at least one env
    np.testing.assert_allclose(np.asarray(ro.rewards), 1.0)
    dones = 1.0 - np.asarray(ro.undones) * np.asarray(ro.unmasks)
    # after a done, the stored next state must be inside the reset range
    hs, ns = np.nonzero(dones[:-1])
    for t, e in zip(hs, ns):
        nxt = np.asarray(ro.states)[t + 1, :, e]
        assert np.all(np.abs(nxt) <= 0.05 + 1e-6), (t, e, nxt)


def test_hopper_fast_path():
    """Interpret-mode HopperSlip rollout: logprob/value parity + the t->t+1
    transition matches the pure env step wherever no reset intervened."""
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 6, 2, args)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_hopper()
    n, h = 16, 24
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_rollout(HOPPER_BODY, NET_DIMS, h, n, 1.0,
                              discrete=False, block=8, interpret=True)
    ro, es2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert ro.states.shape == (h, 6, n)
    assert ro.actions.shape == (h, 2, n)
    states = jnp.moveaxis(ro.states, 1, 2).reshape(-1, 6)
    actions = jnp.moveaxis(ro.actions, 1, 2).reshape(-1, 2)
    mean = mlp_apply(s.act['mlp'],
                     _norm_state(states, s.norm_avg, s.norm_std))
    std = jnp.exp(s.act['std_log'])
    lp = jnp.sum(normal_logprob(actions, mean, std), axis=-1)
    np.testing.assert_allclose(np.asarray(lp.reshape(h, n)),
                               np.asarray(ro.logprobs), rtol=2e-4, atol=2e-4)
    # final obs consistent with final env_state
    np.testing.assert_allclose(np.asarray(obs2),
                               np.asarray(jax.vmap(env.obs)(es2)),
                               rtol=1e-5, atol=1e-6)


def test_chasing_fast_path():
    """Interpret-mode PointChasing rollout (the first n_step > 0 body):
    logprob/value parity from stored states/actions; the state invariant
    distance == ||p0 - p1|| holds at every stored step (both the walker
    update and the reset preserve it); rewards recompute from consecutive
    stored states wherever no reset intervened."""
    from elegantrl_tpu.ops.pallas_rollout import CHASING_BODY
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 8, 2, args)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_point_chasing()
    n, h = 16, 24
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_rollout(CHASING_BODY, NET_DIMS, h, n, 1.0,
                              discrete=False, block=8, interpret=True)
    ro, es2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert ro.states.shape == (h, 8, n)
    assert ro.actions.shape == (h, 2, n)
    states = jnp.moveaxis(ro.states, 1, 2).reshape(-1, 8)
    actions = jnp.moveaxis(ro.actions, 1, 2).reshape(-1, 2)
    mean = mlp_apply(s.act['mlp'],
                     _norm_state(states, s.norm_avg, s.norm_std))
    std = jnp.exp(s.act['std_log'])
    lp = jnp.sum(normal_logprob(actions, mean, std), axis=-1)
    np.testing.assert_allclose(np.asarray(lp.reshape(h, n)),
                               np.asarray(ro.logprobs), rtol=2e-4, atol=2e-4)
    v = mlp_apply(s.cri, _norm_state(states, s.norm_avg, s.norm_std))[:, 0]
    np.testing.assert_allclose(np.asarray(v.reshape(h, n)),
                               np.asarray(ro.extras['values']),
                               rtol=2e-4, atol=2e-4)
    # reward parity where no done intervened: r_t = d(s_t) - d(s_{t+1})
    #                                               - 0.02 * max(||a_t||, 1)
    st = jnp.moveaxis(ro.states, 1, 2)                      # (h, n, 8)
    dist = jnp.sqrt(jnp.sum(jnp.square(st[..., 0:2] - st[..., 4:6]),
                            axis=-1))                       # (h, n)
    a_env = jnp.tanh(jnp.moveaxis(ro.actions, 1, 2))        # (h, n, 2)
    a_l2 = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(a_env), -1)), 1.0)
    keep = np.asarray((ro.undones * ro.unmasks)[:-1]) == 1.0
    want = dist[:-1] - dist[1:] - 0.02 * a_l2[:-1]
    np.testing.assert_allclose(
        np.where(keep, np.asarray(ro.rewards[:-1]), 0.0),
        np.where(keep, np.asarray(want), 0.0), rtol=1e-4, atol=1e-4)
    # final obs consistent with final env_state + distance invariant
    np.testing.assert_allclose(np.asarray(obs2),
                               np.asarray(jax.vmap(env.obs)(es2)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(es2.distance),
        np.asarray(jnp.sqrt(jnp.sum(jnp.square(es2.p0 - es2.p1), -1))),
        rtol=1e-5, atol=1e-6)


def test_chasing_discrete_fast_path():
    """Interpret-mode discrete PointChasing: int32 actions in [0, 9),
    logprob parity via the categorical head, digit-decode exercised."""
    from elegantrl_tpu.ops.pallas_rollout import CHASING_DISCRETE_BODY
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 8, 9, args, discrete=True)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_point_chasing_discrete()
    n, h = 16, 24
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_rollout(CHASING_DISCRETE_BODY, NET_DIMS, h, n, 1.0,
                              discrete=True, block=8, interpret=True)
    ro, es2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert ro.actions.shape == (h, n) and ro.actions.dtype == jnp.int32
    acts = np.asarray(ro.actions)
    assert acts.min() >= 0 and acts.max() < 9
    states = jnp.moveaxis(ro.states, 1, 2).reshape(-1, 8)
    logits = mlp_apply(s.act['mlp'],
                       _norm_state(states, s.norm_avg, s.norm_std))
    lp = categorical_logprob(logits, ro.actions.reshape(-1))
    np.testing.assert_allclose(np.asarray(lp.reshape(h, n)),
                               np.asarray(ro.logprobs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs2),
                               np.asarray(jax.vmap(env.obs)(es2)),
                               rtol=1e-5, atol=1e-6)


def test_stock_body_step_parity():
    """The StockTrading body (tables + scalar-day extension) must reproduce
    the env module's obs/step exactly — dead-zone, integer lots, sequential
    cash-constrained trades, cost, delta-asset reward, terminal bonus."""
    from elegantrl_tpu.envs.stock_trading import make_stock_trading
    env = make_stock_trading()
    body = env.kernel_body
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    state = jax.vmap(env.init)(keys)
    # advance a few steps with random actions so shares/cash are non-trivial
    k = jax.random.PRNGKey(99)
    for _ in range(3):
        k, ka, ks = jax.random.split(k, 3)
        a = jax.random.uniform(ka, (n, env.spec.action_dim), jnp.float32,
                               -1, 1)
        state, _, _, _ = jax.vmap(env.step)(state, a,
                                            jax.random.split(ks, n))
    f, i = body.pack(state)
    fetch = lambda ti, day: jax.lax.dynamic_slice_in_dim(  # noqa: E731
        body.tables[ti], day, 1, axis=0)
    scal = (i[0, 0],)
    # obs parity
    obs_body = body.obs(f, i, scal, fetch)
    obs_env = jax.vmap(env.obs)(state)
    np.testing.assert_allclose(np.asarray(obs_body.T), np.asarray(obs_env),
                               rtol=1e-6, atol=1e-7)
    # step parity
    act = jax.random.uniform(jax.random.PRNGKey(2),
                             (n, env.spec.action_dim), jnp.float32,
                             -0.99, 0.99)
    u = jnp.zeros((0, n), jnp.float32)
    f2, i2, rew, term, trunc, scal2 = body.step(f, i, act.T, u, scal, fetch)
    s2, rew_e, term_e, trunc_e = jax.vmap(env.step)(
        state, act, jax.random.split(jax.random.PRNGKey(3), n))
    f2_e, i2_e = body.pack(s2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f2_e),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i2[0]), np.asarray(i2_e[0]))
    # reward is the cancellation-prone delta of ~1e6 totals scaled by 2^-12;
    # the body's lane-dim reduction tree can differ from the env's sublane-dim
    # one by one f32 ulp of the total: ulp(1e6) * 2^-12 ~= 1.5e-5
    np.testing.assert_allclose(np.asarray(rew[0]), np.asarray(rew_e),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(term[0]) > 0, np.asarray(term_e))
    assert int(scal2[0]) == int(np.asarray(i2_e[0])[0])
    # terminal-step parity: bonus + cumulative_returns recording + day wrap
    T = body.tables[0].shape[0]
    state_end = state._replace(day=jnp.full((n,), T - 2, jnp.int32))
    f, i = body.pack(state_end)
    scal = (i[0, 0],)
    f2, i2, rew, term, trunc, scal2 = body.step(f, i, act.T, u, scal, fetch)
    s2, rew_e, term_e, _ = jax.vmap(env.step)(
        state_end, act, jax.random.split(jax.random.PRNGKey(3), n))
    assert np.all(np.asarray(term[0]) > 0) and np.all(np.asarray(term_e))
    np.testing.assert_allclose(np.asarray(rew[0]), np.asarray(rew_e),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f2[3 + env.spec.action_dim]),
                               np.asarray(s2.cumulative_returns),
                               rtol=1e-5, atol=1e-5)
    assert int(scal2[0]) == 0


def test_stock_fast_path():
    """Interpret-mode StockTrading rollout: logprob/value parity from
    stored states/actions, day-counter bookkeeping through the chunked
    grid, and the stored market rows must equal the table rows for the
    (shared) day sequence."""
    from elegantrl_tpu.envs.stock_trading import make_stock_trading
    env = make_stock_trading()
    body = env.kernel_body
    S_dim, A_dim = env.spec.state_dim, env.spec.action_dim
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, S_dim, A_dim, args)
    s = agent.init(jax.random.PRNGKey(0))
    n, h = 8, 12
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_rollout(body, NET_DIMS, h, n, 1.0,
                              discrete=False, block=8, chunk=4,
                              interpret=True)
    ro, es2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert ro.states.shape == (h, S_dim, n)
    assert ro.actions.shape == (h, A_dim, n)
    states = jnp.moveaxis(ro.states, 1, 2).reshape(-1, S_dim)
    actions = jnp.moveaxis(ro.actions, 1, 2).reshape(-1, A_dim)
    mean = mlp_apply(s.act['mlp'],
                     _norm_state(states, s.norm_avg, s.norm_std))
    std = jnp.exp(s.act['std_log'])
    lp = jnp.sum(normal_logprob(actions, mean, std), axis=-1)
    np.testing.assert_allclose(np.asarray(lp.reshape(h, n)),
                               np.asarray(ro.logprobs), rtol=2e-4, atol=2e-4)
    # stored market rows: day starts at 0 and increments each step, so
    # states[t, 1+2A:, :] must equal the (lane-broadcast) table rows
    close, tech = body.tables
    for t in range(h):
        np.testing.assert_allclose(
            np.asarray(ro.states[t, 1 + A_dim:1 + 2 * A_dim, 0]),
            np.asarray(close[t] * 2.0 ** -7), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ro.states[t, 1 + 2 * A_dim:, 0]),
            np.asarray(tech[t] * 2.0 ** -6), rtol=1e-6)
    # final env state: day advanced h steps, no terminal hit
    np.testing.assert_array_equal(np.asarray(es2.day),
                                  np.full(n, h, np.int32))
    np.testing.assert_allclose(np.asarray(obs2),
                               np.asarray(jax.vmap(env.obs)(es2)),
                               rtol=1e-5, atol=1e-6)


def test_chunked_equals_unchunked():
    """Time-chunked grid (chunk < horizon) must produce the same rollout as
    one chunk given the same external noise (interpret mode)."""
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 3, 1, args)
    s = agent.init(jax.random.PRNGKey(0))
    from elegantrl_tpu.envs.pendulum import make_pendulum
    env = make_pendulum()
    n, h = 16, 24
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    env_state = env_state._replace(
        t=(jnp.arange(n) * 29 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    f1 = make_fused_rollout(PENDULUM_BODY, NET_DIMS, h, n, 1.0,
                            discrete=False, block=8, interpret=True)
    f2 = make_fused_rollout(PENDULUM_BODY, NET_DIMS, h, n, 1.0,
                            discrete=False, block=8, chunk=6, interpret=True)
    ro1, es1, ob1 = f1(s, env_state, obs, jax.random.PRNGKey(3))
    ro2, es2, ob2 = f2(s, env_state, obs, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree.leaves(ro1), jax.tree.leaves(ro2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ob1), np.asarray(ob2))


def test_sharded_fused_rollout_parity():
    """shard_map DP wrapper == manual per-shard kernel runs with the same
    folded keys, concatenated along the env axis (8-device CPU mesh,
    interpret mode)."""
    from elegantrl_tpu.ops.pallas_rollout import (PENDULUM_BODY,
                                                  make_fused_rollout,
                                                  make_sharded_fused_rollout)
    from elegantrl_tpu.parallel.mesh import make_mesh
    mesh = make_mesh({'dp': 8})
    n, h, n_loc = 32, 8, 4
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 3, 1, args)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    env_state = env_state._replace(
        t=(jnp.arange(n) * 29 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    key = jax.random.PRNGKey(3)
    sharded = make_sharded_fused_rollout(
        PENDULUM_BODY, NET_DIMS, h, n, 1.0, mesh, discrete=False,
        block=n_loc, chunk=4, interpret=True)
    ro, es2, ob2 = jax.jit(sharded)(s, env_state, obs, key)
    local = make_fused_rollout(PENDULUM_BODY, NET_DIMS, h, n_loc, 1.0,
                               discrete=False, block=n_loc, chunk=4,
                               interpret=True)
    parts = []
    for k in range(8):
        shard_es = jax.tree.map(lambda x: x[k * n_loc:(k + 1) * n_loc],
                                env_state)
        parts.append(local(s, shard_es, obs[k * n_loc:(k + 1) * n_loc],
                           jax.random.fold_in(key, k)))
    exp_ro = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=-1),
                          *[p[0] for p in parts])
    exp_es = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                          *[p[1] for p in parts])
    exp_ob = jnp.concatenate([p[2] for p in parts], axis=0)
    for a, b in zip(jax.tree.leaves(ro), jax.tree.leaves(exp_ro)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(es2), jax.tree.leaves(exp_es)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ob2), np.asarray(exp_ob))


def test_sharded_fast_path_trains():
    """End-to-end: build_training under a dp-8 mesh auto-selects the
    SHARDED fused rollout (interpret mode) and the mesh-DP update half
    consumes its transposed sharded tensors — metrics finite, params move,
    params stay replicated across devices."""
    from elegantrl_tpu.agents import AgentPPO
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.parallel.mesh import make_mesh
    from elegantrl_tpu.train.runner import build_training
    mesh = make_mesh({'dp': 8})
    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 128,
                            'max_step': 200, 'state_dim': 3,
                            'action_dim': 1, 'if_discrete': False})
    args.horizon_len = 16
    args.net_dims = NET_DIMS
    args.batch_size = 64
    args.repeat_times = 2.0
    args.use_pallas_rollout = 'interpret'
    ctx = build_training(args, mesh=mesh)

    @jax.jit
    def two_rounds(c):
        c, m1 = ctx.round_fn(c, None)
        c, m2 = ctx.round_fn(c, None)
        return c, (m1, m2)

    carry2, (m1, m2) = two_rounds(ctx.carry)
    for v in jax.tree.leaves((m1, m2)):
        assert np.all(np.isfinite(np.asarray(v)))
    w0 = jax.tree.leaves(ctx.carry.agent_state.act)[0]
    w2 = jax.tree.leaves(carry2.agent_state.act)[0]
    assert not np.allclose(np.asarray(w0), np.asarray(w2))
    # replicated params: every device shard holds identical values
    leaf = jax.tree.leaves(carry2.agent_state.act)[0]
    shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_bf16_compute_dtype_close_to_f32():
    """The bf16-compute kernel variant (round 5, `_bf16_dot`: bf16 matmul
    operands, f32 accumulation) must produce rollouts close to the f32
    kernel — same env transitions modulo bf16 rounding of the policy
    outputs — and actually differ (proving the cast is live)."""
    from elegantrl_tpu.envs.pendulum import make_pendulum
    args = Config()
    args.net_dims = NET_DIMS
    agent = make_ppo(NET_DIMS, 3, 1, args)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_pendulum()
    n, h = 16, 16
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    from elegantrl_tpu.ops.pallas_rollout import PENDULUM_BODY
    mk = lambda cd: make_fused_rollout(
        PENDULUM_BODY, NET_DIMS, h, n, 1.0, discrete=False, block=8,
        interpret=True, compute_dtype=cd)
    ro32, _, _ = mk(None)(s, env_state, obs, jax.random.PRNGKey(3))
    ro16, _, _ = mk('bfloat16')(s, env_state, obs, jax.random.PRNGKey(3))
    a32 = np.asarray(ro32.actions)
    a16 = np.asarray(ro16.actions)
    assert not np.array_equal(a32, a16)          # the cast is live
    np.testing.assert_allclose(a16, a32, rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(ro16.rewards),
                               np.asarray(ro32.rewards), rtol=0.2, atol=0.2)
