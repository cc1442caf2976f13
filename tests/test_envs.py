"""Env protocol conformance + behavioral checks (mirrors the intent of the
reference's unit_tests/envs/test_env.py but for the functional JAX envs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from functools import partial

from elegantrl_tpu.envs import (
    make_pendulum, make_cartpole, make_point_chasing,
    make_point_chasing_discrete, make_stock_trading, make_lunar_lander,
    vec_reset, vec_step, VecEnv,
)

ALL_DEFS = [make_pendulum, make_cartpole, make_point_chasing,
            make_point_chasing_discrete, make_stock_trading,
            partial(make_lunar_lander, False), partial(make_lunar_lander, True)]


@pytest.mark.parametrize("make", ALL_DEFS)
def test_protocol_and_shapes(make):
    env = make()
    spec = env.spec
    assert isinstance(spec.state_dim, int) and isinstance(spec.action_dim, int)

    num_envs = 4
    key = jax.random.key(0)
    state, obs = vec_reset(env, key, num_envs)
    assert obs.shape == (num_envs, spec.state_dim)

    if spec.if_discrete:
        actions = jnp.zeros((num_envs,), jnp.int32)
    else:
        actions = jnp.zeros((num_envs, spec.action_dim), jnp.float32)
    state, obs, rew, term, trunc = vec_step(env, state, actions, jax.random.key(1))
    assert obs.shape == (num_envs, spec.state_dim)
    assert rew.shape == (num_envs,)
    assert term.shape == (num_envs,) and term.dtype == jnp.bool_
    assert trunc.shape == (num_envs,) and trunc.dtype == jnp.bool_
    assert np.all(np.isfinite(np.asarray(obs)))


def test_pendulum_truncates_at_200():
    env = make_pendulum()
    state, obs = vec_reset(env, jax.random.key(0), 2)

    def body(carry, _):
        state, key = carry
        key, sub = jax.random.split(key)
        state, obs, r, term, trunc = vec_step(
            env, state, jnp.zeros((2, 1)), sub)
        return (state, key), (term, trunc)

    (_, _), (terms, truncs) = jax.lax.scan(
        body, (state, jax.random.key(1)), None, length=200)
    assert not bool(np.asarray(terms).any())
    assert bool(np.asarray(truncs)[-1].all())       # truncated at step 200
    assert not bool(np.asarray(truncs)[:-1].any())  # never before (auto-reset)


def test_pendulum_reward_range():
    # reward = -0.5*cost; cost in [0, pi^2 + 0.1*64 + 0.001*4]
    env = make_pendulum()
    state, _ = vec_reset(env, jax.random.key(0), 8)
    key = jax.random.key(1)
    for _ in range(10):
        key, k1, k2 = jax.random.split(key, 3)
        a = jax.random.uniform(k1, (8, 1), minval=-1, maxval=1)
        state, _, r, _, _ = vec_step(env, state, a, k2)
        r = np.asarray(r)
        assert np.all(r <= 0.0) and np.all(r >= -0.5 * (np.pi ** 2 + 6.5))


def test_cartpole_balanced_survives_and_reward_is_one():
    env = make_cartpole()
    state, obs = vec_reset(env, jax.random.key(0), 4)
    key = jax.random.key(1)
    for _ in range(20):
        key, sub = jax.random.split(key)
        # crude balance policy: push in direction the pole is falling
        actions = (np.asarray(obs)[:, 2] > 0).astype(np.int32)
        state, obs, r, term, trunc = vec_step(env, state, jnp.asarray(actions), sub)
        assert np.all(np.asarray(r) == 1.0)
        assert not np.asarray(term).any()


def test_point_chasing_chaser_beats_runner():
    # chasing (a = p0 - p1) must collect more reward than running away
    def rollout(sign):
        env = make_point_chasing(dim=2)
        state, obs = vec_reset(env, jax.random.key(0), 8)
        key = jax.random.key(1)
        total = np.zeros(8)
        for _ in range(100):
            key, sub = jax.random.split(key)
            o = np.asarray(obs).reshape(8, 4, 2)
            actions = jnp.asarray(sign * (o[:, 0] - o[:, 2]))
            state, obs, r, term, trunc = vec_step(env, state, actions, sub)
            total += np.asarray(r)
        return total

    chase, flee = rollout(+1.0), rollout(-1.0)
    assert np.isfinite(chase).all()
    assert chase.mean() > flee.mean()


def test_stock_trading_buy_and_hold_changes_asset():
    env = make_stock_trading(if_random_reset=False)
    state, obs = vec_reset(env, jax.random.key(0), 2)
    key = jax.random.key(1)
    n_actions = env.spec.action_dim
    rewards = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, obs, r, term, trunc = vec_step(
            env, state, jnp.ones((2, n_actions)), sub)
        rewards.append(np.asarray(r))
    rewards = np.stack(rewards)
    assert np.isfinite(rewards).all()
    assert np.abs(rewards).sum() > 0  # trading moved the portfolio
    # cash must never go negative
    assert np.all(np.asarray(state.amount) >= -1e-3)


def test_stock_trading_cash_constraint():
    env = make_stock_trading(if_random_reset=False, initial_amount=100.0)
    state, obs = vec_reset(env, jax.random.key(0), 1)
    # massive buy order with tiny cash: must clip, not go negative
    state, _, _, _, _ = vec_step(env, state, jnp.ones((1, env.spec.action_dim)),
                                 jax.random.key(1))
    assert float(state.amount[0]) >= -1e-3


def test_lunar_lander_semantics():
    env = make_lunar_lander(continuous=True)
    step = jax.jit(partial(vec_step, env))
    # hovering policy (counteract gravity) must survive longer than freefall
    state, obs = vec_reset(env, jax.random.key(0), 8)
    key = jax.random.key(1)
    crash_step_free = None
    for t in range(300):
        key, sub = jax.random.split(key)
        state, obs, r, term, trunc = vec_step(
            env, state, jnp.full((8, 2), -1.0), sub)  # engines off
        if np.asarray(term).any() and crash_step_free is None:
            crash_step_free = t
            break
    assert crash_step_free is not None and crash_step_free < 120
    # crash penalty: freefall terminal reward is strongly negative
    r = np.asarray(r)
    assert r[np.asarray(term)].min() < -50


def test_stateful_adapter_api():
    env = VecEnv(make_pendulum(), num_envs=3, seed=0)
    obs, info = env.reset()
    assert obs.shape == (3, 3)
    obs, r, term, trunc, info = env.step(np.zeros((3, 1), np.float32))
    assert obs.shape == (3, 3) and r.shape == (3,)


def test_auto_reset_inside_vec_step():
    env = make_cartpole()
    state, obs = vec_reset(env, jax.random.key(0), 4)
    key = jax.random.key(1)
    saw_terminal = False
    for i in range(600):
        key, sub = jax.random.split(key)
        # always push right -> pole falls -> terminal -> auto-reset
        state, obs, r, term, trunc = vec_step(
            env, state, jnp.ones((4,), jnp.int32), sub)
        if np.asarray(term).any():
            saw_terminal = True
            # after auto-reset the step counter must be 0 for done envs
            t = np.asarray(state.t)
            assert np.all(t[np.asarray(term)] == 0)
            break
    assert saw_terminal


def test_lunar_lander_hard_impact_is_crash_not_landing():
    """Slamming down fast must terminate as a crash (-100), not collect the
    +100 landing bonus — the point-mass model zeroes vy at contact, so
    without the impact-velocity check any descent speed would 'land'."""
    env = make_lunar_lander(continuous=True)
    state, obs = vec_reset(env, jax.random.key(3), 4)
    # pin a vertical hard-descent state just above the pad
    state = state._replace(
        x=jnp.zeros_like(state.x), y=jnp.full_like(state.y, 0.05),
        vx=jnp.zeros_like(state.vx), vy=jnp.full_like(state.vy, -0.8),
        theta=jnp.zeros_like(state.theta), omega=jnp.zeros_like(state.omega))
    key = jax.random.key(4)
    for _ in range(8):   # a few steps to reach the pad from y=0.05
        key, sub = jax.random.split(key)
        state, obs, r, term, trunc = vec_step(
            env, state, jnp.full((4, 2), -1.0), sub)
        if bool(np.asarray(term).all()):
            break
    assert bool(np.asarray(term).all())
    assert np.asarray(r).max() < -50.0


def test_point_chasing_scripted_ceiling():
    """Pin the chasing task's return scale: a scripted state-access beeline
    controller (the practical optimum — the env charges 0.02/step
    unconditionally and the target drifts away at up to 0.02/step) scores
    ~1.10 on 200-step episodes and ~2.0 with room to catch (1024 steps).
    The pixel row's 0.9 target in scripts/verify_learning.py derives from
    this ceiling."""
    import jax.numpy as jnp
    from elegantrl_tpu.envs.point_chasing import make_point_chasing
    from elegantrl_tpu.train.evaluator import make_eval_fn

    env = make_point_chasing(2)

    def beeline(_, obs):
        delta = obs[:, 0:2] - obs[:, 4:6]          # p0 - p1
        return delta / (jnp.linalg.norm(delta, axis=1, keepdims=True) + 1e-8)

    fn200 = make_eval_fn(env, beeline, num_episodes=16, max_step=200)
    ret200, steps200 = (np.asarray(x) for x in fn200(None, jax.random.key(0)))
    assert 0.9 < ret200.mean() < 1.4, ret200.mean()

    fn1k = make_eval_fn(env, beeline, num_episodes=16, max_step=1024)
    ret1k, steps1k = (np.asarray(x) for x in fn1k(None, jax.random.key(0)))
    assert steps1k.mean() < 600, steps1k.mean()    # actually catches
    assert ret1k.mean() > 1.6, ret1k.mean()
