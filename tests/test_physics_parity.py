"""Physics parity: recalibrated pure-JAX LunarLander vs real Box2D, and the
gym_parity host-env factories (VERDICT r1 missing #4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

gym = pytest.importorskip('gymnasium')


def test_per_step_calibration_matches_box2d():
    """The calibrated constants in envs/lunar_lander.py must match gym's
    Box2D responses within 2% (gravity, main, side torque)."""
    from scripts.physics_parity import gym_calibration, jax_calibration
    for g, j in zip(gym_calibration(), jax_calibration()):
        assert abs(j / g - 1.0) < 0.02, (g, j)


def test_pd_controller_lands_in_both_sims():
    """The same scripted controller must land reliably in BOTH sims with
    comparable returns — behavioral parity, the meaningful check for a
    re-derived (not bit-exact) physics env.  Uses the single episode-rollout
    implementation in scripts/physics_parity.py."""
    from scripts.physics_parity import gym_episodes, jax_episodes
    n = 8
    gym_mean, _, gym_lands, _ = gym_episodes(n)
    jax_mean, _, jax_lands, _ = jax_episodes(n)
    assert gym_lands >= n - 1, gym_mean
    assert jax_lands >= n - 1, jax_mean
    assert abs(gym_mean - jax_mean) < 80, (gym_mean, jax_mean)


def test_gym_env_def_factories():
    from elegantrl_tpu.envs import get_env_args, gym_env_def
    env = gym_env_def('LunarLanderContinuous')   # version-less id resolves
    assert env.spec.state_dim == 8 and env.spec.action_dim == 2
    assert not env.spec.if_discrete
    args = get_env_args(env, num_envs=4)
    assert args['num_envs'] == 4 and args['state_dim'] == 8


def test_hopper_host_env_steps():
    from elegantrl_tpu.envs import gym_hopper
    from elegantrl_tpu.envs.base import vec_reset, vec_step
    env = gym_hopper()
    assert env.spec.state_dim == 11 and env.spec.action_dim == 3
    state, obs = vec_reset(env, jax.random.key(0), 2)
    for t in range(10):
        a = jnp.asarray(np.random.default_rng(t).uniform(-1, 1, (2, 3)),
                        jnp.float32)
        state, obs, r, term, trunc = vec_step(env, state, a, jax.random.key(t))
    assert np.isfinite(np.asarray(obs)).all()


def test_discrete_lander_host_env_trains_one_round():
    """Real Box2D discrete LunarLander through the fused loop (the
    BASELINE config-2 env) — one PPO round end-to-end."""
    from elegantrl_tpu.agents import AgentDiscretePPO
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.envs import get_env_args, gym_lunar_lander
    from elegantrl_tpu.train.runner import build_training

    env = gym_lunar_lander()
    args = Config(AgentDiscretePPO, env, get_env_args(env, num_envs=4))
    args.net_dims = (16, 16)
    args.horizon_len = 16
    args.batch_size = 16
    args.repeat_times = 2
    ctx = build_training(args)
    out, metrics = jax.jit(lambda c: ctx.round_fn(c, None))(ctx.carry)
    assert np.isfinite(float(metrics['exp_r']))
