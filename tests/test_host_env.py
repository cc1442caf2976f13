"""Host-env escape hatch: gymnasium envs inside the fused loop."""
import numpy as np
import jax
import pytest

gym = pytest.importorskip('gymnasium')

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO
from elegantrl_tpu.envs.base import EnvSpec, vec_reset, vec_step
from elegantrl_tpu.envs.host_env import make_host_env
from elegantrl_tpu.train.runner import build_training


def _pendulum_def():
    spec = EnvSpec(env_name='Pendulum-v1', num_envs=4, max_step=200,
                   state_dim=3, action_dim=1, if_discrete=False)
    return make_host_env(lambda: gym.make('Pendulum-v1'), spec)


def test_host_env_step_contract():
    env = _pendulum_def()
    state, obs = vec_reset(env, jax.random.key(0), 4)
    assert obs.shape == (4, 3)
    state, obs, r, term, trunc = vec_step(
        env, state, np.zeros((4, 1), np.float32), jax.random.key(1))
    assert obs.shape == (4, 3) and r.shape == (4,)
    assert np.isfinite(np.asarray(obs)).all()


def test_host_env_trains_with_framework():
    env = _pendulum_def()
    args = Config(AgentPPO, env,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 16
    args.batch_size = 16
    args.repeat_times = 2
    ctx = build_training(args)
    out, metrics = jax.jit(lambda c: ctx.round_fn(c, None))(ctx.carry)
    assert np.isfinite(float(metrics['exp_r']))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_host_pool_threaded_matches_sequential():
    """Thread-pool stepping touches disjoint indices per env, so it must be
    bit-identical to the sequential path."""
    from elegantrl_tpu.envs.host_env import _HostPool
    seq = _HostPool(lambda: gym.make('Pendulum-v1'), seed=3)
    thr = _HostPool(lambda: gym.make('Pendulum-v1'), seed=3, num_threads=4)
    obs_a = seq.reset_all(np.int32(6))
    obs_b = thr.reset_all(np.int32(6))
    np.testing.assert_array_equal(obs_a, obs_b)
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.uniform(-2, 2, (6, 1)).astype(np.float32)
        oa, ra, ta, ua = seq.step(a)
        ob, rb, tb, ub = thr.step(a)
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(ua, ub)


def test_host_collect_rollout_matches_contract():
    """Host-side rollout collection: shapes/dtypes match Rollout, rewards are
    scaled, and the CPU-backend inference consumes the agent's params."""
    from elegantrl_tpu.envs.host_env import (host_collect_rollout,
                                             make_explore_env_fn)
    env = _pendulum_def()
    args = Config(AgentPPO, env,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16,)
    args.horizon_len = 8
    ctx = build_training(args)
    cpu = jax.devices('cpu')[0]
    explore_env_jit = make_explore_env_fn(ctx.agent)
    params_cpu = jax.device_put(ctx.carry.agent_state, cpu)
    obs0 = np.asarray(ctx.carry.obs)
    with jax.default_device(cpu):
        k = jax.random.key(7)
    arrs, last_obs = host_collect_rollout(
        env.host_pool, explore_env_jit, params_cpu, obs0, k,
        horizon_len=8, reward_scale=0.5, cpu_device=cpu)
    states, actions, logprobs, rewards, undones, unmasks = (
        arrs.states, arrs.actions, arrs.logprobs, arrs.rewards,
        arrs.undones, arrs.unmasks)
    assert arrs.extras is None   # host rollouts carry no in-scan extras
    assert states.shape == (8, 4, 3) and actions.shape == (8, 4, 1)
    assert logprobs.shape == (8, 4) and rewards.shape == (8, 4)
    assert last_obs.shape == (4, 3)
    # Pendulum rewards are <= 0; scaling by 0.5 keeps them in (-8.1, 0]
    assert rewards.min() >= -16.3 * 0.5 and rewards.max() <= 0.0
    assert np.all(undones == 1.0)  # Pendulum never terminates


def test_host_rollout_training_runs_and_records(tmp_path):
    """Full train_agent in host-rollout mode (default for host envs):
    trains, evaluates through the host eval path, and writes the recorder."""
    from elegantrl_tpu.train.runner import train_agent
    env = _pendulum_def()
    args = Config(AgentPPO, env,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 16
    args.batch_size = 32
    args.repeat_times = 2
    args.eval_per_step = 64
    args.eval_times = 2
    args.break_step = 256
    args.cwd = str(tmp_path / 'host_rollout')
    r = train_agent(args)
    assert r['total_step'] >= 256
    assert len(r['recorder']) >= 1
    assert np.isfinite(r['recorder'][:, 1]).all()

def test_host_rollout_flag_disables_host_eval(tmp_path):
    """args.host_rollout=False must disable BOTH the host-rollout training
    loop and the evaluator's host-pool path (docs/api.md contract)."""
    from elegantrl_tpu.train.evaluator import make_eval_fn
    from elegantrl_tpu.train.runner import train_agent
    env = _pendulum_def()
    # make_eval_fn host branch is gated by host_eval
    fn = make_eval_fn(env, lambda s, o: np.zeros((o.shape[0], 1), np.float32),
                      num_episodes=2, max_step=4, host_eval=False)
    assert fn.__name__ != 'eval_fn_host'
    # full training honors the flag end to end (io_callback path on CPU JAX)
    args = Config(AgentPPO, env,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16,)
    args.horizon_len = 16
    args.batch_size = 32
    args.repeat_times = 1
    args.eval_per_step = 64
    args.eval_times = 2
    args.break_step = 128
    args.host_rollout = False
    args.cwd = str(tmp_path / 'no_host_rollout')
    from elegantrl_tpu.train.runner import build_training
    ctx = build_training(args)
    assert not ctx.use_host_rollout
    r = train_agent(args)
    assert r['total_step'] >= 128 and np.isfinite(r['recorder'][:, 1]).all()


def test_host_eval_uses_flat_params_fetch(tmp_path):
    """The evaluator's host path goes through the shared one-flat-buffer
    actor fetch (make_params_fetcher), not a per-leaf pytree transfer."""
    from elegantrl_tpu.envs.host_env import make_params_fetcher
    env = _pendulum_def()
    args = Config(AgentPPO, env,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16,)
    args.horizon_len = 8
    ctx = build_training(args)
    cpu = jax.devices('cpu')[0]
    fetch = make_params_fetcher(ctx.agent.explore_view,
                                ctx.agent.explore_merge,
                                ctx.carry.agent_state, cpu)
    params_cpu = fetch(ctx.carry.agent_state)
    # greedy inference works off the fetched view
    with jax.default_device(cpu):
        a = ctx.agent.greedy_action(params_cpu, ctx.carry.obs)
    assert np.asarray(a).shape == (4, 1)
    # and the fetched actor leaves match the device state exactly
    view_dev = jax.tree.leaves(ctx.agent.explore_view(ctx.carry.agent_state))
    view_cpu = jax.tree.leaves(ctx.agent.explore_view(params_cpu))
    for d, c in zip(view_dev, view_cpu):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(c))


def test_host_rollout_resume_repoints_obs(tmp_path):
    """continue_train with a host pool must NOT feed checkpointed obs to a
    freshly-reset pool: the restored carry re-points obs at the pool's
    actual episode starts."""
    from elegantrl_tpu.train.runner import train_agent
    env = _pendulum_def()

    def _args():
        a = Config(AgentPPO, env,
                   {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                    'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
        a.net_dims = (16,)
        a.horizon_len = 16
        a.batch_size = 32
        a.repeat_times = 1
        a.eval_per_step = 64
        a.eval_times = 2
        a.break_step = 128
        a.cwd = str(tmp_path / 'resume_host')
        return a

    train_agent(_args())
    args2 = _args()
    args2.continue_train = True
    ctx2 = build_training(args2)
    # obs must equal the pool's current obs (fresh resets), bitwise
    np.testing.assert_array_equal(np.asarray(ctx2.carry.obs),
                                  env.host_pool.obs)


def test_host_pool_procs_matches_sequential():
    """Forked process-pool stepping (the reference's SubEnv/VecEnv pattern,
    config.py:223-311) must be bit-identical to the sequential path."""
    from elegantrl_tpu.envs.host_env import _HostPool
    seq = _HostPool(lambda: gym.make('Pendulum-v1'), seed=5)
    prc = _HostPool(lambda: gym.make('Pendulum-v1'), seed=5, num_procs=3)
    try:
        obs_a = seq.reset_all(np.int32(6))
        obs_b = prc.reset_all(np.int32(6))
        np.testing.assert_array_equal(obs_a, obs_b)
        rng = np.random.default_rng(0)
        for _ in range(50):
            a = rng.uniform(-2, 2, (6, 1)).astype(np.float32)
            for x, y in zip(seq.step(a), prc.step(a)):
                np.testing.assert_array_equal(x, y)
    finally:
        prc._close_procs()
