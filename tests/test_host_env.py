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
