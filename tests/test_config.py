"""Config / build_env behavior (mirrors reference unit_tests/train/test_config.py)."""
import numpy as np
import pytest

from elegantrl_tpu.config import Config, build_env, get_gym_env_args, kwargs_filter
from elegantrl_tpu.envs import PendulumEnv, CartPoleEnv
from elegantrl_tpu.agents import AgentPPO, AgentSAC, AgentDQN, AgentA2C


def test_if_off_policy_name_matching():
    # reference config.py:108-111: on-policy iff name contains one of the markers
    assert Config(AgentSAC).if_off_policy is True
    assert Config(AgentDQN).if_off_policy is True
    assert Config(AgentPPO).if_off_policy is False
    assert Config(AgentA2C).if_off_policy is False
    assert Config(None).if_off_policy is True


def test_defaults_differ_by_policy_type():
    on = Config(AgentPPO)
    off = Config(AgentSAC)
    assert on.horizon_len == 2048 and on.batch_size == 128 and on.repeat_times == 8.0
    assert off.horizon_len == 512 and off.batch_size == 64 and off.buffer_size == int(1e6)
    assert off.if_use_per is False
    assert on.if_use_vtrace is True


def test_kwargs_filter():
    def fn(a, b=1):
        return a + b
    out = kwargs_filter(fn, {'a': 1, 'b': 2, 'c': 3})
    assert out == {'a': 1, 'b': 2}


def test_build_env_stamps_protocol_attrs():
    env_args = {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                'state_dim': 3, 'action_dim': 1, 'if_discrete': False}
    env = build_env(PendulumEnv, env_args)
    for attr in ('env_name', 'num_envs', 'max_step', 'state_dim',
                 'action_dim', 'if_discrete'):
        assert getattr(env, attr) == env_args[attr]
    obs, info = env.reset()
    assert obs.shape == (4, 3)


def test_get_gym_env_args_from_our_env():
    env = CartPoleEnv(num_envs=2)
    args = get_gym_env_args(env, if_print=False)
    assert args['env_name'] == 'CartPole-v1'
    assert args['state_dim'] == 4 and args['action_dim'] == 2
    assert args['if_discrete'] is True


def test_init_before_training_creates_cwd(tmp_path):
    args = Config(AgentPPO, PendulumEnv,
                  {'env_name': 'P', 'num_envs': 1, 'max_step': 10,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.cwd = str(tmp_path / 'run')
    args.init_before_training()
    import os
    assert os.path.isdir(args.cwd)
    assert args.random_seed == 0
