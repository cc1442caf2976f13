"""Runner extras: bf16 compute path, valid_agent round-trip, stop file."""
import os

import numpy as np
import jax

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.train.runner import build_training, train_agent, valid_agent


def _args(tmp_path, **kw):
    args = Config(AgentPPO, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 32
    args.batch_size = 16
    args.repeat_times = 2
    args.eval_per_step = 128
    args.eval_times = 2
    args.break_step = 512
    args.cwd = str(tmp_path / 'run')
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_bfloat16_compute_trains(tmp_path):
    args = _args(tmp_path, compute_dtype='bfloat16')
    r = train_agent(args)
    assert np.isfinite(r['max_r'])


def test_valid_agent_roundtrip(tmp_path):
    args = _args(tmp_path)
    r = train_agent(args)
    ckpt = os.path.join(args.cwd, 'agent.npz')
    assert os.path.isfile(ckpt)
    results = valid_agent(PendulumEnv,
                          {'env_name': 'Pendulum-v1', 'num_envs': 1,
                           'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                           'if_discrete': False},
                          (16, 16), AgentPPO, ckpt, render_times=3)
    assert len(results) == 3
    for ret, steps in results:
        assert np.isfinite(ret) and steps == 200


def test_stop_file_halts_training(tmp_path):
    args = _args(tmp_path, break_step=int(1e9), eval_per_step=128)
    os.makedirs(args.cwd, exist_ok=True)
    args.if_remove = False
    with open(os.path.join(args.cwd, 'stop'), 'w') as f:
        f.write('1')
    r = train_agent(args)
    assert r['total_step'] <= 256  # stopped after the first macro-iteration
