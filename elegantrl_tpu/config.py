"""Training configuration.

Mirrors the reference's ``Config`` surface (reference
``elegantrl/train/config.py:11-111``): same hyper-parameter names, same
on/off-policy defaults, same name-matching rule for deriving
``if_off_policy`` from the agent class.  JAX-first underneath: explicit PRNG
seeds, mesh axis sizes instead of GPU id lists, and all values are static
Python scalars so the training step compiles once.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Callable, Dict, Optional

import numpy as np

# Agent-name fragments that mark an on-policy algorithm (reference
# ``config.py:108-111`` uses the same tuple).
_ON_POLICY_NAMES = ("SARSA", "VPG", "A2C", "A3C", "TRPO", "PPO", "MPO")


class Config:
    """Holds environment args, algorithm hypers, device/mesh layout and
    evaluation cadence.  Mutable like the reference's config object so user
    scripts can attach extra per-algorithm hypers as attributes
    (reference reads them via ``getattr(args, name, default)``).
    """

    def __init__(self, agent_class: Any = None, env_class: Any = None,
                 env_args: Optional[Dict[str, Any]] = None):
        self.agent_class = agent_class
        self.if_off_policy = self.get_if_off_policy()

        '''environment'''
        self.env_class = env_class
        self.env_args = env_args
        if env_args is None:
            env_args = {'env_name': None, 'num_envs': 1, 'max_step': 12345,
                        'state_dim': None, 'action_dim': None, 'if_discrete': None}
        env_args.setdefault('num_envs', 1)
        env_args.setdefault('max_step', 12345)
        self.env_name = env_args['env_name']
        self.num_envs = env_args['num_envs']
        self.max_step = env_args['max_step']
        self.state_dim = env_args['state_dim']
        self.action_dim = env_args['action_dim']
        self.if_discrete = env_args['if_discrete']

        '''reward shaping'''
        self.gamma = 0.99
        self.reward_scale = 2 ** 0

        '''training'''
        self.net_dims = (128, 128)
        self.learning_rate = 6e-5
        self.clip_grad_norm = 3.0
        self.state_value_tau = 0.0   # running state/value normalization tau
        self.soft_update_tau = 5e-3  # polyak tau for target networks
        self.continue_train = False
        if self.if_off_policy:
            self.batch_size = 64
            self.horizon_len = 512
            self.buffer_size = int(1e6)
            self.repeat_times = 1.0
            self.if_use_per = False
            self.lambda_fit_cum_r = 0.0
            self.buffer_init_size = self.batch_size * 8
        else:
            self.batch_size = 128
            self.horizon_len = 2048
            self.buffer_size = None
            self.repeat_times = 8.0
            self.if_use_vtrace = True
            self.buffer_init_size = None

        '''device & mesh (TPU-native replacement for gpu_id/learner_gpu_ids)'''
        self.gpu_id = 0              # kept for API parity; ignored on TPU
        self.num_workers = 1         # kept for API parity; rollout is fused on-device
        self.random_seed = None      # None -> derived from gpu_id like the reference
        self.mesh_axes = None        # e.g. {'dp': 8} to shard the env axis; None = single device
        # matmul dtype: 'auto' picks bf16 when every hidden width is MXU-wide
        # (measured crossover, agents/base.py:resolve_compute_dtype) and f32
        # otherwise; force with 'float32' / 'bfloat16'
        self.compute_dtype = 'auto'
        # rollout/replay-ring bulk-tensor dtype ('float32' | 'bfloat16'):
        # bf16 halves HBM traffic + ring residency for states (and, for
        # off-policy agents, float actions); scalars always stay f32
        self.storage_dtype = 'float32'
        # rollout-scan unroll factor: amortises per-op launch latency over
        # the scan's tiny ops (the fused round is op-latency-bound at small
        # widths — scripts/profile_sol.py); numerics unchanged
        self.rollout_unroll = 4
        # persistent XLA compilation cache: None -> default dir (or
        # $ELEGANTRL_TPU_CACHE_DIR); '' disables.  See utils/compile_cache.py
        self.compilation_cache_dir = None

        '''evaluation'''
        self.cwd = None
        self.if_remove = True
        self.break_step = np.inf   # stop when total env steps exceed this
        self.break_score = np.inf  # stop early once eval avgR reaches this
        self.if_keep_save = True
        self.if_over_write = False
        self.if_save_buffer = False

        self.save_gap = 8
        self.eval_times = 3
        self.eval_per_step = int(2e4)
        self.eval_env_class = None
        self.eval_env_args = None
        self.eval_record_step = 0

    def init_before_training(self):
        if self.random_seed is None:
            self.random_seed = max(0, int(self.gpu_id))
        if self.continue_train:
            # resuming must never delete the checkpoints it resumes from
            self.if_remove = False
        if self.cwd is None:
            agent_name = getattr(self.agent_class, '__name__', 'Agent')
            agent_name = agent_name[5:] if agent_name.startswith('Agent') else agent_name
            self.cwd = f'./{self.env_name}_{agent_name}_{self.random_seed}'
        if self.if_remove is None:
            self.if_remove = bool(input(f"| Config PRESS 'y' to REMOVE: {self.cwd}? ") == 'y')
        if self.if_remove:
            shutil.rmtree(self.cwd, ignore_errors=True)
            print(f"| Config Remove cwd: {self.cwd}", flush=True)
        else:
            print(f"| Config Keep cwd: {self.cwd}", flush=True)
        os.makedirs(self.cwd, exist_ok=True)

    def get_if_off_policy(self) -> bool:
        agent_name = getattr(self.agent_class, '__name__', '') or ''
        return all(agent_name.find(s) == -1 for s in _ON_POLICY_NAMES)

    def print_config(self):
        from pprint import pprint
        pprint(vars(self))


def kwargs_filter(function: Callable, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only kwargs accepted by ``function`` (reference ``config.py:139-144``)."""
    import inspect
    sign = {p.name for p in inspect.signature(function).parameters.values()}
    return {k: kwargs[k] for k in sign.intersection(kwargs.keys())}


def build_env(env_class=None, env_args: Optional[Dict[str, Any]] = None, gpu_id: int = -1):
    """Instantiate an env from class + kwargs and stamp the six protocol
    attributes onto it (reference ``config.py:118-136``).  On TPU there is no
    process VecEnv: vectorization is the env's own batch axis.
    """
    env_args = dict(env_args or {})
    env_args.setdefault('num_envs', 1)
    env_args.setdefault('max_step', 12345)
    env = env_class(**kwargs_filter(env_class.__init__, env_args.copy()))
    for attr in ('env_name', 'num_envs', 'max_step', 'state_dim', 'action_dim', 'if_discrete'):
        if env_args.get(attr) is not None:
            setattr(env, attr, env_args[attr])
    return env


def get_gym_env_args(env, if_print: bool = True) -> Dict[str, Any]:
    """Extract the env-protocol dict from an env instance
    (reference ``config.py:147-206``).  Works with our pure-JAX envs and any
    gymnasium env.
    """
    if {'env_name', 'state_dim', 'action_dim', 'if_discrete'}.issubset(dir(env)):
        env_args = {'env_name': env.env_name,
                    'num_envs': getattr(env, 'num_envs', 1),
                    'max_step': getattr(env, 'max_step', 12345),
                    'state_dim': env.state_dim,
                    'action_dim': env.action_dim,
                    'if_discrete': env.if_discrete}
    else:  # gymnasium-style
        import gymnasium as gym
        env_name = getattr(env.unwrapped, 'spec').id
        max_step = getattr(env, '_max_episode_steps', 12345)
        state_shape = env.observation_space.shape
        state_dim = state_shape[0] if len(state_shape) == 1 else state_shape
        if_discrete = isinstance(env.action_space, gym.spaces.Discrete)
        action_dim = (env.action_space.n if if_discrete
                      else env.action_space.shape[0])
        env_args = {'env_name': env_name, 'num_envs': 1, 'max_step': max_step,
                    'state_dim': state_dim, 'action_dim': action_dim,
                    'if_discrete': if_discrete}
    if if_print:
        print(f"env_args = {repr(env_args)}")
    return env_args
