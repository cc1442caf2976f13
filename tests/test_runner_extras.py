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


def test_inscan_values_match_update_time_reeval():
    """The per-step critic values computed inside the collect scan
    (AgentDef.rollout_extras) must equal the update-time full-rollout
    re-evaluation they replace — the critic is frozen during collection."""
    import jax.numpy as jnp
    from functools import partial
    from elegantrl_tpu.agents.base import chunked_map, collect_rollout
    from elegantrl_tpu.agents.ppo import make_ppo
    from elegantrl_tpu.envs.base import vec_reset
    from elegantrl_tpu.train.runner import _resolve_env_def

    args = Config(AgentPPO, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 8, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    env = _resolve_env_def(args)
    agent = make_ppo((16, 16), 3, 1, args)
    s = agent.init(jax.random.key(0))
    env_state, obs = vec_reset(env, jax.random.key(1), 8)
    rollout, _, _ = collect_rollout(
        env, s, agent.explore_action, agent.env_action, env_state, obs,
        jax.random.key(2), horizon_len=16, reward_scale=1.0,
        extras_fn=agent.rollout_extras)
    assert rollout.extras is not None and 'values' in rollout.extras
    from elegantrl_tpu.agents.ppo import _norm_state
    from elegantrl_tpu.ops.nets import mlp_apply
    value_fn = lambda x: mlp_apply(
        s.cri, _norm_state(x, s.norm_avg, s.norm_std))[..., 0]
    reeval = chunked_map(value_fn, rollout.states)
    np.testing.assert_allclose(np.asarray(rollout.extras['values']),
                               np.asarray(reeval), rtol=1e-6, atol=1e-6)


def test_bf16_storage_trains_ppo(tmp_path):
    """storage_dtype='bfloat16' stores rollout states in bf16 (half the HBM
    traffic for the dominant tensor); training must still learn."""
    args = _args(tmp_path, storage_dtype='bfloat16')
    args.break_step = 4096
    r = train_agent(args)
    assert np.isfinite(r['max_r'])


def test_bf16_storage_trains_offpolicy(tmp_path):
    """bf16 replay ring (states + float actions) trains SAC and the ring
    tensors really are bf16."""
    import jax.numpy as jnp
    from elegantrl_tpu.agents import AgentSAC
    args = Config(AgentSAC, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 16
    args.batch_size = 16
    args.buffer_size = 512
    args.eval_per_step = 128
    args.eval_times = 2
    args.break_step = 512
    args.storage_dtype = 'bfloat16'
    args.cwd = str(tmp_path / 'sac_bf16')
    ctx = build_training(args)
    assert ctx.carry.buf_state.states.dtype == jnp.bfloat16
    assert ctx.carry.buf_state.actions.dtype == jnp.bfloat16
    r = train_agent(args)
    assert np.isfinite(r['max_r'])


def test_auto_compute_dtype_resolution():
    from elegantrl_tpu.agents.base import resolve_compute_dtype, BF16_AUTO_MIN_WIDTH
    import jax.numpy as jnp

    class A:
        compute_dtype = 'auto'
    assert resolve_compute_dtype(A(), (128, 128)) is None
    assert resolve_compute_dtype(A(), (BF16_AUTO_MIN_WIDTH,) * 2) == jnp.bfloat16
    A.compute_dtype = 'float32'
    assert resolve_compute_dtype(A(), (2048, 2048)) is None
    A.compute_dtype = 'bfloat16'
    assert resolve_compute_dtype(A(), (16,)) == jnp.bfloat16
