"""Policy serving: checkpoint -> batched greedy inference over HTTP."""
import json
import urllib.request

import numpy as np
import jax

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO, AgentSAC
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.serve import PolicyServer
from elegantrl_tpu.train.runner import build_training, train_agent
from elegantrl_tpu.utils.checkpoint import save_pytree

ENV_ARGS = {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
            'state_dim': 3, 'action_dim': 1, 'if_discrete': False}


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_policy_server_serves_checkpoint(tmp_path):
    # save an (untrained) agent checkpoint the way training does
    args = Config(AgentPPO, PendulumEnv, dict(ENV_ARGS))
    args.net_dims = (16, 16)
    ctx = build_training(args)
    ckpt = str(tmp_path / 'agent.npz')
    save_pytree(ckpt, ctx.carry.agent_state)

    srv = PolicyServer(AgentPPO, net_dims=(16, 16), env_args=dict(ENV_ARGS),
                       checkpoint=ckpt)
    try:
        port = srv.start(port=0)  # ephemeral
        base = f'http://127.0.0.1:{port}'
        health = json.loads(urllib.request.urlopen(
            base + '/health', timeout=30).read())
        assert health['ok'] and health['state_dim'] == 3

        obs = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        out = _post(base + '/act', {'obs': obs.tolist()})
        action = np.asarray(out['action'], np.float32)
        assert action.shape == (5, 1)
        # served actions == direct greedy on the restored state
        direct = np.asarray(ctx.agent.greedy_action(srv.agent_state, obs))
        np.testing.assert_allclose(action, direct, rtol=1e-5, atol=1e-6)
        # single-obs convenience
        one = _post(base + '/act', {'obs': obs[0].tolist()})
        assert np.asarray(one['action']).shape == (1,)
    finally:
        srv.stop()


def test_policy_server_off_policy_agent(tmp_path):
    args = Config(AgentSAC, PendulumEnv, dict(ENV_ARGS))
    args.net_dims = (16, 16)
    args.buffer_size = 64
    ctx = build_training(args)
    ckpt = str(tmp_path / 'agent.npz')
    save_pytree(ckpt, ctx.carry.agent_state)
    srv = PolicyServer(AgentSAC, net_dims=(16, 16), env_args=dict(ENV_ARGS),
                       checkpoint=ckpt)
    a = srv.act(np.zeros((3, 3), np.float32))
    assert a.shape == (3, 1) and np.all(np.abs(a) <= 1.0)


def test_policy_server_end_to_end_trained(tmp_path):
    """Train briefly, serve the saved agent, and verify the served policy
    actually controls the env (paper-trading-style deploy loop)."""
    args = Config(AgentPPO, PendulumEnv, dict(ENV_ARGS))
    args.net_dims = (16, 16)
    args.horizon_len = 100
    args.batch_size = 64
    args.repeat_times = 8
    args.eval_times = 2
    args.eval_per_step = int(1e4)
    args.break_step = int(2e4)
    args.cwd = str(tmp_path / 'train')
    train_agent(args)

    srv = PolicyServer(AgentPPO, net_dims=(16, 16), env_args=dict(ENV_ARGS),
                       checkpoint=str(tmp_path / 'train' / 'agent.npz'))
    # drive one greedy episode through the served policy
    from elegantrl_tpu.envs.base import vec_reset, vec_step
    env = build_training(args).env
    state, obs = vec_reset(env, jax.random.key(0), 4)
    total = np.zeros(4)
    for t in range(50):
        a = srv.act(np.asarray(obs))
        state, obs, r, term, trunc = vec_step(
            env, state, jax.numpy.asarray(a), jax.random.key(t))
        total += np.asarray(r)
    assert np.isfinite(total).all()
