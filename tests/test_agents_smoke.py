"""Per-family agent smoke tests: build agent, explore, update, check rollout
shapes/dtypes and finite metrics — mirrors the reference's
unit_tests/agents/test_agents.py buffer-item checks (:12-65)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elegantrl_tpu.config import Config
from elegantrl_tpu.envs import make_cartpole, make_pendulum, vec_reset
from elegantrl_tpu.agents import (
    AgentPPO, AgentA2C, AgentDiscretePPO, AgentDiscreteA2C,
    AgentDQN, AgentDoubleDQN, AgentDuelingDQN, AgentD3QN,
    AgentEmbedDQN, AgentEnsembleDQN,
    AgentDDPG, AgentTD3, AgentSAC, AgentModSAC,
)
from elegantrl_tpu.agents.base import collect_rollout
from elegantrl_tpu.train.replay_buffer import ReplayBuffer

HORIZON = 16
NUM_ENVS = 4

CONTINUOUS = [AgentPPO, AgentA2C, AgentDDPG, AgentTD3, AgentSAC, AgentModSAC]
DISCRETE = [AgentDiscretePPO, AgentDiscreteA2C, AgentDQN, AgentDoubleDQN,
            AgentDuelingDQN, AgentD3QN, AgentEmbedDQN, AgentEnsembleDQN]


def _build(agent_class, discrete):
    env = make_cartpole() if discrete else make_pendulum()
    spec = env.spec
    args = Config(agent_class=agent_class)
    args.num_envs = NUM_ENVS
    args.batch_size = 8
    args.repeat_times = 1.0
    args.horizon_len = HORIZON
    args.net_dims = (16, 16)
    if args.if_off_policy:
        args.buffer_init_size = 8
        buffer = ReplayBuffer(max_size=256, state_dim=spec.state_dim,
                              action_dim=spec.action_dim, num_seqs=NUM_ENVS,
                              if_discrete=discrete, args=args)
    else:
        buffer = None
    agent = agent_class.make(args.net_dims, spec.state_dim, spec.action_dim,
                             args, buffer=buffer)
    return env, agent, buffer


def _check_rollout(rollout, spec, discrete, on_policy):
    assert rollout.states.shape == (HORIZON, NUM_ENVS, spec.state_dim)
    if discrete:
        assert rollout.actions.shape == (HORIZON, NUM_ENVS)
        assert rollout.actions.dtype == jnp.int32
    else:
        assert rollout.actions.shape == (HORIZON, NUM_ENVS, spec.action_dim)
    if on_policy:
        assert rollout.logprobs.shape == (HORIZON, NUM_ENVS)
    for x in (rollout.rewards, rollout.undones, rollout.unmasks):
        assert x.shape == (HORIZON, NUM_ENVS)
    assert np.isfinite(np.asarray(rollout.states)).all()


@pytest.mark.parametrize("agent_class", CONTINUOUS + DISCRETE,
                         ids=lambda c: c.__name__)
def test_explore_and_update(agent_class):
    discrete = agent_class in DISCRETE
    env, agent, buffer = _build(agent_class, discrete)
    spec = env.spec
    assert agent.if_discrete == discrete

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    agent_state = agent.init(k1)
    env_state, obs = vec_reset(env, k2, NUM_ENVS)

    rollout, env_state, obs = collect_rollout(
        env, agent_state, agent.explore_action, agent.env_action,
        env_state, obs, k3, HORIZON, reward_scale=1.0)
    _check_rollout(rollout, spec, discrete, on_policy=not agent.if_off_policy)

    if agent.if_off_policy:
        buf_state = buffer.init()
        buf_state = buffer.update(buf_state, (
            rollout.states, rollout.actions, rollout.rewards,
            rollout.undones, rollout.unmasks))
        assert int(buf_state.size) == HORIZON
        agent_state2, buf_state, metrics = agent.update(agent_state, buf_state, k4)
    else:
        agent_state2, metrics = agent.update(agent_state, rollout, obs, k4)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # params must actually change
    diffs = jax.tree.map(
        lambda a, b: float(jnp.sum(jnp.abs(jnp.asarray(a, jnp.float32)
                                           - jnp.asarray(b, jnp.float32)))),
        agent_state, agent_state2)
    assert sum(jax.tree.leaves(diffs)) > 0.0

    # greedy action path
    ga = agent.greedy_action(agent_state2, obs)
    if discrete:
        assert ga.shape == (NUM_ENVS,)
        assert np.all(np.asarray(ga) >= 0) and np.all(np.asarray(ga) < spec.action_dim)
    else:
        assert ga.shape == (NUM_ENVS, spec.action_dim)
        assert np.all(np.abs(np.asarray(ga)) <= 1.0)


def test_bf16_storage_logprob_consistency():
    """With storage_dtype=bf16 the policy ACTS on the quantized obs, so
    re-evaluating the stored (bf16) states with the same per-step keys
    reproduces the stored logprobs to compilation-level noise (~1 ULP; the
    eager re-eval and the fused scan round differently) — i.e. PPO's
    first-epoch importance ratio is 1 on fresh data.  Before the fix the
    policy acted on FULL-precision obs, so this re-eval differed at bf16
    rounding scale (~1e-3), orders above the tolerance here."""
    from elegantrl_tpu.agents import AgentPPO
    env, agent, _ = _build(AgentPPO, False)
    key = jax.random.key(3)
    k1, k2, k3 = jax.random.split(key, 3)
    agent_state = agent.init(k1)
    env_state, obs = vec_reset(env, k2, NUM_ENVS)
    rollout, _, _ = collect_rollout(
        env, agent_state, agent.explore_action, agent.env_action,
        env_state, obs, k3, HORIZON, reward_scale=1.0,
        store_dtype=jnp.bfloat16)
    assert rollout.states.dtype == jnp.bfloat16
    # mirror collect_rollout's key schedule: split(key, H) then (k_act, _)
    keys = jax.random.split(k3, HORIZON)
    for t in range(0, HORIZON, 3):
        k_act, _ = jax.random.split(keys[t])
        action, logprob = agent.explore_action(
            agent_state, rollout.states[t].astype(jnp.float32), k_act)
        np.testing.assert_allclose(np.asarray(action),
                                   np.asarray(rollout.actions[t]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(logprob),
                                   np.asarray(rollout.logprobs[t]),
                                   atol=1e-4)
