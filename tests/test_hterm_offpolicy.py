"""Off-policy H-term (DDPG/TD3/SAC variants) + shared hterm machinery.

The reference documents H-term for PPO, SAC, TD3 and DDPG
(docs/source/tutorial/hterm.rst) and its ``examples/plan_DDPG_H.py:6``
imports ``AgentDDPGHterm`` — all implementations absent from its snapshot.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import (AgentDDPGHterm, AgentTD3Hterm,
                                  AgentSACHterm, AgentModSACHterm)
from elegantrl_tpu.agents.hterm import (discounted_window_returns,
                                        init_hterm_buffer,
                                        insert_best_windows)
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.train.runner import build_training


def test_discounted_window_returns_closed_form():
    """q[t] = sum_i gamma^i r[t+i] with continuation masking."""
    rewards = jnp.array([[1.0], [2.0], [4.0], [8.0]])
    undones = jnp.ones((4, 1))
    unmasks = jnp.ones((4, 1))
    q = discounted_window_returns(rewards, undones, unmasks, 0.5, k_full=2)
    np.testing.assert_allclose(np.asarray(q[:, 0]),
                               [1 + 0.5 * 2, 2 + 0.5 * 4, 4 + 0.5 * 8])
    # an episode boundary at t=1 stops window 0 after its first step
    undones = jnp.array([[1.0], [0.0], [1.0], [1.0]])
    q = discounted_window_returns(rewards, undones, unmasks, 0.5, k_full=2)
    np.testing.assert_allclose(np.asarray(q[:, 0]), [1 + 0.5 * 2, 2.0, 8.0])


def test_insert_best_windows_picks_argmax_and_masks():
    h_buf = init_hterm_buffer(8, 3, state_dim=2, action_dim=1)
    H, N = 6, 2
    states = jnp.arange(H * N * 2, dtype=jnp.float32).reshape(H, N, 2)
    actions = jnp.arange(H * N, dtype=jnp.float32).reshape(H, N, 1)
    undones = jnp.ones((H, N)).at[3, 1].set(0.0)  # env 1 terminates at t=3
    unmasks = jnp.ones((H, N))
    q = jnp.array([[0.0, 9.0], [5.0, 1.0], [1.0, 1.0], [2.0, 1.0]])  # (Hq, N)
    out = insert_best_windows(h_buf, states, actions, undones, unmasks, q, 3)
    assert int(out.count) == 2
    # env 0's best start is t=1; env 1's is t=0
    np.testing.assert_array_equal(np.asarray(out.states[0]),
                                  np.asarray(states[1:4, 0]))
    np.testing.assert_array_equal(np.asarray(out.states[1]),
                                  np.asarray(states[0:3, 1]))
    np.testing.assert_allclose(np.asarray(out.returns[:2]), [5.0, 9.0])
    # env 1's window crosses its terminal at t=3: step after it is invalid
    np.testing.assert_array_equal(np.asarray(out.masks[0]), [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(out.masks[1]), [1, 1, 1])
    # window starting at t=2 for env 1 would be masked after the boundary
    q2 = jnp.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    out2 = insert_best_windows(out, states, actions, undones, unmasks, q2, 3)
    np.testing.assert_array_equal(np.asarray(out2.masks[3]), [1, 1, 0])


@pytest.mark.parametrize('agent_class', [AgentDDPGHterm, AgentTD3Hterm,
                                         AgentSACHterm, AgentModSACHterm])
def test_hterm_offpolicy_round_runs(agent_class):
    """One fused round (pre_update window harvest + TD update with the
    rehearsal term) executes and fills the ring."""
    args = Config(agent_class, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 4, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 24
    args.batch_size = 16
    args.repeat_times = 1.0
    args.buffer_size = 512
    args.h_term_k_step = 8
    args.h_term_buffer_size = 32
    ctx = build_training(args)
    assert ctx.agent.pre_update is not None
    out, metrics = jax.jit(lambda c: ctx.round_fn(c, None))(ctx.carry)
    assert np.isfinite(float(metrics['obj_critic']))
    assert int(out.agent_state.h_buf.count) == 4  # one window per env
    out2, _ = jax.jit(lambda c: ctx.round_fn(c, None))(out)
    assert int(out2.agent_state.h_buf.count) == 8
    assert np.asarray(out2.agent_state.h_buf.masks[:8]).min() >= 0.0


def test_ddpg_hterm_learns_pendulum():
    """DDPG+H learns on Pendulum (CPU smoke threshold, like the plain-DDPG
    e2e test)."""
    from elegantrl_tpu.train.runner import train_agent
    args = Config(AgentDDPGHterm, PendulumEnv,
                  {'env_name': 'Pendulum-v1', 'num_envs': 8, 'max_step': 200,
                   'state_dim': 3, 'action_dim': 1, 'if_discrete': False})
    args.net_dims = (32, 32)
    args.gamma = 0.97
    args.horizon_len = 100
    args.buffer_size = int(5e4)
    args.batch_size = 128
    args.repeat_times = 1.0
    args.learning_rate = 5e-4
    args.eval_times = 4
    args.eval_per_step = int(2e4)
    args.break_step = int(2e5)
    args.break_score = -250.0
    args.cwd = '/tmp/test_ddpg_hterm'
    r = train_agent(args)
    # plain DDPG with this exact config reaches ~-180 by 2e5 steps (and
    # -726 at 5e4); the H-term must stay in that band, not destabilize
    assert r['max_r'] > -350.0, r['max_r']


def test_rehearsal_sample_empty_ring_yields_zero_weights():
    """Sampling before any harvest must give zero weights, not NaN
    (the valid-slot contract)."""
    from elegantrl_tpu.agents.hterm import rehearsal_sample
    h_buf = init_hterm_buffer(8, 4, state_dim=2, action_dim=1)
    _, _, _, w, valid = rehearsal_sample(h_buf, jax.random.key(0), 5)
    assert np.all(np.asarray(valid) == 0.0)
    assert np.all(np.asarray(w) == 0.0)  # not NaN


def test_insert_best_windows_topk_when_envs_exceed_capacity():
    """num_envs > ring capacity keeps the top-K windows deterministically."""
    h_buf = init_hterm_buffer(4, 2, state_dim=1, action_dim=1)
    H, N = 3, 6
    states = jnp.zeros((H, N, 1))
    actions = jnp.zeros((H, N, 1))
    undones = jnp.ones((H, N))
    unmasks = jnp.ones((H, N))
    q = jnp.array([[1.0, 9.0, 3.0, 7.0, 5.0, 8.0],
                   [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    out = insert_best_windows(h_buf, states, actions, undones, unmasks, q, 2)
    assert int(out.count) == 4
    np.testing.assert_allclose(sorted(np.asarray(out.returns).tolist(),
                                      reverse=True)[:4], [9.0, 8.0, 7.0, 5.0])
