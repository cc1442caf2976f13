"""Parity tests for the fused OFF-POLICY rollout kernel
(``ops/pallas_rollout.py:make_fused_offpolicy_rollout``), run on CPU via
the TPU interpreter.

Same strategy as tests/test_pallas_rollout.py: the interpret path streams
host-drawn noise in as a regular input, so every stored quantity is
recomputed deterministically from the kernel's own stored states with the
scan-path pure functions (actor MLP, epsilon-greedy rule, env step).  The
env bodies themselves are parity-tested in test_pallas_rollout.py; here the
new surface is the exploration HEADS (ddpg / sac / modsac / dqn / dqn_enc /
dqn_duel) and the standard-layout rollout contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elegantrl_tpu.agents.ddpg_td3 import _make as make_ddpg_td3
from elegantrl_tpu.agents.sac import make_sac
from elegantrl_tpu.agents.dqn import make_dqn
from elegantrl_tpu.config import Config
from elegantrl_tpu.envs.pendulum import make_pendulum
from elegantrl_tpu.envs.cartpole import make_cartpole
from elegantrl_tpu.ops.nets import mlp_apply
from elegantrl_tpu.ops.pallas_rollout import (
    PENDULUM_BODY, CARTPOLE_BODY, make_fused_offpolicy_rollout)

NET_DIMS = (16, 16)
H, N = 12, 16


def _pendulum_setup(key=7):
    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(key), N)
    env_state = jax.vmap(env.init)(keys)
    env_state = env_state._replace(
        t=(jnp.arange(N) * 17 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    return env, env_state, obs


def _streamed_noise(key, a_dim):
    """Replicate the interpret-mode noise layout of rollout_fn (continuous):
    kz -> normals (H, A, N), ku -> uniforms."""
    kz, _ = jax.random.split(key)
    return jax.random.normal(kz, (H, a_dim, N), jnp.float32)


def test_ddpg_head_parity():
    """Stored action must equal clip(tanh(mlp(state)) + std * z, -1, 1)
    with the streamed normals — agents/ddpg_td3.py:actor_noisy."""
    args = Config()
    args.explore_noise_std = 0.1
    agent = make_ddpg_td3(NET_DIMS, 3, 1, args, buffer=None, td3=True)
    s = agent.init(jax.random.PRNGKey(0))
    env, env_state, obs = _pendulum_setup()
    fast = make_fused_offpolicy_rollout(
        PENDULUM_BODY, NET_DIMS, H, N, reward_scale=1.0, head='ddpg',
        head_cfg={'noise_std': 0.1}, block=8, interpret=True)
    rollout, env_state2, obs2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert rollout.states.shape == (H, N, 3)
    assert rollout.actions.shape == (H, N, 1)
    assert rollout.logprobs is None and rollout.extras is None
    np.testing.assert_allclose(rollout.states[0], obs, rtol=1e-6)
    z = _streamed_noise(jax.random.PRNGKey(3), 1)          # (H, 1, N)
    mean = jnp.tanh(mlp_apply(s.act, rollout.states.reshape(-1, 3)))
    expect = jnp.clip(mean.reshape(H, N, 1)
                      + 0.1 * jnp.moveaxis(z, 1, 2), -1.0, 1.0)
    np.testing.assert_allclose(rollout.actions, expect, rtol=2e-4, atol=2e-5)
    # rewards recomputed from stored (state, action) - pendulum cost with
    # the DIRECT action (env_action identity for DDPG, no tanh re-squash)
    costh, sinth = rollout.states[..., 0], rollout.states[..., 1]
    thdot = rollout.states[..., 2]
    th = jnp.arctan2(sinth, costh)
    u = jnp.clip(rollout.actions[..., 0] * 2.0, -2.0, 2.0)
    cost = th ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2
    np.testing.assert_allclose(rollout.rewards, -0.5 * cost,
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(rollout.undones) == 1.0)      # never terminates
    np.testing.assert_allclose(
        obs2, jnp.stack([jnp.cos(env_state2.theta),
                         jnp.sin(env_state2.theta),
                         env_state2.theta_dot], axis=-1), rtol=1e-6)


@pytest.mark.parametrize("modsac", [False, True])
def test_sac_head_parity(modsac):
    """Stored action must equal tanh(mean + exp(clip(log_std)) * z) with
    mean/log_std recomputed from the stored states — agents/sac.py."""
    args = Config()
    agent = make_sac(NET_DIMS, 3, 1, args, None, modsac=modsac)
    s = agent.init(jax.random.PRNGKey(1))
    env, env_state, obs = _pendulum_setup()
    head = 'modsac' if modsac else 'sac'
    clip = (-20.0, 2.0) if modsac else (-16.0, 2.0)
    fast = make_fused_offpolicy_rollout(
        PENDULUM_BODY, NET_DIMS, H, N, reward_scale=1.0, head=head,
        head_cfg={'std_clip': clip}, block=8, interpret=True)
    rollout, _, _ = fast(s, env_state, obs, jax.random.PRNGKey(3))
    x = rollout.states.reshape(-1, 3)
    if modsac:
        enc = mlp_apply(s.act['enc'], x)                    # raw output
        mean = mlp_apply(s.act['avg'], enc)
        log_std = jnp.clip(mlp_apply(s.act['std'], enc), *clip)
    else:
        enc = jax.nn.gelu(mlp_apply(s.act['enc'], x))       # trailing gelu
        out = mlp_apply(s.act['head'], enc)
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, *clip)
    z = jnp.moveaxis(_streamed_noise(jax.random.PRNGKey(3), 1), 1, 2)
    expect = jnp.tanh(mean.reshape(H, N, 1)
                      + jnp.exp(log_std).reshape(H, N, 1) * z)
    np.testing.assert_allclose(rollout.actions, expect, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("twin,duel,head", [
    (False, False, 'dqn'), (True, False, 'dqn_enc'), (True, True, 'dqn_duel'),
])
def test_dqn_head_parity(twin, duel, head):
    """Epsilon-greedy parity: where the streamed coin is >= rate the stored
    action must be argmax of the recomputed greedy q; where it explores it
    must be floor(u * A) — agents/dqn.py:q_greedy_values + epsilon_greedy."""
    args = Config()
    args.explore_rate = 0.25
    agent = make_dqn(NET_DIMS, 4, 2, args, twin=twin, duel=duel)
    s = agent.init(jax.random.PRNGKey(2))
    env = make_cartpole()
    keys = jax.random.split(jax.random.PRNGKey(9), N)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    fast = make_fused_offpolicy_rollout(
        CARTPOLE_BODY, NET_DIMS, H, N, reward_scale=1.0, head=head,
        head_cfg={'explore_rate': 0.25}, block=8, interpret=True)
    rollout, _, _ = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert rollout.actions.shape == (H, N)
    assert rollout.actions.dtype == jnp.int32
    x = rollout.states.reshape(-1, 4)
    if not (twin or duel):
        q = mlp_apply(s.q['mlp'], x)
    else:
        enc = mlp_apply(s.q['enc'], x)
        q = mlp_apply(s.q['val1'], enc)
        if duel:
            q = q - jnp.mean(q, axis=-1, keepdims=True) \
                + mlp_apply(s.q['adv1'], enc)
    greedy = jnp.argmax(q, axis=-1).reshape(H, N)
    # interpret mode streams uniforms: row 0 = coin, row 1 = random action
    u = jax.random.uniform(jax.random.PRNGKey(3), (H, 2 + 0 + 4, N),
                           jnp.float32)
    coin, rnd = u[:, 0], jnp.floor(u[:, 1] * 2.0).astype(jnp.int32)
    expect = jnp.where(coin < 0.25, rnd, greedy)
    np.testing.assert_array_equal(np.asarray(rollout.actions),
                                  np.asarray(expect))


@pytest.mark.parametrize("agent_cls_env", ["td3", "sac", "dqn"])
def test_runner_offpolicy_fast_path_trains(agent_cls_env, capsys):
    """End-to-end: the runner auto-selects the off-policy fused rollout
    under use_pallas_rollout='interpret' and trains finite rounds."""
    from elegantrl_tpu.train.runner import build_training
    from elegantrl_tpu.envs import PendulumEnv, CartPoleEnv
    from elegantrl_tpu.agents import AgentTD3, AgentSAC, AgentDQN

    if agent_cls_env == "dqn":
        args = Config(agent_class=AgentDQN, env_class=CartPoleEnv,
                      env_args={'env_name': 'CartPole-v1', 'num_envs': 16,
                                'max_step': 500, 'state_dim': 4,
                                'action_dim': 2, 'if_discrete': True})
    else:
        cls = AgentTD3 if agent_cls_env == "td3" else AgentSAC
        args = Config(agent_class=cls, env_class=PendulumEnv,
                      env_args={'env_name': 'Pendulum-v1', 'num_envs': 16,
                                'max_step': 200, 'state_dim': 3,
                                'action_dim': 1, 'if_discrete': False})
    args.horizon_len = 16
    args.net_dims = (16, 16)
    args.batch_size = 32
    args.buffer_size = 2048
    args.use_pallas_rollout = 'interpret'
    ctx = build_training(args)
    out = capsys.readouterr().out
    assert 'pallas fused-rollout fast path enabled' in out
    assert 'head=' in out
    carry, metrics = jax.jit(ctx.round_fn)(ctx.carry, None)
    carry, metrics = jax.jit(ctx.round_fn)(carry, None)
    assert np.isfinite(float(metrics['obj_critic']))
    assert int(carry.buf_state.size) == 32    # 2 rounds x horizon 16


def test_bf16_quantize_before_act():
    """Under bf16 storage the kernel must round the obs BEFORE acting so
    stored state == acting input (agents/base.py contract), and quantize
    stored float actions (no logprob is kept off-policy)."""
    args = Config()
    agent = make_ddpg_td3(NET_DIMS, 3, 1, args, buffer=None, td3=False)
    s = agent.init(jax.random.PRNGKey(0))
    env, env_state, obs = _pendulum_setup()
    fast = make_fused_offpolicy_rollout(
        PENDULUM_BODY, NET_DIMS, H, N, reward_scale=1.0, head='ddpg',
        head_cfg={'noise_std': 0.05}, store_dtype=jnp.bfloat16,
        block=8, interpret=True)
    rollout, _, _ = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert rollout.states.dtype == jnp.bfloat16
    assert rollout.actions.dtype == jnp.bfloat16
    # the action must have been computed from the QUANTIZED state
    z = _streamed_noise(jax.random.PRNGKey(3), 1)
    x = rollout.states.astype(jnp.float32).reshape(-1, 3)
    mean = jnp.tanh(mlp_apply(s.act, x))
    expect = jnp.clip(mean.reshape(H, N, 1)
                      + 0.05 * jnp.moveaxis(z, 1, 2), -1.0, 1.0)
    np.testing.assert_allclose(rollout.actions.astype(jnp.float32), expect,
                               rtol=1e-2, atol=1e-2)   # bf16 action rounding


def test_sharded_offpolicy_rollout_parity():
    """shard_map DP wrapper == manual per-shard kernel runs with the same
    folded keys, concatenated along the STANDARD layout's env axis (axis 1
    for rollout tensors, axis 0 for env state / obs)."""
    from elegantrl_tpu.ops.pallas_rollout import (
        make_sharded_offpolicy_rollout)
    from elegantrl_tpu.parallel.mesh import make_mesh
    mesh = make_mesh({'dp': 8})
    n, h, n_loc = 32, 8, 4
    args = Config()
    agent = make_ddpg_td3(NET_DIMS, 3, 1, args, buffer=None, td3=True)
    s = agent.init(jax.random.PRNGKey(0))
    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    env_state = jax.vmap(env.init)(keys)
    env_state = env_state._replace(
        t=(jnp.arange(n) * 29 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    key = jax.random.PRNGKey(3)
    cfg = {'noise_std': 0.1}
    sharded = make_sharded_offpolicy_rollout(
        PENDULUM_BODY, NET_DIMS, h, n, 1.0, mesh, head='ddpg', head_cfg=cfg,
        block=n_loc, chunk=4, interpret=True)
    ro, es2, ob2 = jax.jit(sharded)(s, env_state, obs, key)
    local = make_fused_offpolicy_rollout(
        PENDULUM_BODY, NET_DIMS, h, n_loc, 1.0, head='ddpg', head_cfg=cfg,
        block=n_loc, chunk=4, interpret=True)
    parts = []
    for k in range(8):
        shard_es = jax.tree.map(lambda x: x[k * n_loc:(k + 1) * n_loc],
                                env_state)
        parts.append(local(s, shard_es, obs[k * n_loc:(k + 1) * n_loc],
                           jax.random.fold_in(key, k)))
    exp_ro = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1),
                          *[p[0] for p in parts])
    for a, b in zip(jax.tree.leaves(ro), jax.tree.leaves(exp_ro)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    exp_es = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                          *[p[1] for p in parts])
    for a, b in zip(jax.tree.leaves(es2), jax.tree.leaves(exp_es)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ob2), np.asarray(jnp.concatenate([p[2] for p in parts],
                                                    axis=0)))


def test_sharded_offpolicy_fast_path_trains():
    """End-to-end: build_training under a dp-8 mesh auto-selects the
    SHARDED off-policy fused rollout; the replay insert is shard-aligned
    and a training round produces finite metrics with replicated params."""
    from elegantrl_tpu.agents import AgentSAC
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.parallel.mesh import make_mesh
    from elegantrl_tpu.train.runner import build_training
    mesh = make_mesh({'dp': 8})
    args = Config(agent_class=AgentSAC, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 64,
                            'max_step': 200, 'state_dim': 3,
                            'action_dim': 1, 'if_discrete': False})
    args.horizon_len = 16
    args.net_dims = NET_DIMS
    args.batch_size = 32
    args.buffer_size = 4096
    args.use_pallas_rollout = 'interpret'
    ctx = build_training(args, mesh=mesh)

    @jax.jit
    def two_rounds(c):
        c, m1 = ctx.round_fn(c, None)
        c, m2 = ctx.round_fn(c, None)
        return c, (m1, m2)

    carry2, (m1, m2) = two_rounds(ctx.carry)
    for v in jax.tree.leaves((m1, m2)):
        assert np.all(np.isfinite(np.asarray(v)))
    assert int(carry2.buf_state.size) == 32
    leaf = jax.tree.leaves(carry2.agent_state.act)[0]
    shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_a2c_update_tsn_layout_equivalence():
    """A2C consumes the kernel's transposed ('tsn') rollout: updating from
    the tsn layout must produce bit-identical params to updating from the
    same data un-transposed to the standard layout (same key)."""
    from elegantrl_tpu.agents.ppo import make_ppo
    from elegantrl_tpu.ops.pallas_rollout import make_fused_rollout

    args = Config()
    args.net_dims = NET_DIMS
    args.batch_size = 8
    args.repeat_times = 2.0
    agent = make_ppo(NET_DIMS, 3, 1, args, a2c=True)
    s = agent.init(jax.random.PRNGKey(0))
    env, env_state, obs = _pendulum_setup()
    fast = make_fused_rollout(PENDULUM_BODY, NET_DIMS, H, N, 1.0,
                              discrete=False, block=8, interpret=True)
    ro, es2, ob2 = fast(s, env_state, obs, jax.random.PRNGKey(3))
    assert 'tsn' in ro.extras
    ro_std = ro._replace(states=jnp.moveaxis(ro.states, 1, 2),
                         actions=jnp.moveaxis(ro.actions, 1, 2),
                         extras={'values': ro.extras['values']})
    k = jax.random.PRNGKey(11)
    s_tsn, m_tsn = agent.update(s, ro, ob2, k)
    s_std, m_std = agent.update(s, ro_std, ob2, k)
    for a, b in zip(jax.tree.leaves(s_tsn), jax.tree.leaves(s_std)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_runner_a2c_fast_path_trains(capsys):
    """The runner auto-selects the fused rollout for A2C too."""
    from elegantrl_tpu.train.runner import build_training
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.agents import AgentA2C

    args = Config(agent_class=AgentA2C, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 16,
                            'max_step': 200, 'state_dim': 3,
                            'action_dim': 1, 'if_discrete': False})
    args.horizon_len = 8
    args.net_dims = NET_DIMS
    args.batch_size = 8
    args.use_pallas_rollout = 'interpret'
    ctx = build_training(args)
    assert 'pallas fused-rollout fast path enabled' in capsys.readouterr().out
    carry, metrics = jax.jit(ctx.round_fn)(ctx.carry, None)
    assert np.isfinite(float(metrics['obj_critic']))
