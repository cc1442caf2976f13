"""Parity tests for the fused whole-update Pallas kernel
(``ops/pallas_update.py``) against the scan-path PPO update, run on CPU via
the TPU interpreter.

Both paths consume the SAME minibatch ids by construction (one key split,
``sample_flat_ids`` per key), so the comparison is deterministic: same
rollout + same agent state + same key must produce the same new params,
Adam moments and metrics up to f32 reassociation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elegantrl_tpu.agents.base import collect_rollout
from elegantrl_tpu.agents.ppo import make_ppo
from elegantrl_tpu.config import Config
from elegantrl_tpu.envs.pendulum import make_pendulum
from elegantrl_tpu.ops.pallas_update import _adam_parts

NET_DIMS = (16, 16)
H, N, B = 32, 16, 128      # update_times = H * repeat / B = 2


def _make_agent(mode):
    args = Config()
    args.net_dims = NET_DIMS
    args.batch_size = B
    args.repeat_times = 8.0
    args.use_pallas_update = mode
    return make_ppo(NET_DIMS, 3, 1, args)


@pytest.fixture(scope="module")
def setup():
    agent_ref = _make_agent(False)
    agent_fused = _make_agent('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    s = s._replace(norm_avg=jnp.array([0.1, -0.2, 0.3]),
                   norm_std=jnp.array([0.9, 1.1, 2.0]))

    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    env_state = jax.vmap(env.init)(keys)
    env_state = env_state._replace(
        t=(jnp.arange(N) * 23 % 200).astype(jnp.int32))
    obs = jax.vmap(env.obs)(env_state)
    rollout, env_state2, last_obs = collect_rollout(
        env, s, agent_ref.explore_action, agent_ref.env_action,
        env_state, obs, jax.random.PRNGKey(3), H, reward_scale=1.0,
        extras_fn=agent_ref.rollout_extras)

    k_upd = jax.random.PRNGKey(11)
    s_ref, m_ref = jax.jit(agent_ref.update)(s, rollout, last_obs, k_upd)
    s_fused, m_fused = jax.jit(agent_fused.update)(s, rollout, last_obs, k_upd)
    return s, s_ref, m_ref, s_fused, m_fused


def _leaf_pairs(t_ref, t_fused):
    la, lb = jax.tree.leaves(t_ref), jax.tree.leaves(t_fused)
    assert len(la) == len(lb)
    return zip(la, lb)


def test_params_match(setup):
    s0, s_ref, _, s_fused, _ = setup
    for old, a, b in zip(jax.tree.leaves((s0.act, s0.cri)),
                         jax.tree.leaves((s_ref.act, s_ref.cri)),
                         jax.tree.leaves((s_fused.act, s_fused.cri))):
        # compare the UPDATES, not the params — params barely move per step
        da, db = np.asarray(a - old), np.asarray(b - old)
        np.testing.assert_allclose(db, da, rtol=5e-3, atol=1e-8)


def test_adam_state_matches(setup):
    s0, s_ref, _, s_fused, _ = setup
    for opt_ref, opt_fused in ((s_ref.act_opt, s_fused.act_opt),
                               (s_ref.cri_opt, s_fused.cri_opt)):
        c_ref, mu_ref, nu_ref = _adam_parts(opt_ref)
        c_fus, mu_fus, nu_fus = _adam_parts(opt_fused)
        assert int(c_ref) == int(c_fus) == 2
        for a, b in _leaf_pairs(mu_ref, mu_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-9)
        for a, b in _leaf_pairs(nu_ref, nu_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-12)


def test_metrics_match(setup):
    _, _, m_ref, _, m_fused = setup
    for k in ('obj_critic', 'obj_actor', 'obj_entropy'):
        np.testing.assert_allclose(float(m_fused[k]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-6)


def test_explicit_request_raises_on_ineligible():
    args = Config()
    args.net_dims = NET_DIMS
    args.batch_size = 100          # not a multiple of 128
    args.repeat_times = 8.0
    args.use_pallas_update = True
    agent = make_ppo(NET_DIMS, 3, 1, args)
    env = make_pendulum()
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    rollout, _, last_obs = collect_rollout(
        env, agent.init(jax.random.PRNGKey(0)), agent.explore_action,
        agent.env_action, env_state, obs, jax.random.PRNGKey(2), 8,
        reward_scale=1.0, extras_fn=agent.rollout_extras)
    with pytest.raises(ValueError, match='use_pallas_update=True'):
        agent.update(agent.init(jax.random.PRNGKey(0)), rollout, last_obs,
                     jax.random.PRNGKey(3))


def test_runner_both_fast_paths(capsys):
    """End-to-end: fused rollout AND fused update together in the runner
    (interpret mode, CPU) — the flagship bench composition."""
    from elegantrl_tpu.train.runner import build_training
    from elegantrl_tpu.envs import PendulumEnv
    from elegantrl_tpu.agents import AgentPPO

    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 16,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.horizon_len = 32
    args.net_dims = (16, 16)
    args.batch_size = 128
    args.repeat_times = 8.0
    args.use_pallas_rollout = 'interpret'
    args.use_pallas_update = 'interpret'
    ctx = build_training(args)
    carry, metrics = jax.jit(ctx.round_fn)(ctx.carry, None)
    assert np.isfinite(float(metrics['obj_critic']))
    assert np.isfinite(float(metrics['obj_actor']))
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        ctx.carry.agent_state.act, carry.agent_state.act)
    assert max(jax.tree.leaves(moved)) > 0.0


@pytest.fixture(scope="module")
def setup_discrete():
    """Same parity construction on the categorical head (DiscretePPO on
    CartPole): same minibatch ids by construction, one-hot ab row."""
    from elegantrl_tpu.agents.ppo import make_ppo as _make
    from elegantrl_tpu.envs.cartpole import make_cartpole
    from functools import partial as _p

    def mk(mode):
        args = Config()
        args.net_dims = NET_DIMS
        args.batch_size = B
        args.repeat_times = 8.0
        args.use_pallas_update = mode
        return _make(NET_DIMS, 4, 2, args, discrete=True)

    agent_ref, agent_fused = mk(False), mk('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    env = make_cartpole()
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    env_state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(env_state)
    rollout, _, last_obs = collect_rollout(
        env, s, agent_ref.explore_action, agent_ref.env_action,
        env_state, obs, jax.random.PRNGKey(3), H, reward_scale=1.0,
        extras_fn=agent_ref.rollout_extras)
    k_upd = jax.random.PRNGKey(11)
    s_ref, m_ref = jax.jit(agent_ref.update)(s, rollout, last_obs, k_upd)
    s_fused, m_fused = jax.jit(agent_fused.update)(s, rollout, last_obs,
                                                   k_upd)
    return s, s_ref, m_ref, s_fused, m_fused


def test_discrete_params_match(setup_discrete):
    s0, s_ref, _, s_fused, _ = setup_discrete
    for old, a, b in zip(jax.tree.leaves((s0.act, s0.cri)),
                         jax.tree.leaves((s_ref.act, s_ref.cri)),
                         jax.tree.leaves((s_fused.act, s_fused.cri))):
        da, db = np.asarray(a - old), np.asarray(b - old)
        np.testing.assert_allclose(db, da, rtol=5e-3, atol=1e-8)


def test_discrete_metrics_match(setup_discrete):
    _, _, m_ref, _, m_fused = setup_discrete
    for k in ('obj_critic', 'obj_actor', 'obj_entropy'):
        np.testing.assert_allclose(float(m_fused[k]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-6)


# ------------------------------------------------- DQN-family fused chunk

@pytest.mark.parametrize("twin,duel", [(False, False), (True, False),
                                       (False, True), (True, True)])
def test_dqn_fused_update_parity(twin, duel):
    """The chunked DQN fused update must reproduce the scan path exactly:
    same pre-gathered ids by construction, same TD/Adam/Polyak math to f32
    tolerance — across a partial chunk AND a chunk boundary (20 updates,
    chunk=16), for all four net variants."""
    from elegantrl_tpu.agents.dqn import make_dqn
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 4, 3, 8, 40
    def mk(mode):
        args = Config()
        args.batch_size = 128
        args.repeat_times = 64.0          # 40 * 64 / 128 = 20 updates
        args.use_pallas_update = mode
        buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                              num_seqs=NS, if_discrete=True, args=args)
        return make_dqn((16, 16), S, A, args, twin=twin, duel=duel,
                        buffer=buffer), buffer

    agent_ref, buf_ref = mk(False)
    agent_fused, buf_fused = mk('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.randint(ka, (H, NS), 0, A),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)),
             jnp.ones((H, NS)))
    buf0 = buf_ref.update(buf_ref.init(), items)
    buf0f = buf_fused.update(buf_fused.init(), items)

    k_upd = jax.random.PRNGKey(11)
    s_ref, _, m_ref = jax.jit(agent_ref.update)(s, buf0, k_upd)
    s_fus, _, m_fus = jax.jit(agent_fused.update)(s, buf0f, k_upd)

    for old, a, b in zip(jax.tree.leaves((s.q, s.q_target)),
                         jax.tree.leaves((s_ref.q, s_ref.q_target)),
                         jax.tree.leaves((s_fus.q, s_fus.q_target))):
        da, db = np.asarray(a - old), np.asarray(b - old)
        np.testing.assert_allclose(db, da, rtol=5e-3, atol=1e-7)
    c_ref, mu_ref, nu_ref = _adam_parts(s_ref.opt)
    c_fus, mu_fus, nu_fus = _adam_parts(s_fus.opt)
    assert int(c_ref) == int(c_fus) == 20
    for a, b in zip(jax.tree.leaves(mu_ref), jax.tree.leaves(mu_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-7)
    for k_ in ('obj_critic', 'obj_actor'):
        np.testing.assert_allclose(float(m_fus[k_]), float(m_ref[k_]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("td3", [True, False])
def test_ddpg_td3_fused_update_parity(td3):
    """The chunked DDPG/TD3 fused update must reproduce the scan path:
    same ids and smoothing noise by construction, same TD/Adam/Polyak and
    delayed-actor gating — across a chunk boundary (20 updates, chunk=16)."""
    from elegantrl_tpu.agents.ddpg_td3 import _make
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 8, 40
    def mk(mode):
        args = Config()
        args.batch_size = 128
        args.repeat_times = 64.0          # 40 * 64 / 128 = 20 updates
        args.use_pallas_update = mode
        args.buffer_init_size = 16
        buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                              num_seqs=NS, args=args)
        return _make((16, 16), S, A, args, buffer, td3=td3)

    agent_ref = mk(False)
    agent_fused = mk('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.uniform(ka, (H, NS, A), minval=-1, maxval=1),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))
    buf0 = agent_ref and None  # placeholder, rebuilt below per agent
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer as _RB
    args0 = Config(); args0.batch_size = 128
    def fill():
        b = _RB(max_size=256, state_dim=S, action_dim=A, num_seqs=NS,
                args=args0)
        return b.update(b.init(), items)

    k_upd = jax.random.PRNGKey(11)
    s_ref, _, m_ref = jax.jit(agent_ref.update)(s, fill(), k_upd)
    s_fus, _, m_fus = jax.jit(agent_fused.update)(s, fill(), k_upd)

    for old, a, b in zip(
            jax.tree.leaves((s.act, s.act_target, s.cri, s.cri_target)),
            jax.tree.leaves((s_ref.act, s_ref.act_target, s_ref.cri,
                             s_ref.cri_target)),
            jax.tree.leaves((s_fus.act, s_fus.act_target, s_fus.cri,
                             s_fus.cri_target))):
        da, db = np.asarray(a - old), np.asarray(b - old)
        np.testing.assert_allclose(db, da, rtol=5e-3, atol=4e-7)
    for opt_ref, opt_fus, n_exp in (
            (s_ref.cri_opt, s_fus.cri_opt, 20),
            (s_ref.act_opt, s_fus.act_opt, 10 if td3 else 20)):
        c_ref, mu_ref, nu_ref = _adam_parts(opt_ref)
        c_fus, mu_fus, nu_fus = _adam_parts(opt_fus)
        assert int(c_ref) == int(c_fus) == n_exp
        for a, b in zip(jax.tree.leaves(mu_ref), jax.tree.leaves(mu_fus)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=4e-7)
    for k_ in ('obj_critic', 'obj_actor'):
        np.testing.assert_allclose(float(m_fus[k_]), float(m_ref[k_]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("modsac", [False, True])
def test_sac_fused_update_parity(modsac):
    """The chunked SAC/ModSAC fused update must reproduce the scan path:
    same ids and noise draws by construction, same entropy-TD/alpha/actor
    math including the ModSAC reliability gate and the learned alpha leaf —
    across a chunk boundary (20 updates, chunk=16)."""
    from elegantrl_tpu.agents.sac import make_sac
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 8, 40
    def mk(mode):
        args = Config()
        args.batch_size = 128
        args.repeat_times = 64.0          # 20 updates
        args.use_pallas_update = mode
        buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                              num_seqs=NS, args=args)
        return make_sac((16, 16), S, A, args, buffer, modsac=modsac)

    agent_ref = mk(False)
    agent_fused = mk('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.uniform(ka, (H, NS, A), minval=-1, maxval=1),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))
    args0 = Config(); args0.batch_size = 128
    def fill():
        b = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                         num_seqs=NS, args=args0)
        return b.update(b.init(), items)

    k_upd = jax.random.PRNGKey(11)
    s_ref, _, m_ref = jax.jit(agent_ref.update)(s, fill(), k_upd)
    s_fus, _, m_fus = jax.jit(agent_fused.update)(s, fill(), k_upd)

    assert int(s_ref.update_a) == int(s_fus.update_a)
    np.testing.assert_allclose(float(s_fus.alpha_log), float(s_ref.alpha_log),
                               rtol=1e-5, atol=1e-7)
    trees_ref = (s_ref.act, s_ref.cri, s_ref.cri_target)
    trees_fus = (s_fus.act, s_fus.cri, s_fus.cri_target)
    if modsac:
        trees_ref += (s_ref.act_target,)
        trees_fus += (s_fus.act_target,)
        old = (s.act, s.cri, s.cri_target, s.act_target)
    else:
        old = (s.act, s.cri, s.cri_target)
    for o, a, b in zip(jax.tree.leaves(old), jax.tree.leaves(trees_ref),
                       jax.tree.leaves(trees_fus)):
        da, db = np.asarray(a - o), np.asarray(b - o)
        np.testing.assert_allclose(db, da, rtol=5e-3, atol=4e-7)
    for opt_ref, opt_fus in ((s_ref.cri_opt, s_fus.cri_opt),
                             (s_ref.act_opt, s_fus.act_opt),
                             (s_ref.alpha_opt, s_fus.alpha_opt)):
        c_ref, mu_ref, _ = _adam_parts(opt_ref)
        c_fus, mu_fus, _ = _adam_parts(opt_fus)
        assert int(c_ref) == int(c_fus)
        for a, b in zip(jax.tree.leaves(mu_ref), jax.tree.leaves(mu_fus)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=4e-7)
    for k_ in ('obj_critic', 'obj_actor'):
        np.testing.assert_allclose(float(m_fus[k_]), float(m_ref[k_]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("td3", [False, True])
def test_ddpg_td3_per_fused_single_update_parity(td3):
    """PER variant of the fused chunk (VERDICT r4 #5): with update_times=1
    the fused path's chunk-start pre-sampling coincides with the scan
    path's per-update sampling, so params, IS-weighted objectives AND the
    post-update priority tree must match exactly."""
    from elegantrl_tpu.agents.ddpg_td3 import _make
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 8, 40

    def mk(mode):
        args = Config()
        args.batch_size = 128
        args.repeat_times = 3.2           # 40 * 3.2 / 128 = 1 update
        args.use_pallas_update = mode
        args.buffer_init_size = 16
        args.if_use_per = True
        buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                              num_seqs=NS, if_use_per=True, args=args)
        return _make((16, 16), S, A, args, buffer, td3=td3), buffer

    agent_ref, buf_ref = mk(False)
    agent_fused, buf_fus = mk('interpret')
    s = agent_ref.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.uniform(ka, (H, NS, A), minval=-1, maxval=1),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))

    def fill(b):
        st = b.update(b.init(), items)
        # break the uniform-priority degeneracy so PER sampling is
        # non-trivial in both paths
        ids0 = jnp.arange(H, dtype=jnp.int32)
        prob = 0.5 + jnp.arange(H * NS, dtype=jnp.float32).reshape(
            H, NS) % 7.0
        return st._replace(per_tree=b.tree.update(st.per_tree, ids0, prob))

    k_upd = jax.random.PRNGKey(11)
    s_ref, b_ref, m_ref = jax.jit(agent_ref.update)(s, fill(buf_ref), k_upd)
    s_fus, b_fus, m_fus = jax.jit(agent_fused.update)(s, fill(buf_fus),
                                                      k_upd)

    for a, b in zip(
            jax.tree.leaves((s_ref.act, s_ref.cri, s_ref.act_target,
                             s_ref.cri_target)),
            jax.tree.leaves((s_fus.act, s_fus.cri, s_fus.act_target,
                             s_fus.cri_target))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)
    # the priority tree must carry the SAME post-update priorities
    for a, b in zip(jax.tree.leaves(b_ref.per_tree),
                    jax.tree.leaves(b_fus.per_tree)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(m_fus['obj_critic']),
                               float(m_ref['obj_critic']),
                               rtol=1e-4, atol=1e-6)


def test_td3_per_fused_multi_chunk_runs():
    """Across chunk boundaries the fused PER path pre-samples each chunk
    against the chunk-start tree (documented <=C-1-update priority lag), so
    exact scan parity no longer holds; assert the mechanics instead: Adam
    counts advance per update, every touched priority equals
    clip(td,1e-8,10)^alpha (i.e. leaves left the insert-time prob=10
    plateau), and params stay finite."""
    from elegantrl_tpu.agents.ddpg_td3 import _make
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 8, 40
    args = Config()
    args.batch_size = 128
    args.repeat_times = 64.0              # 20 updates -> 2 chunks
    args.use_pallas_update = 'interpret'
    args.buffer_init_size = 16
    args.if_use_per = True
    buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                          num_seqs=NS, if_use_per=True, args=args)
    agent = _make((16, 16), S, A, args, buffer, td3=True)
    s = agent.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.uniform(ka, (H, NS, A), minval=-1, maxval=1),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))
    buf0 = buffer.update(buffer.init(), items)
    s2, b2, m = jax.jit(agent.update)(s, buf0, jax.random.PRNGKey(11))

    c_cri, _, _ = _adam_parts(s2.cri_opt)
    c_act, _, _ = _adam_parts(s2.act_opt)
    assert int(c_cri) == 20 and int(c_act) == 10
    leaves0 = np.asarray(buffer.tree.leaves(buf0.per_tree))
    leaves2 = np.asarray(buffer.tree.leaves(b2.per_tree))
    touched = leaves2 != leaves0
    assert touched.sum() > 0
    assert np.all(leaves2[touched] <= 10.0 ** buffer.per_alpha + 1e-6)
    assert np.isfinite(leaves2).all()
    for leaf in jax.tree.leaves((s2.act, s2.cri)):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(float(m['obj_critic']))


@pytest.mark.parametrize("modsac", [False, True])
def test_sac_fused_lane_chunk_parity(modsac):
    """The lane-chunked SAC kernel (round 5: batch split into equal lane
    chunks with per-chunk grad accumulation, the wide-batch VMEM fix) must
    match the unchunked kernel to f32-reassociation tolerance."""
    from elegantrl_tpu.agents.sac import make_sac
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    S, A, NS, H = 3, 2, 8, 40

    def mk(lane):
        args = Config()
        args.batch_size = 256
        args.repeat_times = 64.0          # 10 updates
        args.use_pallas_update = 'interpret'
        if lane:
            args.sac_lane_chunk = lane
        buffer = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                              num_seqs=NS, args=args)
        return make_sac((16, 16), S, A, args, buffer, modsac=modsac)

    agent_full = mk(None)                 # lane_chunk = 256 = B (NLC=1)
    agent_lc = mk(64)                     # NLC=4
    s = agent_full.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    ks, ka, kr = jax.random.split(k, 3)
    items = (jax.random.normal(ks, (H, NS, S)),
             jax.random.uniform(ka, (H, NS, A), minval=-1, maxval=1),
             jax.random.normal(kr, (H, NS)),
             jnp.ones((H, NS)), jnp.ones((H, NS)))
    args0 = Config(); args0.batch_size = 256

    def fill():
        b = ReplayBuffer(max_size=256, state_dim=S, action_dim=A,
                         num_seqs=NS, args=args0)
        return b.update(b.init(), items)

    k_upd = jax.random.PRNGKey(11)
    s_a, _, m_a = jax.jit(agent_full.update)(s, fill(), k_upd)
    s_b, _, m_b = jax.jit(agent_lc.update)(s, fill(), k_upd)

    np.testing.assert_allclose(float(s_b.alpha_log), float(s_a.alpha_log),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves((s_a.act, s_a.cri, s_a.cri_target)),
                    jax.tree.leaves((s_b.act, s_b.cri, s_b.cri_target))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2e-6)
    np.testing.assert_allclose(float(m_b['obj_critic']),
                               float(m_a['obj_critic']), rtol=1e-3,
                               atol=1e-5)
