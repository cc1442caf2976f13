"""MAPPO (CTDE) on the cooperative team-chasing env."""
import numpy as np
import jax

from elegantrl_tpu.marl import make_team_chasing, make_mappo, train_mappo


def test_env_contract():
    env = make_team_chasing(num_agents=3, dim=2)
    s = env.init(jax.random.key(0))
    obs = env.obs(s)
    gs = env.global_state(s)
    assert obs.shape == (3, env.obs_dim)
    assert gs.shape == (env.state_dim,)
    s2, r, term, trunc = env.step(s, np.ones((3, 2), np.float32),
                                  jax.random.key(1))
    assert np.isfinite(float(r))


def test_mappo_learns_to_cooperate():
    env = make_team_chasing(num_agents=2, dim=2)
    state, history = train_mappo(env, num_envs=16, horizon=64, batch_size=128,
                                 repeat_times=4, num_rounds=12, verbose=False)
    assert len(history) >= 2
    assert history[-1] > history[0], history
