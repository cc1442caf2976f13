"""Population-based (Podracer generational) training smoke test."""
import numpy as np

from elegantrl_tpu.config import Config
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.agents import AgentPPO
from elegantrl_tpu.parallel.population import train_agent_population


def test_population_trains_and_selects():
    args = Config(agent_class=AgentPPO, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': 4,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 64
    args.repeat_times = 4
    args.batch_size = 32
    out = train_agent_population(args, population_size=4, generations=2,
                                 rounds_per_generation=2, eval_episodes=4,
                                 verbose=False)
    assert out['history'].shape == (2, 4)
    assert np.isfinite(out['history']).all()
    assert np.isfinite(out['best_score'])
