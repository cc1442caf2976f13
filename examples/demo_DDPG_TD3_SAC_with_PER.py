"""DDPG / TD3 / SAC / ModSAC with Prioritized Experience Replay.

Mirror of the reference's ``examples/demo_DDPG_TD3_SAC_with_PER.py``
(if_use_per=True, per_alpha=0.6, per_beta=0.4, larger buffer, smaller
repeat_times — reference :46-50).  The PER machinery is the fanout-256 wide
segment tree in ``ops/per.py``; the verified TPU row is
``td3_pendulum_per`` in RESULTS.md (-74.2 vs the uniform row's -80.8 on the
same env/steps).

Run: python examples/demo_DDPG_TD3_SAC_with_PER.py [ddpg|td3|sac|modsac]
"""

import sys

from demo_DDPG_TD3_SAC import AGENTS, train_for_pendulum


def train_with_per(agent_class, num_envs: int = 8):
    return train_for_pendulum(agent_class, num_envs=num_envs,
                              if_use_per=True)


if __name__ == '__main__':
    name = sys.argv[1] if len(sys.argv) > 1 else 'td3'
    train_with_per(AGENTS[name])
