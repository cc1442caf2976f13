"""Tutorial 1 — the helloworld mini-framework (DQN, DDPG, PPO).

Runnable port of the reference's ``tutorial_helloworld_DQN_DDPG_PPO.ipynb``
flow: train three algorithm families with the self-contained ``helloworld``
package, which restates the full framework (Config, env, agent, buffer,
train loop) in four small files — the cleanest place to READ the algorithm
math before diving into ``elegantrl_tpu``.

Run (CPU is fine for these sizes):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python examples/tutorial_helloworld_DQN_DDPG_PPO.py [dqn|ddpg|ppo|all]

Expected outcomes (seconds each on CPU, faster on TPU):
- DQN solves CartPole-v1: avgR climbs past 150 (often to ~300-500)
- DDPG reaches avgR > -200 on Pendulum-v1
- PPO reaches avgR > -400 on Pendulum-v1 with this tiny budget
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def tutorial_dqn():
    """Step 1: value-based control on CartPole.

    helloworld's train_agent is a plain Python loop over explore/update —
    read ``helloworld/erl_run.py`` side by side with this call."""
    from helloworld.erl_tutorial_DQN import train_dqn_for_cartpole
    train_dqn_for_cartpole()


def tutorial_ddpg():
    """Step 2: off-policy continuous control (replay buffer + target nets +
    deterministic actor)."""
    from helloworld.erl_tutorial_DDPG_TD3_SAC import train_for_pendulum
    from elegantrl_tpu.agents import AgentDDPG
    train_for_pendulum(AgentDDPG)


def tutorial_ppo():
    """Step 3: on-policy continuous control (GAE + clipped surrogate)."""
    from helloworld.erl_tutorial_PPO import train_ppo_for_pendulum
    train_ppo_for_pendulum()


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('dqn', 'all'):
        tutorial_dqn()
    if which in ('ddpg', 'all'):
        tutorial_ddpg()
    if which in ('ppo', 'all'):
        tutorial_ppo()
