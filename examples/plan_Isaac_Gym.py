"""External massively-parallel sim entry — the reference's Isaac Gym plan.

Capability match for ``examples/plan_Isaac_Gym.py`` (reference): train PPO
on an Isaac Gym vectorized task through the IsaacVecEnv adapter (reference
:20-52 builds ``IsaacVecEnv('Ant', env_num=2**10)``).  The reference script
CANNOT run: it imports ``elegantrl.envs.IsaacGym`` whose ``isaac_tasks``
module is absent from its tree, and isaacgym itself is CUDA-only.

Here the adapter is real (``elegantrl_tpu/envs/isaac.py``): any external
batched simulator with the Isaac VecTask surface (``reset()``/``step()``
over whole-batch tensors, obs dicts, ``info['time_outs']``) plugs into the
host-rollout training path.  With ``isaacgymenvs`` installed,
``load_isaac_task('Ant', env_num=1024)`` builds the same EnvDef; without
it, this demo trains on a self-contained mock VecTask (torch-tensor
point-mass reach task) to exercise the identical code path.

Run:  python examples/plan_Isaac_Gym.py [Ant|mock] [quick]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from elegantrl_tpu.config import Config                       # noqa: E402
from elegantrl_tpu.agents import AgentPPO                     # noqa: E402
from elegantrl_tpu.envs import (                              # noqa: E402
    SimUnavailable, load_isaac_task, make_isaac_env)
from elegantrl_tpu.train.runner import train_agent            # noqa: E402


def _mock_vectask(num_envs: int):
    """Isaac-convention batched sim (torch tensors, obs dict, internal
    auto-reset) — the tests' MockVecTask, kept here self-contained."""
    import torch

    class MockVecTask:
        def __init__(self):
            self.num_envs = num_envs
            self.num_obs = 2
            self.num_actions = 2
            self.max_episode_length = 40
            self._g = torch.Generator().manual_seed(0)
            self._pos = torch.zeros((num_envs, 2))
            self._t = torch.zeros(num_envs, dtype=torch.long)

        def _spawn(self, mask):
            fresh = torch.rand((self.num_envs, 2),
                               generator=self._g) * 2.0 - 1.0
            self._pos = torch.where(mask[:, None], fresh, self._pos)
            self._t = torch.where(mask, torch.zeros_like(self._t), self._t)

        def reset(self):
            self._spawn(torch.ones(self.num_envs, dtype=torch.bool))
            return {'obs': self._pos.clone()}

        def step(self, actions):
            actions = torch.as_tensor(actions).clamp(-1.0, 1.0)
            self._pos = self._pos + 0.1 * actions
            self._t = self._t + 1
            dist = self._pos.norm(dim=-1)
            reached = dist < 0.1
            timeout = self._t >= self.max_episode_length
            dones = reached | timeout
            self._spawn(dones)
            return ({'obs': self._pos.clone()}, -dist, dones,
                    {'time_outs': timeout & ~reached})

    return MockVecTask()


def plan_isaac(task: str = 'mock', quick: bool = False):
    # real Isaac tasks want thousands of sub-envs (reference plans 2**10);
    # the mock stays at the 64-env calibrated recipe
    num_envs = 64 if (quick or task == 'mock') else 1024
    if task == 'mock':
        env = make_isaac_env(lambda: _mock_vectask(num_envs),
                             env_name='MockVecTask-v0')
    else:
        try:
            env = load_isaac_task(task, env_num=num_envs)
        except SimUnavailable as e:
            print(f"| plan_Isaac_Gym: {e}\n| falling back to the mock sim")
            return plan_isaac('mock', quick=quick)
    spec = env.spec
    args = Config(AgentPPO, env, {
        'env_name': spec.env_name, 'num_envs': num_envs,
        'max_step': spec.max_step, 'state_dim': spec.state_dim,
        'action_dim': spec.action_dim, 'if_discrete': spec.if_discrete})
    args.net_dims = (128, 128)
    args.horizon_len = spec.max_step
    args.batch_size = 512
    # the mock reach task needs a high update-to-data ratio + reward scaling
    # (measured: repeat_times 8 / scale 1 stays at random −28; this recipe
    # reaches −1.6 where the scripted optimum is −2.3)
    args.repeat_times = 32
    args.learning_rate = 1e-3
    args.reward_scale = 4.0
    args.gamma = 0.95
    args.break_step = int(2e4 if quick else 3e5)
    args.eval_per_step = int(5e3 if quick else 5e4)
    args.cwd = f'./Isaac_{spec.env_name.replace(":", "_")}_PPO'
    return train_agent(args)


if __name__ == '__main__':
    task_arg = sys.argv[1] if len(sys.argv) > 1 else 'mock'
    quick_arg = 'quick' in sys.argv[2:]
    plan_isaac(task_arg, quick=quick_arg)
