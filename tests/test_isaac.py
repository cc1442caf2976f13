"""Isaac Gym-style adapter: external batched sims in the training loop.

The reference's IsaacVecEnv (PlanIsaacGymEnv.py:41-165) adapts NVIDIA Isaac
Gym VecTasks; isaacgym is CUDA-only and absent (vestigial in the reference
too — it imports a nonexistent isaac_tasks module), so these tests drive
the adapter against a mock simulator with the exact VecTask surface:
torch tensors, obs dicts, one `dones` flag + info['time_outs'].
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO
from elegantrl_tpu.envs.base import vec_reset, vec_step
from elegantrl_tpu.envs.isaac import (
    ExternalSimPool, IsaacVecEnv, SimUnavailable, load_isaac_task,
    make_isaac_env,
)
from elegantrl_tpu.train.runner import build_training

torch = pytest.importorskip('torch')


class MockVecTask:
    """Isaac-convention batched point-mass sim: obs dict, torch tensors,
    internal auto-reset, info['time_outs'] distinguishing truncation."""

    def __init__(self, num_envs=8, dim=2, max_episode_length=40, seed=0):
        self.num_envs = num_envs
        self.num_obs = dim
        self.num_actions = dim
        self.max_episode_length = max_episode_length
        self._g = torch.Generator().manual_seed(seed)
        self._pos = torch.zeros((num_envs, dim))
        self._t = torch.zeros(num_envs, dtype=torch.long)

    def _spawn(self, mask):
        fresh = torch.rand((self.num_envs, self.num_obs),
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
        reward = -dist
        reached = dist < 0.1
        timeout = self._t >= self.max_episode_length
        dones = reached | timeout
        self._spawn(dones)  # Isaac sims auto-reset internally
        return ({'obs': self._pos.clone()}, reward, dones,
                {'time_outs': timeout & ~reached})


def test_pool_converts_and_splits_dones():
    pool = ExternalSimPool(lambda: MockVecTask(num_envs=4,
                                               max_episode_length=3))
    obs = pool.reset_all(np.int32(4))
    assert obs.shape == (4, 2) and obs.dtype == np.float32
    # drive everything to the step-3 timeout with null actions far from goal
    for _ in range(3):
        obs, r, term, trunc = pool.step(np.zeros((4, 2), np.float32))
    assert trunc.dtype == bool and term.dtype == bool
    # at t=3 every env times out unless it happened to spawn at the goal
    assert (trunc | term).all()
    assert not (trunc & term).any()  # timeouts are NOT double-counted


def test_pool_rejects_oversized_batch_and_narrows():
    pool = ExternalSimPool(lambda: MockVecTask(num_envs=4))
    with pytest.raises(AssertionError, match='built for 4'):
        pool.reset_all(np.int32(8))
    # narrower batches (evaluator episode counts) ride the first k sub-envs
    obs = pool.reset_all(np.int32(3))
    assert obs.shape == (3, 2)
    obs, r, term, trunc = pool.step(np.zeros((3, 2), np.float32))
    assert obs.shape == (3, 2) and r.shape == (3,)


def test_isaac_vec_env_reference_surface():
    env = IsaacVecEnv(lambda: MockVecTask(num_envs=6, dim=3),
                      env_name='Mock-v0')
    assert (env.num_envs, env.state_dim, env.action_dim) == (6, 3, 3)
    assert env.if_discrete is False and env.max_step == 40
    obs, info = env.reset()
    assert obs.shape == (6, 3)
    obs, r, term, trunc, info = env.step(np.zeros((6, 3), np.float32))
    assert obs.shape == (6, 3) and r.shape == (6,)


def test_envdef_steps_inside_jit():
    env = make_isaac_env(lambda: MockVecTask(num_envs=4), env_name='Mock-v0')
    assert env.batched and env.host_pool is not None
    state, obs = vec_reset(env, jax.random.key(0), 4)

    @jax.jit
    def two_steps(state, obs):
        a = -0.5 * obs  # move toward the origin
        state, obs, r1, t1, u1 = vec_step(env, state, a, jax.random.key(1))
        state, obs, r2, t2, u2 = vec_step(env, state, -0.5 * obs,
                                          jax.random.key(2))
        return obs, r1, r2

    obs2, r1, r2 = two_steps(state, obs)
    assert np.isfinite(np.asarray(obs2)).all()
    # moving toward the origin strictly improves the distance reward
    assert float(jnp.mean(r2)) > float(jnp.mean(r1))


def test_trains_through_framework():
    env = make_isaac_env(lambda: MockVecTask(num_envs=8), env_name='Mock-v0')
    args = Config(AgentPPO, env,
                  {'env_name': 'Mock-v0', 'num_envs': 8, 'max_step': 40,
                   'state_dim': 2, 'action_dim': 2, 'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 16
    args.batch_size = 32
    args.repeat_times = 2
    ctx = build_training(args)
    out, metrics = jax.jit(lambda c: ctx.round_fn(c, None))(ctx.carry)
    assert np.isfinite(float(metrics['exp_r']))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_load_isaac_task_raises_cleanly():
    with pytest.raises(SimUnavailable, match='isaacgymenvs'):
        load_isaac_task('Ant', env_num=16)
