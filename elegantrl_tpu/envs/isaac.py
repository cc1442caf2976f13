"""Isaac Gym-style adapter: plug external massively-parallel batched sims
into the TPU training runtime.

The reference ships ``IsaacVecEnv`` / ``IsaacOneEnv`` (reference
``elegantrl/envs/PlanIsaacGymEnv.py:41-165``) — an adapter over NVIDIA
Isaac Gym "VecTask" simulators that converts obs dicts to flat tensors,
overrides ``env_num``, and stamps the six env-protocol attributes.  The
code is vestigial in the snapshot (it imports ``elegantrl.envs.isaac_tasks``
which does not exist), and ``isaacgym`` itself is CUDA-only, but the
CAPABILITY matters: attach an already-batched third-party simulator to the
training loop without per-sub-env processes.

TPU-native redesign: an external batched sim becomes a ``batched=True``
:class:`~elegantrl_tpu.envs.base.EnvDef` — exactly the contract the
host-rollout Worker path already consumes (``envs/host_env.py``,
``train/runner.py`` host-rollout mode).  The adapter accepts any object
with the VecTask surface:

- attributes ``num_envs`` and either ``num_obs``/``num_actions`` (Isaac) or
  ``observation_space``/``action_space`` (gym.vector);
- ``reset() -> obs`` where obs is a tensor or an Isaac-style dict holding
  one (key ``'obs'``);
- ``step(actions) -> (obs, rewards, dones, info)`` that AUTO-RESETS done
  sub-envs internally (the Isaac convention); ``info`` may carry
  ``'time_outs'`` to distinguish truncation from termination.

Tensors may be numpy, torch (CPU or CUDA — moved via ``.cpu()``), or jax;
actions are handed to the sim as torch tensors when torch is importable
(what Isaac expects) and numpy otherwise.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from .base import EnvDef, EnvSpec


class SimUnavailable(ImportError):
    """Raised when the optional external simulator package is absent."""


def _to_numpy(x) -> np.ndarray:
    """torch (CPU/CUDA) / jax / numpy / Isaac obs-dict -> float-friendly np."""
    if isinstance(x, dict):  # Isaac obs dict: {'obs': tensor, ...}
        x = x['obs'] if 'obs' in x else next(iter(x.values()))
    if hasattr(x, 'detach'):        # torch tensor
        x = x.detach()
        if getattr(x, 'is_cuda', False):
            x = x.cpu()
        return x.numpy()
    return np.asarray(x)


def _sim_dims(sim) -> tuple:
    """(num_envs, obs_dim, action_dim, if_discrete, max_step) from either
    the Isaac attribute surface or gym space objects."""
    num_envs = int(sim.num_envs)
    if hasattr(sim, 'num_obs'):
        obs_dim = int(sim.num_obs)
    else:
        obs_dim = int(np.prod(sim.observation_space.shape[-1:]))
    if hasattr(sim, 'num_actions'):
        action_dim, if_discrete = int(sim.num_actions), False
    else:
        space = sim.action_space
        if hasattr(space, 'n'):
            action_dim, if_discrete = int(space.n), True
        else:
            action_dim, if_discrete = int(space.shape[-1]), False
    max_step = int(getattr(sim, 'max_episode_length', 1000))
    return num_envs, obs_dim, action_dim, if_discrete, max_step


class ExternalSimPool:
    """Batched-sim analog of ``host_env._HostPool``: one stateful external
    simulator stepped as a whole batch.  Same interface the host-rollout
    runner and the io_callback path consume: ``reset_all(num_envs) -> obs``
    and ``step(actions) -> (obs, rewards, terminals, truncates)``."""

    def __init__(self, sim_fn: Callable[[], Any]):
        self.sim_fn = sim_fn
        self.sim = None
        self._torch = None

    def _ensure(self):
        if self.sim is None:
            self.sim = self.sim_fn()
            try:
                import torch
                self._torch = torch
            except ImportError:
                self._torch = None
        return self.sim

    def reset_all(self, num_envs_arr) -> np.ndarray:
        sim = self._ensure()
        want = int(num_envs_arr)
        assert want <= int(sim.num_envs), (
            f"external sim is built for {sim.num_envs} envs; asked for "
            f"{want} — set args.num_envs to at most that (the reference "
            f"overrides env_num at sim construction instead, "
            f"PlanIsaacGymEnv.py:41-165; pass it through your sim_fn)")
        # narrower batches (e.g. evaluator episode counts) ride the first
        # `want` sub-envs; the sim always steps at its native width
        return _to_numpy(sim.reset()).astype(np.float32)[:want]

    def step(self, actions: np.ndarray):
        sim = self.sim
        n = actions.shape[0]
        a = np.array(actions)  # copy: io_callback hands a read-only view
        if n < int(sim.num_envs):
            pad = np.zeros((int(sim.num_envs) - n,) + a.shape[1:], a.dtype)
            a = np.concatenate([a, pad], axis=0)
        if self._torch is not None:
            a = self._torch.as_tensor(a)
        obs, rewards, dones, info = sim.step(a)
        obs = _to_numpy(obs).astype(np.float32)
        rewards = _to_numpy(rewards).astype(np.float32)
        dones = _to_numpy(dones).astype(bool)
        # Isaac convention: one `dones` flag + optional info['time_outs']
        # marking which dones are truncations (episode-length limits)
        timeouts = None
        if isinstance(info, dict) and 'time_outs' in info:
            timeouts = _to_numpy(info['time_outs']).astype(bool)
        truncates = (dones & timeouts) if timeouts is not None else (
            np.zeros_like(dones))
        terminals = dones & ~truncates
        return obs[:n], rewards[:n], terminals[:n], truncates[:n]


def make_isaac_env(sim_fn: Callable[[], Any], env_name: str = 'IsaacVecTask',
                   spec: Optional[EnvSpec] = None,
                   share_sim: bool = False) -> EnvDef:
    """Wrap ``sim_fn() -> external batched sim`` as a ``batched=True``
    EnvDef.  The sim is built lazily (first reset); if ``spec`` is omitted
    it is probed from a throwaway construction, so prefer passing it for
    expensive sims.  The returned EnvDef rides the same two paths as
    ``make_host_env``: ordered io_callback inside jit, or the zero-callback
    host-rollout mode when the runner detects ``host_pool``."""
    pool = ExternalSimPool(sim_fn)
    if spec is None:
        num_envs, obs_dim, action_dim, if_discrete, max_step = (
            _sim_dims(pool._ensure()))
        spec = EnvSpec(env_name=env_name, num_envs=num_envs,
                       max_step=max_step, state_dim=obs_dim,
                       action_dim=action_dim, if_discrete=if_discrete)

    def init(key, num_envs: int):
        del key
        obs = jax.experimental.io_callback(
            pool.reset_all,
            jax.ShapeDtypeStruct((num_envs, spec.state_dim), jnp.float32),
            jnp.asarray(num_envs, jnp.int32), ordered=True)
        return jnp.zeros(num_envs, jnp.int32), obs

    def step(state, actions, key):
        del key
        num_envs = actions.shape[0]
        out_shapes = (
            jax.ShapeDtypeStruct((num_envs, spec.state_dim), jnp.float32),
            jax.ShapeDtypeStruct((num_envs,), jnp.float32),
            jax.ShapeDtypeStruct((num_envs,), jnp.bool_),
            jax.ShapeDtypeStruct((num_envs,), jnp.bool_),
        )
        obs, rewards, terminals, truncates = jax.experimental.io_callback(
            pool.step, out_shapes, actions, ordered=True)
        return state, obs, rewards, terminals, truncates

    # The evaluator needs its own instance so eval episodes can't clobber
    # the training pool's episode state (same reason _HostPool has fresh).
    # Some external sims cannot be instantiated twice in one process (Isaac
    # owns the GPU context) — pass share_sim=True to fall back to sharing,
    # accepting that evals truncate in-flight training episodes.
    fresh = (None if share_sim else
             lambda: make_isaac_env(sim_fn, env_name=env_name, spec=spec,
                                    share_sim=share_sim))
    return EnvDef(spec=spec, init=init, obs=None, step=step, batched=True,
                  fresh=fresh, host_pool=pool)


class IsaacVecEnv:
    """Reference-shaped stateful adapter (PlanIsaacGymEnv.py:41-110): the
    six protocol attributes + ``reset()/step()`` over an external batched
    sim, for interactive use and ``get_gym_env_args``.  Training should use
    :func:`make_isaac_env` (functional, fuses into the runtime)."""

    def __init__(self, sim_fn: Callable[[], Any],
                 env_name: str = 'IsaacVecTask'):
        self.pool = ExternalSimPool(sim_fn)
        sim = self.pool._ensure()
        (self.num_envs, self.state_dim, self.action_dim,
         self.if_discrete, self.max_step) = _sim_dims(sim)
        self.env_name = env_name

    def reset(self):
        obs = self.pool.reset_all(np.int32(self.num_envs))
        return obs, {}

    def step(self, actions):
        obs, rewards, terminals, truncates = self.pool.step(
            np.asarray(actions))
        return obs, rewards, terminals, truncates, {}


def load_isaac_task(task_name: str, env_num: Optional[int] = None,
                    **task_kwargs) -> EnvDef:
    """Build an EnvDef over a real Isaac Gym task, when the CUDA-only
    ``isaacgymenvs`` package is installed (reference IsaacVecEnv's role,
    PlanIsaacGymEnv.py:41; its ``env_num`` override becomes the
    ``num_envs`` kwarg here).  Raises :class:`SimUnavailable` otherwise —
    same optional-import discipline as ``rlsolver/exact.py``."""
    try:
        import isaacgymenvs  # noqa: F401
    except ImportError as e:
        raise SimUnavailable(
            "isaacgymenvs is not installed (CUDA-only; not available in "
            "this image). Wrap your own batched simulator with "
            "make_isaac_env(sim_fn) instead — any object with "
            "reset()/step() over whole-batch tensors works.") from e

    def sim_fn():
        kwargs = dict(task_kwargs)
        if env_num is not None:
            kwargs['num_envs'] = env_num
        return isaacgymenvs.make(task=task_name, **kwargs)

    return make_isaac_env(sim_fn, env_name=f'Isaac:{task_name}')
