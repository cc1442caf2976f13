"""Ready-made host-env factories for the reference's gym benchmark suites.

The pure-JAX re-derivations (``lunar_lander.py``, ``hopper.py``) carry the
throughput story; these factories put the REAL Box2D / MuJoCo physics inside
the same fused training loop via :mod:`.host_env`, covering the parity cases
the reference reaches through ``gym.make``
(``elegantrl/train/config.py:118-136`` and
``examples/demo_DDPG_TD3_SAC.py:173`` LunarLanderContinuous,
``README.md:153`` Hopper):

    env = gym_env_def('LunarLanderContinuous-v3')
    args = Config(AgentModSAC, env, get_env_args(env))

Requires gymnasium (+ Box2D / mujoco per env) on the host; imports lazily
and raises a clean error when absent.
"""

from __future__ import annotations

from .base import EnvDef, EnvSpec
from .host_env import make_host_env


def _require_gym():
    try:
        import gymnasium
        return gymnasium
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gymnasium is required for host-env physics parity; the pure-JAX "
            "envs (PendulumEnv, LunarLanderEnv, HopperEnv, ...) need no extra "
            "packages.") from e


def _resolve_env_id(gym, env_id: str) -> str:
    """Accept version-less or stale-version ids (the reference targets
    gymnasium ~0.29's '-v2'; this image ships newer '-v3' Box2D envs)."""
    registry = gym.envs.registry
    if env_id in registry:
        return env_id
    base = env_id.rsplit('-v', 1)[0]
    versions = sorted(
        (int(k.rsplit('-v', 1)[1]), k) for k in registry
        if k.rsplit('-v', 1)[0] == base and '-v' in k)
    if versions:
        return versions[-1][1]
    return env_id  # let gym.make raise its own error


def gym_env_def(env_id: str, seed: int = 0, num_threads: int = 0,
                **make_kwargs) -> EnvDef:
    """Wrap any gymnasium env id as a batched EnvDef for the fused loop
    (reference ``build_env`` special-cases ``gym.make`` the same way,
    config.py:124-129).  ``num_threads``: step the pool on threads — use for
    envs whose C core releases the GIL (MuJoCo)."""
    gym = _require_gym()
    env_id = _resolve_env_id(gym, env_id)
    probe = gym.make(env_id, **make_kwargs)
    try:
        if_discrete = isinstance(probe.action_space, gym.spaces.Discrete)
        action_dim = (int(probe.action_space.n) if if_discrete
                      else int(probe.action_space.shape[0]))
        state_dim = int(probe.observation_space.shape[0])
        max_step = int(getattr(probe, '_max_episode_steps', 1000) or 1000)
    finally:
        probe.close()
    spec = EnvSpec(env_name=env_id, num_envs=1, max_step=max_step,
                   state_dim=state_dim, action_dim=action_dim,
                   if_discrete=if_discrete)
    return make_host_env(lambda: gym.make(env_id, **make_kwargs), spec,
                         seed=seed, num_threads=num_threads)


def get_env_args(env: EnvDef, num_envs: int = 1) -> dict:
    """Config env_args dict for an EnvDef (mirrors ``get_gym_env_args``)."""
    s = env.spec
    return {'env_name': s.env_name, 'num_envs': num_envs,
            'max_step': s.max_step, 'state_dim': s.state_dim,
            'action_dim': s.action_dim, 'if_discrete': s.if_discrete}


def gym_lunar_lander_continuous(seed: int = 0) -> EnvDef:
    """Real Box2D LunarLanderContinuous (reference demo_DDPG_TD3_SAC.py:173)."""
    return gym_env_def('LunarLanderContinuous-v3', seed=seed)


def gym_lunar_lander(seed: int = 0) -> EnvDef:
    """Real Box2D discrete LunarLander (reference demo_A2C_PPO_discrete.py)."""
    return gym_env_def('LunarLander-v3', seed=seed)


def gym_hopper(seed: int = 0, num_threads: int = 8) -> EnvDef:
    """Real MuJoCo Hopper (reference README.md:153 Hopper-v2 benchmark).
    Threaded by default: MuJoCo's ``mj_step`` releases the GIL."""
    return gym_env_def('Hopper-v5', seed=seed, num_threads=num_threads)
