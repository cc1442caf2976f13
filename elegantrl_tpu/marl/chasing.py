"""Cooperative team-chasing env: M chasers corner one random walker.

Multi-agent analog of the single-agent ``PointChasingEnv`` (reference
``elegantrl/envs/PointChasingEnv.py``) in the pursuit style of the MAgent
tasks the reference's multi-agent files target.  Shared team reward =
decrease of the CLOSEST chaser's distance (cooperation: only the best-placed
agent's progress counts, so agents must spread and herd) minus action costs;
terminal when any chaser gets within the capture radius.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .env import MultiAgentEnvDef

_MAX_STEP = 256
_INIT_DISTANCE = 6.0


class TeamChaseState(NamedTuple):
    target_p: jax.Array   # (dim,)
    target_v: jax.Array   # (dim,)
    chaser_p: jax.Array   # (M, dim)
    chaser_v: jax.Array   # (M, dim)
    min_dist: jax.Array   # ()
    t: jax.Array          # ()


def make_team_chasing(num_agents: int = 3, dim: int = 2) -> MultiAgentEnvDef:
    capture_radius = float(dim)

    def init(key) -> TeamChaseState:
        k1, k2 = jax.random.split(key)
        target_p = jax.random.normal(k1, (dim,))
        chaser_p = jax.random.normal(k2, (num_agents, dim)) - _INIT_DISTANCE
        min_dist = jnp.min(jnp.linalg.norm(target_p - chaser_p, axis=-1))
        return TeamChaseState(target_p, jnp.zeros(dim), chaser_p,
                              jnp.zeros((num_agents, dim)), min_dist,
                              jnp.zeros((), jnp.int32))

    def obs(s: TeamChaseState) -> jax.Array:
        """Per-agent: [own p, own v, target rel p, target v, teammates rel p]."""
        rel_target = s.target_p[None] - s.chaser_p           # (M, dim)
        team_center = jnp.mean(s.chaser_p, axis=0)
        rel_team = team_center[None] - s.chaser_p            # (M, dim)
        return jnp.concatenate([
            s.chaser_p, s.chaser_v, rel_target,
            jnp.broadcast_to(s.target_v[None], (num_agents, dim)), rel_team,
        ], axis=-1)                                          # (M, 5*dim)

    def global_state(s: TeamChaseState) -> jax.Array:
        return jnp.concatenate([
            s.target_p, s.target_v,
            s.chaser_p.reshape(-1), s.chaser_v.reshape(-1)])

    def step(s: TeamChaseState, actions, key):
        a_norm = jnp.maximum(jnp.linalg.norm(actions, axis=-1, keepdims=True), 1.0)
        a = actions / a_norm

        chaser_v = s.chaser_v * 0.75 + a
        chaser_p = s.chaser_p + chaser_v * 0.02

        target_v = s.target_v * 0.5 + jax.random.uniform(key, (dim,))
        target_p = s.target_p + target_v * 0.02

        dists = jnp.linalg.norm(target_p[None] - chaser_p, axis=-1)
        min_dist = jnp.min(dists)
        reward = (s.min_dist - min_dist
                  - 0.01 * jnp.mean(jnp.squeeze(a_norm, -1)))
        t = s.t + 1
        terminal = jnp.logical_or(min_dist < capture_radius, t >= _MAX_STEP)
        new = TeamChaseState(target_p, target_v, chaser_p, chaser_v,
                             min_dist, t)
        return new, reward, terminal, jnp.zeros((), jnp.bool_)

    return MultiAgentEnvDef(
        env_name='TeamChasingEnv', num_agents=num_agents, obs_dim=5 * dim,
        state_dim=2 * dim + 2 * num_agents * dim, action_dim=dim,
        if_discrete=False, max_step=_MAX_STEP,
        init=init, obs=obs, global_state=global_state, step=step)


def make_team_chasing_discrete(num_agents: int = 3, dim: int = 2) -> MultiAgentEnvDef:
    """Discrete-action variant: per-agent 3^dim action grid mapping each
    base-3 digit to {-1, 0, +1} (same encoding as the single-agent
    PointChasingDiscreteEnv, reference PointChasingEnv.py:185-210)."""
    cont = make_team_chasing(num_agents, dim)

    def step(s, actions, key):
        digits = (actions[:, None] // (3 ** jnp.arange(dim))) % 3
        cont_actions = digits.astype(jnp.float32) - 1.0
        return cont.step(s, cont_actions, key)

    return cont._replace(env_name='TeamChasingDiscreteEnv',
                         action_dim=3 ** dim, if_discrete=True, step=step)
