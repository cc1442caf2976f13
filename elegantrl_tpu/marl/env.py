"""Multi-agent environment protocol (CTDE layout).

The reference's multi-agent code (MAgentMAPPO/MADDPG/QMix/VDN) is vestigial
— it imports modules that do not exist in the snapshot (SURVEY.md §2.2).
This subpackage provides a WORKING multi-agent capability in the same
centralized-training / decentralized-execution shape those files describe:

- per-agent local observations ``(num_agents, obs_dim)`` feed decentralized
  actors (parameter-shared);
- a global state ``(state_dim,)`` feeds the centralized critic;
- a shared team reward.

Pure functions over a state pytree, exactly like :class:`envs.base.EnvDef`.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple


class MultiAgentEnvDef(NamedTuple):
    """Single-instance pure functions; vectorization is vmap.

    init: key -> env_state
    obs: env_state -> (num_agents, obs_dim) local observations
    global_state: env_state -> (state_dim,) centralized-critic input
    step: (env_state, actions (num_agents, action_dim), key)
          -> (env_state', reward (), terminal (), truncate ())
    """
    env_name: str
    num_agents: int
    obs_dim: int
    state_dim: int
    action_dim: int
    if_discrete: bool
    max_step: int
    init: Callable
    obs: Callable
    global_state: Callable
    step: Callable
