"""Environment protocol: pure functions over state pytrees.

The reference defines a duck-typed stateful env protocol — attributes
``env_name num_envs max_step state_dim action_dim if_discrete`` plus
``reset() -> (state, info)`` and ``step(a) -> (state, r, terminal, truncate,
info)`` (reference ``elegantrl/train/config.py:134-135, 147-206``).  Its
vectorized envs auto-reset sub-envs on done inside ``step``
(``PointChasingEnv.py:163-166``, ``StockTradingEnv.py:311``).

TPU-native redesign: an env is a triple of pure functions over an (unbatched)
state pytree.  Vectorization is ``jax.vmap``; auto-reset is a masked
``jnp.where`` select; randomness is explicit key threading.  Thousands of
instances step in lockstep inside ``jit``/``lax.scan`` — this is the
replacement for both the reference's process ``VecEnv`` and its GPU tensor
envs.

A thin stateful :class:`VecEnv` adapter provides the reference-style
``reset/step`` API for interactive use; the training runner uses the
functional ``vec_reset`` / ``vec_step`` directly so the whole rollout fuses
into one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

EnvState = Any  # pytree
PRNGKey = jax.Array


class EnvSpec(NamedTuple):
    """The six protocol attributes every reference env exposes."""
    env_name: str
    num_envs: int
    max_step: int
    state_dim: int
    action_dim: int
    if_discrete: bool


class EnvDef(NamedTuple):
    """A pure-functional environment definition (single instance).

    init: key -> env_state
    obs:  env_state -> (state_dim,) observation
    step: (env_state, action, key) -> (env_state', reward, terminal, truncate)

    ``step`` must be traceable with static shapes; episode-end handling
    (auto-reset) is applied by :func:`vec_step`, not by ``step`` itself.
    """
    spec: EnvSpec
    init: Callable[[PRNGKey], EnvState]
    obs: Callable[[EnvState], jax.Array]
    step: Callable[[EnvState, jax.Array, PRNGKey], Tuple[EnvState, jax.Array, jax.Array, jax.Array]]
    # optional: episode-return override read at episode end (the reference
    # evaluator prefers ``env.cumulative_returns`` when present,
    # evaluator.py:195-196) — e.g. the stock env's cumulative return
    episode_return: Any = None
    # batched=True: init/step operate on the WHOLE batch themselves
    # (host-callback envs, envs/host_env.py) —
    #   init(key, num_envs) -> (state, obs)
    #   step(state, actions, key) -> (state, obs, rewards, terminals, truncates)
    batched: bool = False
    # optional () -> EnvDef factory producing an INDEPENDENT instance.  Pure
    # envs are stateless so sharing is free; host-callback envs own a
    # stateful pool, and the evaluator must not reset/resize the training
    # pool mid-run — it builds its own instance through this.
    fresh: Any = None
    # host-callback envs only: the stateful pool itself.  Lets the runner and
    # evaluator collect whole rollouts host-side (CPU-backend inference +
    # direct pool stepping) instead of paying one device round-trip per step
    # through ordered io_callback — see train/runner.py host-rollout mode.
    host_pool: Any = None
    # optional instance-specific fused-rollout kernel body
    # (``ops/pallas_rollout.py:KernelEnvBody``) for envs whose body depends
    # on construction parameters/data (e.g. StockTrading's market tables);
    # parameter-free envs register in KERNEL_ENV_BODIES instead.
    kernel_body: Any = None


def vec_reset(env: EnvDef, key: PRNGKey, num_envs: int) -> Tuple[EnvState, jax.Array]:
    """Initialise ``num_envs`` instances; returns (batched_state, obs)."""
    if env.batched:
        return env.init(key, num_envs)
    keys = jax.random.split(key, num_envs)
    state = jax.vmap(env.init)(keys)
    obs = jax.vmap(env.obs)(state)
    return state, obs


def vec_step(env: EnvDef, state: EnvState, actions: jax.Array, key: PRNGKey
             ) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Step all instances and auto-reset the done ones.

    Returns ``(state', obs', rewards, terminals, truncates)`` where ``obs'``
    observes the post-reset state for done instances — the same contract as
    the reference's vectorized envs, which return the reset state from
    ``step`` (``PointChasingEnv.py:163-172``).
    """
    if env.batched:
        return env.step(state, actions, key)
    num_envs = jax.tree.leaves(state)[0].shape[0]
    key_step, key_reset = jax.random.split(key)
    step_keys = jax.random.split(key_step, num_envs)
    reset_keys = jax.random.split(key_reset, num_envs)

    def one(s, a, ks, kr):
        s2, reward, terminal, truncate = env.step(s, a, ks)
        done = jnp.logical_or(terminal, truncate)
        fresh = env.init(kr)
        s3 = jax.tree.map(lambda new, old: jnp.where(
            jnp.reshape(done, (1,) * jnp.ndim(old)), new, old), fresh, s2)
        return s3, env.obs(s3), reward, terminal, truncate

    state, obs, rewards, terminals, truncates = jax.vmap(one)(
        state, actions, step_keys, reset_keys)
    return state, obs, rewards, terminals, truncates


class VecEnv:
    """Stateful adapter exposing the reference env protocol over an
    :class:`EnvDef`.  Holds (state, key) on the host between calls; each
    ``step`` is one jitted device call.  For training use the functional API —
    the runner threads env state through ``lax.scan`` instead.
    """

    def __init__(self, env_def: EnvDef, num_envs: int = None, seed: int = 0):
        self._def = env_def
        spec = env_def.spec
        if num_envs is not None:
            spec = spec._replace(num_envs=num_envs)
        self.spec = spec
        self.env_name = spec.env_name
        self.num_envs = spec.num_envs
        self.max_step = spec.max_step
        self.state_dim = spec.state_dim
        self.action_dim = spec.action_dim
        self.if_discrete = spec.if_discrete

        self._key = jax.random.key(seed)
        self._state = None
        self._jit_reset = jax.jit(lambda k: vec_reset(env_def, k, self.num_envs))
        self._jit_step = jax.jit(lambda s, a, k: vec_step(env_def, s, a, k))

    def reset(self, **_kwargs):
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._jit_reset(sub)
        return obs, {}

    def step(self, actions):
        self._key, sub = jax.random.split(self._key)
        self._state, obs, rewards, terminals, truncates = self._jit_step(
            self._state, jnp.asarray(actions), sub)
        return obs, rewards, terminals, truncates, {}
