"""MADDPG: multi-agent DDPG with a centralized joint critic.

The capability the reference's ``MAgentMADDPG.py`` describes (per-agent
deterministic actors trained against a critic over the joint
state+all-actions; that file uses a pre-2022 API and does not run —
SURVEY.md §2.2), TPU-native:

- parameter-shared deterministic tanh actors over local observations with
  Gaussian exploration noise;
- one centralized critic Q(global_state, all_actions) on the shared team
  reward (the cooperative special case of MADDPG's per-agent critics);
- replay ring over joint transitions, soft target updates, and the whole
  explore+TD+policy round as one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.nets import mlp_apply, mlp_init, soft_update
from .env import MultiAgentEnvDef


class MADDPGState(NamedTuple):
    actor: list
    actor_target: list
    critic: list
    critic_target: list
    a_opt: tuple
    c_opt: tuple
    buf: tuple          # (obs, gs, acts, rew, undone, next_obs, next_gs, ptr, size)
    env_states: object


def make_maddpg(env: MultiAgentEnvDef, net_dims=(128, 128),
                gamma: float = 0.97, lr: float = 5e-4, tau: float = 5e-3,
                explore_noise: float = 0.1, buf_size: int = 50_000,
                batch_size: int = 256, num_envs: int = 16):
    assert not env.if_discrete
    M, A = env.num_agents, env.action_dim
    joint_a = M * A
    optimizer = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))

    def init(key) -> MADDPGState:
        k1, k2, k3 = jax.random.split(key, 3)
        actor = mlp_init(k1, (env.obs_dim, *net_dims, A), out_std=0.1)
        critic = mlp_init(k2, (env.state_dim + joint_a, *net_dims, 1),
                          out_std=0.5)
        m = buf_size
        buf = (jnp.zeros((m, num_envs, M, env.obs_dim)),
               jnp.zeros((m, num_envs, env.state_dim)),
               jnp.zeros((m, num_envs, M, A)),
               jnp.zeros((m, num_envs)),
               jnp.zeros((m, num_envs)),
               jnp.zeros((m, num_envs, M, env.obs_dim)),
               jnp.zeros((m, num_envs, env.state_dim)),
               jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        env_states = jax.vmap(env.init)(jax.random.split(k3, num_envs))
        return MADDPGState(actor, jax.tree.map(jnp.copy, actor),
                           critic, jax.tree.map(jnp.copy, critic),
                           optimizer.init(actor), optimizer.init(critic),
                           buf, env_states)

    def act(actor, obs):
        return jnp.tanh(mlp_apply(actor, obs))      # (..., M, A)

    def q_joint(critic, gs, joint_actions):
        x = jnp.concatenate([gs, joint_actions.reshape(gs.shape[:-1] + (joint_a,))],
                            axis=-1)
        return mlp_apply(critic, x)[..., 0]

    @partial(jax.jit, static_argnums=(2, 3))
    def train_round(state: MADDPGState, key, horizon: int = 64,
                    repeat: int = 1):
        k_roll, k_upd = jax.random.split(key)

        def roll(carry, kt):
            env_states = carry
            ka, ke, kr = jax.random.split(kt, 3)
            obs = jax.vmap(env.obs)(env_states)
            gs = jax.vmap(env.global_state)(env_states)
            a = act(state.actor, obs)
            a = jnp.clip(a + explore_noise * jax.random.normal(ka, a.shape),
                         -1.0, 1.0)
            new_states, reward, terminal, truncate = jax.vmap(env.step)(
                env_states, a, jax.random.split(ke, num_envs))
            done = terminal | truncate
            fresh = jax.vmap(env.init)(jax.random.split(kr, num_envs))
            env_states = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
                fresh, new_states)
            nobs = jax.vmap(env.obs)(env_states)
            ngs = jax.vmap(env.global_state)(env_states)
            return env_states, (obs, gs, a, reward,
                                1.0 - done.astype(jnp.float32), nobs, ngs)

        env_states, items = jax.lax.scan(
            roll, state.env_states, jax.random.split(k_roll, horizon))

        bO, bG, bA, bR, bU, bNO, bNG, ptr, size = state.buf
        idx = (ptr + jnp.arange(horizon)) % buf_size
        buf = (bO.at[idx].set(items[0]), bG.at[idx].set(items[1]),
               bA.at[idx].set(items[2]), bR.at[idx].set(items[3]),
               bU.at[idx].set(items[4]), bNO.at[idx].set(items[5]),
               bNG.at[idx].set(items[6]),
               (ptr + horizon) % buf_size,
               jnp.minimum(size + horizon, buf_size))

        def sgd(carry, kt):
            actor, actor_t, critic, critic_t, a_opt, c_opt = carry
            bO, bG, bA, bR, bU, bNO, bNG, _, size = buf
            ids = jax.random.randint(kt, (batch_size,), 0, size * num_envs)
            i0, i1 = ids % jnp.maximum(size, 1), ids // jnp.maximum(size, 1)
            obs, gs, acts = bO[i0, i1], bG[i0, i1], bA[i0, i1]
            r, u, nobs, ngs = bR[i0, i1], bU[i0, i1], bNO[i0, i1], bNG[i0, i1]

            next_a = act(actor_t, nobs)
            target = r + gamma * u * q_joint(critic_t, ngs, next_a)

            def c_loss(cp):
                return jnp.mean(jnp.square(q_joint(cp, gs, acts) - target))

            _, g = jax.value_and_grad(c_loss)(critic)
            up, c_opt = optimizer.update(g, c_opt, critic)
            critic = optax.apply_updates(critic, up)
            critic_t = soft_update(critic_t, critic, tau)

            def a_loss(ap):
                return -jnp.mean(q_joint(critic, gs, act(ap, obs)))

            _, g = jax.value_and_grad(a_loss)(actor)
            up, a_opt = optimizer.update(g, a_opt, actor)
            actor = optax.apply_updates(actor, up)
            actor_t = soft_update(actor_t, actor, tau)
            return (actor, actor_t, critic, critic_t, a_opt, c_opt), None

        n_upd = max(1, horizon * repeat)
        (actor, actor_t, critic, critic_t, a_opt, c_opt), _ = jax.lax.scan(
            sgd, (state.actor, state.actor_target, state.critic,
                  state.critic_target, state.a_opt, state.c_opt),
            jax.random.split(k_upd, n_upd))
        new = MADDPGState(actor, actor_t, critic, critic_t, a_opt, c_opt,
                          buf, env_states)
        return new, jnp.mean(items[3])

    @partial(jax.jit, static_argnums=2)
    def evaluate(state: MADDPGState, key, num_episodes: int = 16):
        env_states = jax.vmap(env.init)(jax.random.split(key, num_episodes))

        def body(carry, kt):
            env_states, done, ret = carry
            a = act(state.actor, jax.vmap(env.obs)(env_states))
            new_states, reward, terminal, truncate = jax.vmap(env.step)(
                env_states, a, jax.random.split(kt, num_episodes))
            alive = jnp.logical_not(done)
            ret = ret + reward * alive
            env_states = jax.tree.map(
                lambda n, o: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), o, n),
                new_states, env_states)
            done = done | terminal | truncate
            return (env_states, done, ret), None

        init_c = (env_states, jnp.zeros(num_episodes, jnp.bool_),
                  jnp.zeros(num_episodes))
        (_, _, ret), _ = jax.lax.scan(
            body, init_c, jax.random.split(key, env.max_step))
        return ret.mean()

    return init, train_round, evaluate


def train_maddpg(env: MultiAgentEnvDef, num_envs: int = 16,
                 num_rounds: int = 80, seed: int = 0, verbose: bool = True):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    init, train_round, evaluate = make_maddpg(env, num_envs=num_envs)
    key = jax.random.key(seed)
    k1, key = jax.random.split(key)
    state = init(k1)
    history = []
    for i in range(num_rounds):
        key, sub = jax.random.split(key)
        state, exp_r = train_round(state, sub)
        if (i + 1) % max(1, num_rounds // 8) == 0:
            score = float(evaluate(state, jax.random.key(8000 + i)))
            history.append(score)
            if verbose:
                print(f"| maddpg round {i + 1}: eval avgR {score:9.3f}", flush=True)
    return state, history
