"""QMIX: cooperative multi-agent Q-learning with monotonic mixing.

The capability the reference's ``MAgentQMix.py`` describes (per-agent Q
networks + a hypernetwork mixing monotonically into Q_tot; the file is
vestigial — its imports don't exist, SURVEY.md §2.2), TPU-native:

- parameter-shared per-agent Q MLP over local obs, evaluated for all agents
  of all envs in one batched matmul;
- mixing network: Q_tot = |w2(s)| . elu(|w1(s)| . q_agents + b1(s)) + b2(s)
  — absolute hypernetwork weights give the QMIX monotonicity guarantee;
- epsilon-greedy team exploration, a transition REPLAY RING (time-major
  ``(capacity, N, ...)`` pytree, like the single-agent ReplayBuffer) with
  uniform minibatch sampling and double-Q targets — training only on the
  freshest rollout measurably collapses the monotonic mixer after ~100
  rounds (eval avgR 3.7 -> -19) while replay keeps it stable;
- the whole round (rollout + insert + G SGD steps) is one jitted program.

(The reference file also describes RNN agents and TD-lambda targets; here
agents are MLPs with 1-step targets — :mod:`.qmix_rnn` provides that
recurrent + TD(λ) capability.)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.nets import mlp_apply, mlp_init, soft_update
from .env import MultiAgentEnvDef


class QMixParams(NamedTuple):
    agent_q: list      # obs -> per-action Q
    hyper_w1: list     # state -> (M * mix_dim)
    hyper_b1: list     # state -> mix_dim
    hyper_w2: list     # state -> mix_dim
    hyper_b2: list     # state -> 1


class QMixState(NamedTuple):
    params: QMixParams
    target: QMixParams
    opt: tuple


def make_qmix(env: MultiAgentEnvDef, net_dims=(64, 64), mix_dim: int = 32,
              gamma: float = 0.99, lr: float = 5e-4, tau: float = 5e-3,
              explore_rate: float = 0.2, mixer: str = 'qmix',
              buffer_len: int = 512, batch_size: int = 1024,
              grad_steps: int = 4):
    """mixer='qmix' (monotonic hypernetwork) or 'vdn' (additive mixing —
    the reference's MAgentVDN capability, VDN = sum of agent Qs).
    ``buffer_len`` is the replay capacity along the time axis (each slot
    holds one transition for every env)."""
    assert env.if_discrete
    assert mixer in ('qmix', 'vdn')
    M, A = env.num_agents, env.action_dim
    optimizer = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))

    def init(key) -> QMixState:
        ks = jax.random.split(key, 5)
        # small hypernet init: |w1|,|w2| start near-uniform and b2 near 0,
        # so early Q_tot ~ mean of agent Qs; large initial state-conditioned
        # weights let the mixer fit targets through b2(s) alone, starving
        # the agent nets of gradient (measured: eval collapses to ~-15)
        params = QMixParams(
            agent_q=mlp_init(ks[0], (env.obs_dim, *net_dims, A), out_std=0.1),
            hyper_w1=mlp_init(ks[1], (env.state_dim, M * mix_dim), out_std=0.05),
            hyper_b1=mlp_init(ks[2], (env.state_dim, mix_dim), out_std=0.05),
            hyper_w2=mlp_init(ks[3], (env.state_dim, mix_dim), out_std=0.05),
            hyper_b2=mlp_init(ks[4], (env.state_dim, 1), out_std=0.05),
        )
        return QMixState(params, jax.tree.map(jnp.copy, params),
                         optimizer.init(params))

    def agent_qs(p: QMixParams, obs):
        """obs (..., M, O) -> (..., M, A)."""
        return mlp_apply(p.agent_q, obs)

    def mix(p: QMixParams, q_taken, gs):
        """q_taken (..., M), gs (..., S) -> Q_tot (...)."""
        if mixer == 'vdn':
            return jnp.sum(q_taken, axis=-1)
        w1 = jnp.abs(mlp_apply(p.hyper_w1, gs)).reshape(gs.shape[:-1] + (M, mix_dim))
        b1 = mlp_apply(p.hyper_b1, gs)
        w2 = jnp.abs(mlp_apply(p.hyper_w2, gs))
        b2 = mlp_apply(p.hyper_b2, gs)[..., 0]
        h = jax.nn.elu(jnp.einsum('...m,...md->...d', q_taken, w1) + b1)
        return jnp.sum(h * w2, axis=-1) + b2

    def init_buffer(num_envs: int):
        """Replay ring: time-major (buffer_len, N, ...) pytree + ptr/size."""
        def z(shape, dtype=jnp.float32):
            return jnp.zeros((buffer_len, num_envs) + shape, dtype)
        data = (z((M, env.obs_dim)), z((env.state_dim,)),
                z((M,), jnp.int32), z(()), z(()),
                z((M, env.obs_dim)), z((env.state_dim,)))
        return (data, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    @partial(jax.jit, static_argnums=(4, 5))
    def train_round(state: QMixState, env_states, buffer, key,
                    num_envs: int, horizon: int):
        k_roll, key = jax.random.split(key)

        def roll(carry, kt):
            env_states = carry
            ka, ke, kr, kg = jax.random.split(kt, 4)
            obs = jax.vmap(env.obs)(env_states)              # (N, M, O)
            gs = jax.vmap(env.global_state)(env_states)
            q = agent_qs(state.params, obs)                  # (N, M, A)
            greedy = jnp.argmax(q, axis=-1)
            rand = jax.random.randint(kg, greedy.shape, 0, A)
            coin = jax.random.uniform(ka, greedy.shape) < explore_rate
            actions = jnp.where(coin, rand, greedy)
            new_states, reward, terminal, truncate = jax.vmap(env.step)(
                env_states, actions, jax.random.split(ke, num_envs))
            done = terminal | truncate
            fresh = jax.vmap(env.init)(jax.random.split(kr, num_envs))
            env_states = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
                fresh, new_states)
            next_gs = jax.vmap(env.global_state)(env_states)
            next_obs = jax.vmap(env.obs)(env_states)
            return env_states, (obs, gs, actions, reward,
                                1.0 - done.astype(jnp.float32),
                                next_obs, next_gs)

        env_states, batch = jax.lax.scan(
            roll, env_states, jax.random.split(k_roll, horizon))

        '''insert the rollout into the replay ring'''
        data, ptr, size = buffer
        idx = (ptr + jnp.arange(horizon, dtype=jnp.int32)) % buffer_len
        data = jax.tree.map(lambda buf, new: buf.at[idx].set(new), data, batch)
        ptr = (ptr + horizon) % buffer_len
        size = jnp.minimum(size + horizon, buffer_len)
        buffer = (data, ptr, size)

        '''G uniform-minibatch SGD steps over the ring'''
        def sgd(carry, kt):
            params, target, opt = carry
            ids = jax.random.randint(kt, (batch_size,), 0, size * num_envs)
            t_ids, n_ids = ids % size, ids // size
            obs, gs, acts, r, u, nobs, ngs = jax.tree.map(
                lambda buf: buf[t_ids, n_ids], data)

            # double-Q target: actions argmaxed by the ONLINE net, valued by
            # the target net (plain max targets overestimate and measurably
            # collapse the monotonic mixer here)
            n_act = jnp.argmax(agent_qs(params, nobs), axis=-1)   # (B, M)
            nq = agent_qs(target, nobs)
            n_taken = jnp.take_along_axis(nq, n_act[..., None], -1)[..., 0]
            target_tot = r + gamma * u * mix(target, n_taken, ngs)

            def loss_fn(p):
                q = agent_qs(p, obs)
                taken = jnp.take_along_axis(q, acts[..., None], -1)[..., 0]
                tot = mix(p, taken, gs)
                return jnp.mean(optax.huber_loss(tot, target_tot))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = optimizer.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            target = soft_update(target, params, tau)
            return (params, target, opt), loss

        (params, target, opt), losses = jax.lax.scan(
            sgd, (state.params, state.target, state.opt),
            jax.random.split(key, grad_steps))
        return (QMixState(params, target, opt), env_states, buffer,
                jnp.mean(losses))

    @partial(jax.jit, static_argnums=2)
    def evaluate(state: QMixState, key, num_episodes: int = 16):
        env_states = jax.vmap(env.init)(jax.random.split(key, num_episodes))

        def body(carry, kt):
            env_states, done, ret = carry
            obs = jax.vmap(env.obs)(env_states)
            a = jnp.argmax(agent_qs(state.params, obs), axis=-1)
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

    return init, init_buffer, train_round, evaluate


def train_qmix(env: MultiAgentEnvDef, num_envs: int = 32, horizon: int = 64,
               num_rounds: int = 100, seed: int = 0, verbose: bool = True,
               mixer: str = 'qmix'):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    init, init_buffer, train_round, evaluate = make_qmix(env, mixer=mixer)
    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)
    state = init(k1)
    env_states = jax.vmap(env.init)(jax.random.split(k2, num_envs))
    buffer = init_buffer(num_envs)
    history = []
    for i in range(num_rounds):
        key, sub = jax.random.split(key)
        state, env_states, buffer, loss = train_round(
            state, env_states, buffer, sub, num_envs, horizon)
        if (i + 1) % max(1, num_rounds // 8) == 0:
            score = float(evaluate(state, jax.random.key(7000 + i)))
            history.append(score)
            if verbose:
                print(f"| qmix round {i + 1}: eval avgR {score:9.3f}", flush=True)
    return state, history
