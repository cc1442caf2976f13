"""Recurrent QMIX: GRU agent networks + TD(λ) targets over sequences.

The reference's ``MAgentQMix.py`` describes RNN agent networks
(``rnn_hidden_dim``, reference MAgentQMix.py:26-199) and TD(λ) targets
(``td_lambda``); its code is vestigial — the modules it imports are absent
from the snapshot (SURVEY.md §2.2).  ``marl/qmix.py`` covers the MLP /
1-step-target path; this module adds the recurrent + TD(λ) capability the
reference only names, TPU-first:

- one parameter-shared GRU Q-network applied over the agent axis — the
  cell is three fused ``(emb+hid, hid)`` matmuls batched over
  ``envs*agents`` (see :mod:`.mappo_rnn`), so the time loop is a
  ``lax.scan`` whose body is MXU-shaped;
- a SEQUENCE replay ring: each slot stores one whole rollout round
  ``(horizon+1, N, ...)`` plus the round-initial hidden state, so updates
  re-scan the GRU from true stored hiddens with episode-boundary resets
  replayed from the stored undone mask — no stale-hidden approximation
  (the PyMARL episode-buffer pattern, batched);
- **TD(λ) targets** computed by a reverse ``lax.scan`` over the mixed
  target values: ``y_t = r_t + γ u_t ((1-λ) Q̄_tot(t+1) + λ y_{t+1})``
  with ``y_H = Q̄_tot(H)`` bootstrap — λ=0 recovers the 1-step targets of
  :mod:`.qmix`, λ→1 approaches Monte-Carlo;
- double-Q action selection (online argmax, target value) and the same
  monotonic |hypernetwork| mixer as :mod:`.qmix`;
- the whole round (rollout + insert + G sequence-BPTT SGD steps) is one
  jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.nets import mlp_apply, mlp_init, soft_update
from .env import MultiAgentEnvDef
from .mappo_rnn import gru_init, gru_step


class QMixRnnParams(NamedTuple):
    emb: list          # obs -> hid embedding
    gru: dict          # GRU cell
    head: list         # hid -> per-action Q
    hyper_w1: list     # state -> (M * mix_dim)
    hyper_b1: list     # state -> mix_dim
    hyper_w2: list     # state -> mix_dim
    hyper_b2: list     # state -> 1


class QMixRnnState(NamedTuple):
    params: QMixRnnParams
    target: QMixRnnParams
    opt: tuple


def make_qmix_rnn(env: MultiAgentEnvDef, hid: int = 64, mix_dim: int = 32,
                  gamma: float = 0.99, lam: float = 0.6, lr: float = 5e-4,
                  tau: float = 5e-3, explore_rate: float = 0.2,
                  mixer: str = 'qmix', slots: int = 8,
                  seq_batch: int = 16, grad_steps: int = 2):
    """``slots`` is the sequence-replay capacity in whole rollout rounds;
    ``seq_batch`` env sequences are BPTT'd per SGD step; ``lam`` is the
    TD(λ) mixing coefficient (0 = 1-step, →1 = Monte-Carlo)."""
    assert env.if_discrete
    assert mixer in ('qmix', 'vdn')
    M, A = env.num_agents, env.action_dim
    optimizer = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))

    def init(key) -> QMixRnnState:
        ks = jax.random.split(key, 7)
        # same small-hypernet init rationale as qmix.py: early Q_tot ≈ mean
        # of agent Qs so the agent nets get gradient from round one
        params = QMixRnnParams(
            emb=mlp_init(ks[0], (env.obs_dim, hid)),
            gru=gru_init(ks[1], hid, hid),
            head=mlp_init(ks[2], (hid, A), out_std=0.1),
            hyper_w1=mlp_init(ks[3], (env.state_dim, M * mix_dim), out_std=0.05),
            hyper_b1=mlp_init(ks[4], (env.state_dim, mix_dim), out_std=0.05),
            hyper_w2=mlp_init(ks[5], (env.state_dim, mix_dim), out_std=0.05),
            hyper_b2=mlp_init(ks[6], (env.state_dim, 1), out_std=0.05),
        )
        return QMixRnnState(params, jax.tree.map(jnp.copy, params),
                            optimizer.init(params))

    def q_cell(p: QMixRnnParams, h, obs):
        """One recurrent Q step. obs (..., M, O), h (..., M, hid)."""
        x = jnp.tanh(mlp_apply(p.emb, obs))
        h2 = gru_step(p.gru, h, x)
        return h2, mlp_apply(p.head, h2)            # (..., M, A)

    def mix(p: QMixRnnParams, q_taken, gs):
        """q_taken (..., M), gs (..., S) -> Q_tot (...)."""
        if mixer == 'vdn':
            return jnp.sum(q_taken, axis=-1)
        w1 = jnp.abs(mlp_apply(p.hyper_w1, gs)).reshape(
            gs.shape[:-1] + (M, mix_dim))
        b1 = mlp_apply(p.hyper_b1, gs)
        w2 = jnp.abs(mlp_apply(p.hyper_w2, gs))
        b2 = mlp_apply(p.hyper_b2, gs)[..., 0]
        h = jax.nn.elu(jnp.einsum('...m,...md->...d', q_taken, w1) + b1)
        return jnp.sum(h * w2, axis=-1) + b2

    def init_buffer(num_envs: int, horizon: int):
        """Sequence ring: (slots, horizon[+1], N, ...) pytree + ptr/size."""
        def z(lead, shape, dtype=jnp.float32):
            return jnp.zeros((slots, lead, num_envs) + shape, dtype)
        data = (z(horizon + 1, (M, env.obs_dim)),       # OBS incl. final
                z(horizon + 1, (env.state_dim,)),       # GS incl. final
                z(horizon, (M,), jnp.int32),            # actions
                z(horizon, ()),                         # rewards
                z(horizon, ()),                         # undone mask
                jnp.zeros((slots, num_envs, M, hid)))   # round-initial h
        return (data, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    @partial(jax.jit, static_argnums=(5, 6))
    def train_round(state: QMixRnnState, env_states, h0, buffer, key,
                    num_envs: int, horizon: int):
        k_roll, key = jax.random.split(key)

        def roll(carry, kt):
            env_states, h = carry
            ka, ke, kr, kg = jax.random.split(kt, 4)
            obs = jax.vmap(env.obs)(env_states)              # (N, M, O)
            gs = jax.vmap(env.global_state)(env_states)
            h2, q = q_cell(state.params, h, obs)             # (N, M, A)
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
            undone = 1.0 - done.astype(jnp.float32)
            h2 = h2 * undone[:, None, None]   # reset hidden at boundaries
            return (env_states, h2), (obs, gs, actions, reward, undone)

        (env_states, h_end), (OBS, GS, ACT, R, U) = jax.lax.scan(
            roll, (env_states, h0), jax.random.split(k_roll, horizon))
        # append the post-rollout obs/state so sequences carry t = 0..H
        OBS = jnp.concatenate(
            [OBS, jax.vmap(env.obs)(env_states)[None]], axis=0)
        GS = jnp.concatenate(
            [GS, jax.vmap(env.global_state)(env_states)[None]], axis=0)

        '''insert the round into the sequence ring'''
        data, ptr, size = buffer
        data = jax.tree.map(
            lambda buf, new: buf.at[ptr].set(new),
            data, (OBS, GS, ACT, R, U, h0))
        ptr = (ptr + 1) % slots
        size = jnp.minimum(size + 1, slots)
        buffer = (data, ptr, size)

        '''G sequence-BPTT SGD steps over the ring'''
        def sgd(carry, kt):
            params, target, opt = carry
            k_slot, k_env = jax.random.split(kt)
            slot = jax.random.randint(k_slot, (), 0, size)
            ids = jax.random.randint(k_env, (seq_batch,), 0, num_envs)
            obs_s = data[0][slot][:, ids]        # (H+1, B, M, O)
            gs_s = data[1][slot][:, ids]         # (H+1, B, S)
            act_s = data[2][slot][:, ids]        # (H, B, M)
            r_s = data[3][slot][:, ids]          # (H, B)
            u_s = data[4][slot][:, ids]          # (H, B)
            hb0 = data[5][slot][ids]             # (B, M, hid)

            # u entering step t (reset AFTER step t-1's transition)
            u_in = jnp.concatenate(
                [jnp.ones((1,) + u_s.shape[1:]), u_s], axis=0)  # (H+1, B)

            def rescan(p):
                def step(h, xs):
                    obs_t, u_t = xs
                    h = h * u_t[:, None, None]
                    h2, q = q_cell(p, h, obs_t)
                    return h2, q
                _, q_seq = jax.lax.scan(step, hb0, (obs_s, u_in))
                return q_seq                      # (H+1, B, M, A)

            q_tgt = rescan(target)

            def loss_fn(p):
                # ONE online BPTT re-scan serves both the loss Q values and
                # the double-Q action selection (stop_gradient'd) — an
                # earlier version ran rescan(params) a second time outside
                # the grad, a redundant full forward unroll per update
                q_seq = rescan(p)                               # (H+1,B,M,A)
                # double-Q: online argmax picks, target net values, at t+1
                n_act = jnp.argmax(
                    jax.lax.stop_gradient(q_seq[1:]), axis=-1)  # (H, B, M)
                n_taken = jnp.take_along_axis(
                    q_tgt[1:], n_act[..., None], -1)[..., 0]    # (H, B, M)
                qbar = mix(target, n_taken, gs_s[1:])           # (H, B)

                # TD(λ): y_t = r_t + γ u_t ((1-λ) Q̄_{t+1} + λ y_{t+1}),
                # bootstrapped from Q̄ at the sequence end
                def back(y_next, xs):
                    r_t, u_t, qb_t = xs
                    y = r_t + gamma * u_t * ((1 - lam) * qb_t + lam * y_next)
                    return y, y
                _, ys = jax.lax.scan(back, qbar[-1], (r_s, u_s, qbar),
                                     reverse=True)              # (H, B)

                taken = jnp.take_along_axis(
                    q_seq[:-1], act_s[..., None], -1)[..., 0]
                tot = mix(p, taken, gs_s[:-1])                  # (H, B)
                return jnp.mean(optax.huber_loss(
                    tot, jax.lax.stop_gradient(ys)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = optimizer.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            target = soft_update(target, params, tau)
            return (params, target, opt), loss

        (params, target, opt), losses = jax.lax.scan(
            sgd, (state.params, state.target, state.opt),
            jax.random.split(key, grad_steps))
        return (QMixRnnState(params, target, opt), env_states, h_end,
                buffer, jnp.mean(losses))

    @partial(jax.jit, static_argnums=2)
    def evaluate(state: QMixRnnState, key, num_episodes: int = 16):
        env_states = jax.vmap(env.init)(jax.random.split(key, num_episodes))
        h = jnp.zeros((num_episodes, M, hid))

        def body(carry, kt):
            env_states, h, done, ret = carry
            obs = jax.vmap(env.obs)(env_states)
            h2, q = q_cell(state.params, h, obs)
            a = jnp.argmax(q, axis=-1)
            new_states, reward, terminal, truncate = jax.vmap(env.step)(
                env_states, a, jax.random.split(kt, num_episodes))
            alive = jnp.logical_not(done)
            ret = ret + reward * alive
            keep = done.reshape((-1, 1, 1))
            h = jnp.where(keep, h, h2)
            env_states = jax.tree.map(
                lambda n, o: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), o, n),
                new_states, env_states)
            done = done | terminal | truncate
            return (env_states, h, done, ret), None

        init_c = (env_states, h, jnp.zeros(num_episodes, jnp.bool_),
                  jnp.zeros(num_episodes))
        (_, _, _, ret), _ = jax.lax.scan(
            body, init_c, jax.random.split(key, env.max_step))
        return ret.mean()

    return init, init_buffer, train_round, evaluate


def train_qmix_rnn(env: MultiAgentEnvDef, num_envs: int = 32,
                   horizon: int = 64, num_rounds: int = 100, seed: int = 0,
                   verbose: bool = True, mixer: str = 'qmix',
                   lam: float = 0.6, hid: int = 64):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    init, init_buffer, train_round, evaluate = make_qmix_rnn(
        env, hid=hid, mixer=mixer, lam=lam)
    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)
    state = init(k1)
    env_states = jax.vmap(env.init)(jax.random.split(k2, num_envs))
    h = jnp.zeros((num_envs, env.num_agents, hid))
    buffer = init_buffer(num_envs, horizon)
    history = []
    for i in range(num_rounds):
        key, sub = jax.random.split(key)
        state, env_states, h, buffer, loss = train_round(
            state, env_states, h, buffer, sub, num_envs, horizon)
        if (i + 1) % max(1, num_rounds // 8) == 0:
            score = float(evaluate(state, jax.random.key(7100 + i)))
            history.append(score)
            if verbose:
                print(f"| qmix_rnn round {i + 1}: eval avgR {score:9.3f}",
                      flush=True)
    return state, history
