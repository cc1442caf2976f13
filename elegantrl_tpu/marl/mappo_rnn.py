"""Recurrent MAPPO: GRU policies + PopArt value normalization (CTDE).

The reference's ``MAgentMAPPO.py`` describes recurrent actors
(``use_recurrent_policy``, ``recurrent_N``, reference MAgentMAPPO.py:18-74)
and PopArt value normalization (``use_popart``); its code is vestigial —
the modules it imports are absent from the snapshot (SURVEY.md §2.2).
``marl/mappo.py`` covers the MLP path; this module adds the recurrent +
PopArt capability the reference only names, TPU-first:

- one parameter-shared GRU actor applied over the agent axis — the cell is
  three fused ``(obs+hid, hid)`` matmuls batched over ``envs*agents``, so
  the time loop is a ``lax.scan`` whose body is MXU-shaped;
- a recurrent centralized critic over the global state with a **PopArt**
  head: the head predicts normalized values, running return statistics are
  EMA-updated once per round, and the head's weights are inversely rescaled
  so unnormalized predictions are preserved across the stats update
  (Hessel et al. 2016 — "Preserving Outputs Precisely while Adaptively
  Rescaling Targets");
- **full-rollout BPTT**: updates sample whole env sequences (not timesteps)
  and re-scan the GRUs from the stored round-initial hidden state, with
  hidden resets at episode boundaries replayed from the stored done mask —
  no stale-hidden approximation;
- the whole explore+GAE+PopArt+SGD round is one jitted program.

Design notes (TPU): the per-step GRU is bandwidth-light (hid≤128), so the
win is batching — all envs × agents share one cell application per step;
the BPTT re-scan keeps static shapes by sampling a fixed ``seq_batch`` of
env indices with ``jax.random.choice`` inside jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dists, gae
from ..ops.nets import linear_init, mlp_apply, mlp_init, orthogonal_init
from .env import MultiAgentEnvDef
from ..agents.base import make_optimizer, grad_step


# ---------------------------------------------------------------- GRU cell

def gru_init(key, in_dim: int, hid: int):
    """Standard GRU cell parameters: reset/update/candidate gates."""
    ks = jax.random.split(key, 3)
    def gate(k):
        w, b = linear_init(k, in_dim + hid, hid)
        return {'w': w, 'b': b}
    return {'r': gate(ks[0]), 'z': gate(ks[1]), 'n': gate(ks[2])}


def gru_step(p, h, x):
    """h' = GRU(h, x). Shapes: h (..., hid), x (..., in_dim)."""
    xh = jnp.concatenate([x, h], axis=-1)
    r = jax.nn.sigmoid(xh @ p['r']['w'] + p['r']['b'])
    z = jax.nn.sigmoid(xh @ p['z']['w'] + p['z']['b'])
    xrh = jnp.concatenate([x, r * h], axis=-1)
    n = jnp.tanh(xrh @ p['n']['w'] + p['n']['b'])
    return (1.0 - z) * n + z * h


# ---------------------------------------------------------------- PopArt

class PopArt(NamedTuple):
    mu: jax.Array      # ()
    nu: jax.Array      # () second moment
    w: jax.Array       # (hid, 1) normalized-value head
    b: jax.Array       # (1,)

    @property
    def sigma(self):
        return jnp.sqrt(jnp.clip(self.nu - self.mu ** 2, 1e-4, None))


def popart_update(pa: PopArt, targets: jax.Array, beta: float = 3e-4):
    """EMA the return stats, rescale the head to preserve outputs."""
    # per-round effective beta: targets arrive in one big batch per round
    mu2 = (1 - beta) * pa.mu + beta * targets.mean()
    nu2 = (1 - beta) * pa.nu + beta * jnp.mean(targets ** 2)
    old_sigma = pa.sigma
    new = PopArt(mu2, nu2, pa.w, pa.b)
    scale = old_sigma / new.sigma
    w2 = pa.w * scale
    b2 = (old_sigma * pa.b + pa.mu - mu2) / new.sigma
    return PopArt(mu2, nu2, w2, b2)


class MAPPORnnState(NamedTuple):
    actor: dict       # {'emb': mlp, 'gru': gru, 'head': mlp, 'std_log': (1,A)}
    critic: dict      # {'emb': mlp, 'gru': gru, 'popart': PopArt}
    act_opt: tuple
    cri_opt: tuple


def make_mappo_rnn(env: MultiAgentEnvDef, hid: int = 64, args=None):
    gamma = float(getattr(args, 'gamma', 0.99))
    lam = float(getattr(args, 'lambda_gae_adv', 0.95))
    clip = float(getattr(args, 'ratio_clip', 0.25))
    lr = float(getattr(args, 'learning_rate', 3e-4))
    lambda_entropy = float(getattr(args, 'lambda_entropy', 0.001))
    clip_grad = float(getattr(args, 'clip_grad_norm', 3.0))
    optimizer = make_optimizer(lr, clip_grad)
    M, A = env.num_agents, env.action_dim

    def init(key) -> MAPPORnnState:
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        actor = {'emb': mlp_init(k1, (env.obs_dim, hid)),
                 'gru': gru_init(k2, hid, hid),
                 'head': mlp_init(k3, (hid, A), out_std=0.1),
                 'std_log': jnp.zeros((1, A))}
        w = orthogonal_init(k6, hid, 1, std=0.5)[0]
        critic = {'emb': mlp_init(k4, (env.state_dim, hid)),
                  'gru': gru_init(k5, hid, hid),
                  'popart': PopArt(jnp.zeros(()), jnp.ones(()), w,
                                   jnp.zeros((1,)))}
        return MAPPORnnState(actor, critic,
                             optimizer.init(actor), optimizer.init(critic))

    def actor_cell(ap, h, obs):
        """One recurrent actor step. obs (..., M, O), h (..., M, hid)."""
        x = jnp.tanh(mlp_apply(ap['emb'], obs))
        h2 = gru_step(ap['gru'], h, x)
        mean = mlp_apply(ap['head'], jnp.tanh(h2))
        return h2, mean

    def critic_cell(cp, h, gs, normalized: bool):
        """One recurrent critic step. gs (..., S), h (..., hid)."""
        x = jnp.tanh(mlp_apply(cp['emb'], gs))
        h2 = gru_step(cp['gru'], h, x)
        pa = cp['popart']
        v_norm = (jnp.tanh(h2) @ pa.w)[..., 0] + pa.b[0]
        v = v_norm if normalized else v_norm * pa.sigma + pa.mu
        return h2, v

    @partial(jax.jit, static_argnums=(4, 5, 6, 7))
    def train_round(state: MAPPORnnState, env_states, hiddens, key,
                    num_envs: int, horizon: int, seq_batch: int,
                    repeat_times: int):
        k_roll, k_upd = jax.random.split(key)
        h_act0, h_cri0 = hiddens   # (N, M, hid), (N, hid) — round-initial

        def roll(carry, kt):
            env_states, h_act, h_cri = carry
            ka, ke, kr = jax.random.split(kt, 3)
            obs = jax.vmap(env.obs)(env_states)                  # (N, M, O)
            gs = jax.vmap(env.global_state)(env_states)          # (N, S)
            h_act2, mean = actor_cell(state.actor, h_act, obs)
            std = jnp.exp(state.actor['std_log'])
            a = dists.normal_sample(ka, mean, jnp.broadcast_to(std, mean.shape))
            logp = jnp.sum(dists.normal_logprob(a, mean, std), axis=-1)
            h_cri2, v = critic_cell(state.critic, h_cri, gs, normalized=False)
            new_states, reward, terminal, truncate = jax.vmap(
                env.step)(env_states, jnp.tanh(a),
                          jax.random.split(ke, num_envs))
            done = terminal | truncate
            fresh = jax.vmap(env.init)(jax.random.split(kr, num_envs))
            env_states = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
                fresh, new_states)
            undone = 1.0 - done.astype(jnp.float32)
            # reset hiddens at episode boundaries (replayed in BPTT below)
            h_act2 = h_act2 * undone[:, None, None]
            h_cri2 = h_cri2 * undone[:, None]
            return (env_states, h_act2, h_cri2), (
                obs, gs, a, logp, v, reward, undone)

        (env_states, h_act_end, h_cri_end), (OBS, GS, ACT, LOGP, V, R, U) = (
            jax.lax.scan(roll, (env_states, h_act0, h_cri0),
                         jax.random.split(k_roll, horizon)))

        last_gs = jax.vmap(env.global_state)(env_states)
        _, next_v = critic_cell(state.critic, h_cri_end, last_gs,
                                normalized=False)
        adv = gae.gae_vtrace(R, U, V, next_v, gamma, lam)
        target = adv + V                                        # (H, N)
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)

        # PopArt: update stats once per round, rescale head to preserve
        # outputs, then train against normalized targets
        critic0 = dict(state.critic)
        critic0['popart'] = popart_update(state.critic['popart'], target)
        tgt_norm = (target - critic0['popart'].mu) / critic0['popart'].sigma

        n_upd = max(1, num_envs * repeat_times // seq_batch)

        def sgd(carry, kt):
            actor, critic, a_opt, c_opt = carry
            ids = jax.random.randint(kt, (seq_batch,), 0, num_envs)
            obs_s, gs_s = OBS[:, ids], GS[:, ids]       # (H, B, M, O)/(H, B, S)
            act_s, logp_s = ACT[:, ids], LOGP[:, ids]
            adv_s, tgt_s, u_s = adv[:, ids], tgt_norm[:, ids], U[:, ids]
            ha0, hc0 = h_act0[ids], h_cri0[ids]

            def c_loss(cp):
                def step(h, xs):
                    gs_t, u_t = xs
                    h2, v = critic_cell(cp, h, gs_t, normalized=True)
                    return h2 * u_t[:, None], v
                _, v_seq = jax.lax.scan(step, hc0, (gs_s, u_s))
                return jnp.mean(jnp.square(v_seq - tgt_s))

            _, g = jax.value_and_grad(c_loss)(critic)
            critic, c_opt = grad_step(optimizer, critic, c_opt, g)

            def a_loss(ap):
                def step(h, xs):
                    obs_t, u_t = xs
                    h2, mean = actor_cell(ap, h, obs_t)
                    return h2 * u_t[:, None, None], mean
                _, mean_seq = jax.lax.scan(step, ha0, (obs_s, u_s))
                std = jnp.exp(ap['std_log'])
                new_logp = jnp.sum(
                    dists.normal_logprob(act_s, mean_seq, std), -1)
                ratio = jnp.exp(new_logp - logp_s)               # (H, B, M)
                surr = jnp.minimum(
                    adv_s[..., None] * ratio,
                    adv_s[..., None] * jnp.clip(ratio, 1 - clip, 1 + clip))
                ent = jnp.sum(dists.normal_entropy(
                    jnp.broadcast_to(std, mean_seq.shape)), -1)
                return -(jnp.mean(surr) - lambda_entropy * jnp.mean(ent))

            _, g = jax.value_and_grad(a_loss)(actor)
            actor, a_opt = grad_step(optimizer, actor, a_opt, g)
            return (actor, critic, a_opt, c_opt), None

        (actor, critic, a_opt, c_opt), _ = jax.lax.scan(
            sgd, (state.actor, critic0, state.act_opt, state.cri_opt),
            jax.random.split(k_upd, n_upd))
        return (MAPPORnnState(actor, critic, a_opt, c_opt), env_states,
                (h_act_end, h_cri_end), jnp.mean(R))

    @partial(jax.jit, static_argnums=2)
    def evaluate(state: MAPPORnnState, key, num_episodes: int = 16):
        ks = jax.random.split(key, num_episodes)
        env_states = jax.vmap(env.init)(ks)
        h = jnp.zeros((num_episodes, M, hid))

        def body(carry, kt):
            env_states, h, done, ret = carry
            obs = jax.vmap(env.obs)(env_states)
            h2, mean = actor_cell(state.actor, h, obs)
            new_states, reward, terminal, truncate = jax.vmap(env.step)(
                env_states, jnp.tanh(mean), jax.random.split(kt, num_episodes))
            alive = jnp.logical_not(done)
            ret = ret + reward * alive
            keep = done.reshape((-1,) + (1,) * 2)
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

    return init, train_round, evaluate


def train_mappo_rnn(env: MultiAgentEnvDef, args=None, num_envs: int = 64,
                    horizon: int = 128, seq_batch: int = 16,
                    repeat_times: int = 4, num_rounds: int = 40,
                    hid: int = 64, seed: int = 0, verbose: bool = True):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    init, train_round, evaluate = make_mappo_rnn(env, hid=hid, args=args)
    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)
    state = init(k1)
    env_states = jax.vmap(env.init)(jax.random.split(k2, num_envs))
    hiddens = (jnp.zeros((num_envs, env.num_agents, hid)),
               jnp.zeros((num_envs, hid)))
    history = []
    for i in range(num_rounds):
        key, sub = jax.random.split(key)
        state, env_states, hiddens, exp_r = train_round(
            state, env_states, hiddens, sub, num_envs, horizon,
            seq_batch, repeat_times)
        if (i + 1) % max(1, num_rounds // 8) == 0:
            score = float(evaluate(state, jax.random.key(9000 + i)))
            history.append(score)
            if verbose:
                print(f"| mappo_rnn round {i + 1}: eval avgR {score:9.3f}",
                      flush=True)
    return state, history
