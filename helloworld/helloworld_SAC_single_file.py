"""helloworld: SAC on Pendulum in ONE self-contained file, TPU-native.

Pedagogical mirror of the reference's
``helloworld/helloworld_DDPG_TD3_SAC_single_file.py`` (846 LoC of torch):
tanh-Gaussian actor with auto-tuned temperature, twin-critic minimum TD
target, replay ring — the whole round fused into one XLA program.

Run:  python helloworld/helloworld_SAC_single_file.py
Expected: Pendulum avgR rises from ~-1200 to better than -250 within
~2e5 env steps (the same dip-then-solve curve as the reference demo).
"""

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

MAX_STEP, DT, G = 200, 0.05, 10.0


class EnvState(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


def env_init(key):
    k1, k2 = jax.random.split(key)
    return EnvState(jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi),
                    jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0),
                    jnp.zeros((), jnp.int32))


def env_obs(s):
    return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])


def env_step(s, action):
    u = jnp.clip(action[0] * 2.0, -2.0, 2.0)
    th_wrap = ((s.theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
    cost = th_wrap ** 2 + 0.1 * s.theta_dot ** 2 + 0.001 * u ** 2
    theta_dot = jnp.clip(s.theta_dot + (1.5 * G * jnp.sin(s.theta) + 3.0 * u) * DT,
                         -8.0, 8.0)
    theta = s.theta + theta_dot * DT
    t = s.t + 1
    return EnvState(theta, theta_dot, t), -0.5 * cost, t >= MAX_STEP


def mlp_init(key, dims):
    out, keys = [], jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        bound = 1.0 / np.sqrt(dims[i])
        kw, kb = jax.random.split(k)
        out.append((jax.random.uniform(kw, (dims[i], dims[i + 1]), jnp.float32, -bound, bound),
                    jax.random.uniform(kb, (dims[i + 1],), jnp.float32, -bound, bound)))
    return out


def mlp(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


HP = dict(num_envs=8, horizon=100, gamma=0.97, lr=5e-4, batch=256,
          buf=200_000, tau=5e-3, net=(64, 64), total=int(2e5),
          reward_scale=1.0, target_entropy=0.0)
OPT = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(HP['lr']))
A_OPT = optax.adam(HP['lr'])


class Carry(NamedTuple):
    actor: list          # -> (mean, log_std) via 2-headed output
    critic: list         # twin heads: output dim 2
    critic_tgt: list
    a_opt: tuple
    c_opt: tuple
    alpha_log: jax.Array
    al_opt: tuple
    buf: tuple
    env_state: EnvState
    obs: jax.Array
    key: jax.Array


def actor_dist(actor, obs):
    out = mlp(actor, obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    return mean, jnp.clip(log_std, -20, 2)


def sample_action(actor, obs, key):
    mean, log_std = actor_dist(actor, obs)
    noise = jax.random.normal(key, mean.shape)
    pre = mean + jnp.exp(log_std) * noise
    logp = jnp.sum(-log_std - 0.5 * noise ** 2 - 0.5 * jnp.log(2 * jnp.pi)
                   - 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), -1)
    return jnp.tanh(pre), logp


def q_twin(critic, obs, act):
    return mlp(critic, jnp.concatenate([obs, act], -1))  # (..., 2)


def train_round(carry: Carry, _):
    key, k_roll, k_upd = jax.random.split(carry.key, 3)

    def rollout_body(c, kt):
        env_state, obs = c
        ka, kr = jax.random.split(kt)
        act, _ = sample_action(carry.actor, obs, ka)
        new_state, rew, done = jax.vmap(env_step)(env_state, act)
        fresh = jax.vmap(env_init)(jax.random.split(kr, HP['num_envs']))
        env_state = jax.tree.map(
            lambda f, o: jnp.where(done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
            fresh, new_state)
        return (env_state, jax.vmap(env_obs)(env_state)), \
            (obs, act, rew * HP['reward_scale'], 1.0 - done)

    (env_state, obs), (S, A, R, U) = jax.lax.scan(
        rollout_body, (carry.env_state, carry.obs),
        jax.random.split(k_roll, HP['horizon']))

    bS, bA, bR, bU, ptr, size = carry.buf
    idx = (ptr + jnp.arange(HP['horizon'])) % HP['buf']
    buf = (bS.at[idx].set(S), bA.at[idx].set(A), bR.at[idx].set(R),
           bU.at[idx].set(U), (ptr + HP['horizon']) % HP['buf'],
           jnp.minimum(size + HP['horizon'], HP['buf']))

    def sgd_body(i, c):
        actor, critic, critic_tgt, a_opt, c_opt, alpha_log, al_opt = c
        kt = jax.random.fold_in(k_upd, i)
        k_s, k_n, k_pg = jax.random.split(kt, 3)
        bS, bA, bR, bU, _, size = buf
        ids = jax.random.randint(k_s, (HP['batch'],), 0, (size - 1) * HP['num_envs'])
        i0, i1 = ids % (size - 1), ids // (size - 1)
        s, a, r, u, ns = bS[i0, i1], bA[i0, i1], bR[i0, i1], bU[i0, i1], bS[i0 + 1, i1]

        na, nlp = sample_action(actor, ns, k_n)
        alpha = jnp.exp(alpha_log)
        target = r + HP['gamma'] * u * (jnp.min(q_twin(critic_tgt, ns, na), -1)
                                        - alpha * nlp)

        def c_loss(cp):
            return jnp.mean(jnp.square(q_twin(cp, s, a) - target[:, None]))

        up, c_opt = OPT.update(jax.grad(c_loss)(critic), c_opt, critic)
        critic = optax.apply_updates(critic, up)
        critic_tgt = jax.tree.map(lambda t, o: t * (1 - HP['tau']) + o * HP['tau'],
                                  critic_tgt, critic)

        _, lp_now = sample_action(actor, s, k_pg)
        g_al = jax.grad(lambda al: jnp.mean(al * (HP['target_entropy'] - lp_now)))(alpha_log)
        up, al_opt = A_OPT.update(g_al, al_opt, alpha_log)
        alpha_log = jnp.clip(optax.apply_updates(alpha_log, up), -16, 2)
        alpha = jax.lax.stop_gradient(jnp.exp(alpha_log))

        def a_loss(ap):
            act_pg, lp = sample_action(ap, s, k_pg)
            return -jnp.mean(jnp.min(q_twin(critic, s, act_pg), -1) - alpha * lp)

        up, a_opt = OPT.update(jax.grad(a_loss)(actor), a_opt, actor)
        actor = optax.apply_updates(actor, up)
        return actor, critic, critic_tgt, a_opt, c_opt, alpha_log, al_opt

    n_upd = jnp.maximum(buf[5] * HP['num_envs'] // HP['batch'], 4)
    actor, critic, critic_tgt, a_opt, c_opt, alpha_log, al_opt = jax.lax.fori_loop(
        0, n_upd, sgd_body, (carry.actor, carry.critic, carry.critic_tgt,
                             carry.a_opt, carry.c_opt, carry.alpha_log,
                             carry.al_opt))
    return Carry(actor, critic, critic_tgt, a_opt, c_opt, alpha_log, al_opt,
                 buf, env_state, obs, key), R.mean()


@jax.jit
def evaluate(actor, key):
    state = jax.vmap(env_init)(jax.random.split(key, 16))

    def body(c, _):
        state, ret = c
        mean, _ = actor_dist(actor, jax.vmap(env_obs)(state))
        state, r, _ = jax.vmap(env_step)(state, jnp.tanh(mean))
        return (state, ret + r), None

    (_, ret), _ = jax.lax.scan(body, (state, jnp.zeros(16)), None, length=MAX_STEP)
    return ret.mean()


def main():
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    actor = mlp_init(k1, (3, *HP['net'], 2))
    critic = mlp_init(k2, (4, *HP['net'], 2))
    m, n = HP['buf'], HP['num_envs']
    buf = (jnp.zeros((m, n, 3)), jnp.zeros((m, n, 1)), jnp.zeros((m, n)),
           jnp.zeros((m, n)), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    env_state = jax.vmap(env_init)(jax.random.split(k3, n))
    alpha_log = jnp.asarray(-1.0)
    carry = Carry(actor, critic, jax.tree.map(jnp.copy, critic),
                  OPT.init(actor), OPT.init(critic), alpha_log,
                  A_OPT.init(alpha_log), buf, env_state,
                  jax.vmap(env_obs)(env_state), k4)

    rounds = HP['total'] // (HP['horizon'] * n)
    run = jax.jit(lambda c: jax.lax.scan(train_round, c, None,
                                         length=max(1, rounds // 8)))
    t0, best = time.time(), -1e9
    for i in range(8):
        carry, exp_r = run(carry)
        avg_r = float(evaluate(carry.actor, jax.random.key(100 + i)))
        best = max(best, avg_r)
        steps = (i + 1) * (rounds // 8) * HP['horizon'] * n
        print(f"step {steps:8d}  time {time.time()-t0:6.1f}s  avgR {avg_r:8.1f}",
              flush=True)
    assert best > -250, f"SAC helloworld failed to learn (best {best})"
    print("helloworld SAC: learned. Twin critics + auto-alpha in one program.")


if __name__ == '__main__':
    main()
