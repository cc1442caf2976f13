"""helloworld: DQN on CartPole in ONE self-contained file, TPU-native.

Pedagogical mirror of the reference's ``helloworld/helloworld_DQN_single_file.py``
(661 LoC of torch classes): pure-function env, Q-network as a pytree, a
device-resident replay ring, and epsilon-greedy exploration — the whole
round (rollout scan -> ring insert -> TD minibatch loop) is one XLA program.

Run:  python helloworld/helloworld_DQN_single_file.py
Expected: CartPole avgR (episode length) rises from ~10 to >150 within
~6e4 env steps (seconds on TPU, tens of seconds on CPU).
"""

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# ---------------------------------------------------------------- CartPole env
MAX_STEP = 500


class EnvState(NamedTuple):
    x: jax.Array
    v: jax.Array
    th: jax.Array
    w: jax.Array
    t: jax.Array


def env_init(key):
    s = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
    return EnvState(s[0], s[1], s[2], s[3], jnp.zeros((), jnp.int32))


def env_obs(s):
    return jnp.stack([s.x, s.v, s.th, s.w])


def env_step(s, action):
    force = jnp.where(action == 1, 10.0, -10.0)
    ct, st = jnp.cos(s.th), jnp.sin(s.th)
    tmp = (force + 0.05 * s.w ** 2 * st) / 1.1
    wa = (9.8 * st - ct * tmp) / (0.5 * (4 / 3 - 0.1 * ct ** 2 / 1.1))
    xa = tmp - 0.05 * wa * ct / 1.1
    ns = EnvState(s.x + 0.02 * s.v, s.v + 0.02 * xa,
                  s.th + 0.02 * s.w, s.w + 0.02 * wa, s.t + 1)
    done = ((jnp.abs(ns.x) > 2.4) | (jnp.abs(ns.th) > 0.2095) | (ns.t >= MAX_STEP))
    return ns, jnp.ones(()), done


# ------------------------------------------------------------------- Q-network
def mlp_init(key, dims):
    params = []
    for i, k in enumerate(jax.random.split(key, len(dims) - 1)):
        bound = 1.0 / np.sqrt(dims[i])
        kw, kb = jax.random.split(k)
        params.append((jax.random.uniform(kw, (dims[i], dims[i + 1]), jnp.float32, -bound, bound),
                       jax.random.uniform(kb, (dims[i + 1],), jnp.float32, -bound, bound)))
    return params


def mlp(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


HP = dict(num_envs=16, horizon=64, gamma=0.99, lr=1e-3, batch=128,
          buf_size=50_000, eps=0.15, tau=5e-3, net_dims=(128, 128),
          total_steps=int(6e4))
OPT = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(HP['lr']))


class Carry(NamedTuple):
    q: list
    q_tgt: list
    opt: tuple
    buf: tuple        # (obs, act, rew, undone) rings + ptr + size
    env_state: EnvState
    obs: jax.Array
    key: jax.Array


def buf_init():
    m, n = HP['buf_size'], HP['num_envs']
    return (jnp.zeros((m, n, 4)), jnp.zeros((m, n), jnp.int32),
            jnp.zeros((m, n)), jnp.zeros((m, n)),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def train_round(carry: Carry, _):
    key, k_roll, k_upd = jax.random.split(carry.key, 3)

    def rollout_body(c, kt):
        env_state, obs = c
        ka, ke, kr = jax.random.split(kt, 3)
        greedy = jnp.argmax(mlp(carry.q, obs), -1)
        k_r, k_e = jax.random.split(ka)
        rand = jax.random.randint(k_r, greedy.shape, 0, 2)
        act = jnp.where(jax.random.uniform(k_e, greedy.shape) < HP['eps'], rand, greedy)
        new_state, rew, done = jax.vmap(env_step)(env_state, act)
        fresh = jax.vmap(env_init)(jax.random.split(kr, HP['num_envs']))
        env_state = jax.tree.map(
            lambda f, o: jnp.where(done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
            fresh, new_state)
        return (env_state, jax.vmap(env_obs)(env_state)), (obs, act, rew, 1.0 - done)

    (env_state, obs), (S, A, R, U) = jax.lax.scan(
        rollout_body, (carry.env_state, carry.obs),
        jax.random.split(k_roll, HP['horizon']))

    bS, bA, bR, bU, ptr, size = carry.buf
    idx = (ptr + jnp.arange(HP['horizon'])) % HP['buf_size']
    buf = (bS.at[idx].set(S), bA.at[idx].set(A), bR.at[idx].set(R),
           bU.at[idx].set(U),
           (ptr + HP['horizon']) % HP['buf_size'],
           jnp.minimum(size + HP['horizon'], HP['buf_size']))

    def sgd_body(i, c):
        q, q_tgt, opt = c
        kt = jax.random.fold_in(k_upd, i)
        bS, bA, bR, bU, _, size = buf
        ids = jax.random.randint(kt, (HP['batch'],), 0, (size - 1) * HP['num_envs'])
        i0, i1 = ids % (size - 1), ids // (size - 1)
        s, a, r, u, ns = bS[i0, i1], bA[i0, i1], bR[i0, i1], bU[i0, i1], bS[i0 + 1, i1]
        target = r + HP['gamma'] * u * jnp.max(mlp(q_tgt, ns), -1)

        def loss(qp):
            qv = jnp.take_along_axis(mlp(qp, s), a[:, None], -1)[:, 0]
            return jnp.mean((qv - target) ** 2)

        g = jax.grad(loss)(q)
        up, opt = OPT.update(g, opt, q)
        q = optax.apply_updates(q, up)
        q_tgt = jax.tree.map(lambda t, o: t * (1 - HP['tau']) + o * HP['tau'], q_tgt, q)
        return q, q_tgt, opt

    # replay ratio grows with the buffer (reference: cur_size*repeat/batch),
    # a dynamic fori_loop bound — no recompile as the buffer fills
    n_upd = jnp.maximum(buf[5] * HP['num_envs'] // (HP['batch'] * 8), 4)
    q, q_tgt, opt = jax.lax.fori_loop(
        0, n_upd, sgd_body, (carry.q, carry.q_tgt, carry.opt))
    return Carry(q, q_tgt, opt, buf, env_state, obs, key), R.mean()


@jax.jit
def evaluate(q, key):
    state = jax.vmap(env_init)(jax.random.split(key, 16))

    def body(c, _):
        state, ret, alive = c
        a = jnp.argmax(mlp(q, jax.vmap(env_obs)(state)), -1)
        new_state, r, done = jax.vmap(env_step)(state, a)
        ret = ret + r * alive
        alive = alive * (1.0 - done)
        state = jax.tree.map(
            lambda n, o: jnp.where((alive == 0).reshape((-1,) + (1,) * (o.ndim - 1)), o, n),
            new_state, state)
        return (state, ret, alive), None

    (_, ret, _), _ = jax.lax.scan(body, (state, jnp.zeros(16), jnp.ones(16)),
                                  None, length=MAX_STEP)
    return ret.mean()


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = mlp_init(k1, (4, *HP['net_dims'], 2))
    q_tgt = jax.tree.map(jnp.copy, q)
    env_state = jax.vmap(env_init)(jax.random.split(k2, HP['num_envs']))
    carry = Carry(q, q_tgt, OPT.init(q), buf_init(), env_state,
                  jax.vmap(env_obs)(env_state), k3)

    rounds = HP['total_steps'] // (HP['horizon'] * HP['num_envs'])
    run = jax.jit(lambda c: jax.lax.scan(train_round, c, None,
                                         length=max(1, rounds // 8)))
    t0 = time.time()
    best = 0.0
    for i in range(8):
        carry, exp_r = run(carry)
        avg_r = float(evaluate(carry.q, jax.random.key(100 + i)))
        best = max(best, avg_r)
        steps = (i + 1) * (rounds // 8) * HP['horizon'] * HP['num_envs']
        print(f"step {steps:8d}  time {time.time()-t0:6.1f}s  avgR {avg_r:8.1f}",
              flush=True)
    assert best > 150, f"DQN helloworld failed to learn (best {best})"
    print("helloworld DQN: learned. Replay ring + TD loop in one program.")


if __name__ == '__main__':
    main()
