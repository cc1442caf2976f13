"""helloworld: REINFORCE on CartPole in ONE self-contained file, TPU-native.

Pedagogical mirror of the reference's
``helloworld/helloworld_REINFORCE_single_file.py`` (1107 LoC of torch): the
simplest policy-gradient algorithm — whole-episode Monte-Carlo returns, no
critic, no replay — as a single fused JAX program.  The episode loop, the
return computation (reverse scan) and the policy-gradient step all compile
together.

Run:  python helloworld/helloworld_REINFORCE_single_file.py
Expected: CartPole avgR rises from ~20 to >300 within ~6e5 env steps.
"""

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
    done = (jnp.abs(ns.x) > 2.4) | (jnp.abs(ns.th) > 0.2095) | (ns.t >= MAX_STEP)
    return ns, jnp.ones(()), done


def mlp_init(key, dims):
    out = []
    for i, k in enumerate(jax.random.split(key, len(dims) - 1)):
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


HP = dict(num_envs=32, horizon=256, gamma=0.99, lr=1e-3, net=(64, 64),
          total=int(6e5))
OPT = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(HP['lr']))


def train_round(carry, _):
    params, opt, env_state, obs, key = carry
    key, k_roll, _ = jax.random.split(key, 3)

    def rollout_body(c, kt):
        env_state, obs = c
        ka, kr = jax.random.split(kt)
        logits = mlp(params, obs)
        act = jax.random.categorical(ka, logits, axis=-1)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits), act[:, None], -1)[:, 0]
        new_state, rew, done = jax.vmap(env_step)(env_state, act)
        fresh = jax.vmap(env_init)(jax.random.split(kr, HP['num_envs']))
        env_state = jax.tree.map(
            lambda f, o: jnp.where(done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
            fresh, new_state)
        return (env_state, jax.vmap(env_obs)(env_state)), (obs, act, rew, 1.0 - done)

    (env_state, obs), (S, A, R, U) = jax.lax.scan(
        rollout_body, (env_state, obs), jax.random.split(k_roll, HP['horizon']))

    # Monte-Carlo returns: reverse discounted sum, cut at episode ends
    def ret_body(nxt, x):
        r, u = x
        ret = r + HP['gamma'] * u * nxt
        return ret, ret

    _, G = jax.lax.scan(ret_body, jnp.zeros(HP['num_envs']), (R, U), reverse=True)
    G = (G - G.mean()) / (G.std() + 1e-6)

    def loss_fn(p):
        logits = mlp(p, S)                          # (H, N, 2)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits),
                                   A[..., None], -1)[..., 0]
        return -jnp.mean(logp * G)

    grads = jax.grad(loss_fn)(params)
    updates, opt = OPT.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    return (params, opt, env_state, obs, key), R.mean()


@jax.jit
def evaluate(params, key):
    state = jax.vmap(env_init)(jax.random.split(key, 16))

    def body(c, _):
        state, ret, alive = c
        a = jnp.argmax(mlp(params, jax.vmap(env_obs)(state)), -1)
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
    params = mlp_init(k1, (4, *HP['net'], 2))
    env_state = jax.vmap(env_init)(jax.random.split(k2, HP['num_envs']))
    carry = (params, OPT.init(params), env_state,
             jax.vmap(env_obs)(env_state), k3)

    rounds = HP['total'] // (HP['horizon'] * HP['num_envs'])
    run = jax.jit(lambda c: jax.lax.scan(train_round, c, None,
                                         length=max(1, rounds // 8)))
    t0, best = time.time(), 0.0
    for i in range(8):
        carry, exp_r = run(carry)
        avg_r = float(evaluate(carry[0], jax.random.key(100 + i)))
        best = max(best, avg_r)
        steps = (i + 1) * (rounds // 8) * HP['horizon'] * HP['num_envs']
        print(f"step {steps:8d}  time {time.time()-t0:6.1f}s  avgR {avg_r:8.1f}",
              flush=True)
    assert best > 300, f"REINFORCE helloworld failed to learn (best {best})"
    print("helloworld REINFORCE: learned. Pure policy gradient, one program.")


if __name__ == '__main__':
    main()
