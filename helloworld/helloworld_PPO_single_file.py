"""helloworld: PPO on Pendulum in ONE self-contained file, TPU-native.

Pedagogical mirror of the reference's ``helloworld/helloworld_PPO_single_file.py``
(587 LoC of torch classes) re-stated as ~250 lines of pure JAX: the env is a
pure function, the agent is a parameter pytree, and the entire training round
(rollout scan -> GAE -> minibatch SGD scan) compiles into one XLA program.

Run:  python helloworld/helloworld_PPO_single_file.py
Expected: Pendulum avgR rises from ~-1100 to better than -250 within ~1e5
env steps (a few seconds on a TPU chip, ~1 minute on CPU).
"""

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# ---------------------------------------------------------------- Pendulum env
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
    theta_dot = jnp.clip(s.theta_dot + (1.5 * G * jnp.sin(s.theta) + 3.0 * u) * DT, -8.0, 8.0)
    theta = s.theta + theta_dot * DT
    t = s.t + 1
    done = t >= MAX_STEP
    return EnvState(theta, theta_dot, t), -0.5 * cost, done


def vec_step(state, actions, key):
    """Step all envs; auto-reset done ones (masked where — no Python branches)."""
    n = actions.shape[0]
    new_state, rewards, dones = jax.vmap(env_step)(state, actions)
    fresh = jax.vmap(env_init)(jax.random.split(key, n))
    state = jax.tree.map(
        lambda f, o: jnp.where(dones.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
        fresh, new_state)
    return state, jax.vmap(env_obs)(state), rewards, dones


# ------------------------------------------------------------------- networks
def mlp_init(key, dims, out_std=None):
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        if i == len(dims) - 2 and out_std is not None:
            w = jax.nn.initializers.orthogonal(out_std)(k, (dims[i], dims[i + 1]))
            b = jnp.full((dims[i + 1],), 1e-6)
        else:
            bound = 1.0 / np.sqrt(dims[i])
            kw, kb = jax.random.split(k)
            w = jax.random.uniform(kw, (dims[i], dims[i + 1]), jnp.float32, -bound, bound)
            b = jax.random.uniform(kb, (dims[i + 1],), jnp.float32, -bound, bound)
        params.append((w, b))
    return params


def mlp(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


# ------------------------------------------------------------------ PPO agent
class Agent(NamedTuple):
    actor: list
    std_log: jax.Array
    critic: list
    actor_opt: tuple
    critic_opt: tuple


HP = dict(num_envs=16, horizon=512, gamma=0.97, lam=0.95, clip=0.25,
          lr=4e-4, batch=128, repeat=32, lambda_entropy=0.001,
          net_dims=(64, 64), total_steps=int(1.6e5))
OPT = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(HP['lr']))


def agent_init(key):
    k1, k2 = jax.random.split(key)
    actor = mlp_init(k1, (3, *HP['net_dims'], 1), out_std=0.1)
    critic = mlp_init(k2, (3, *HP['net_dims'], 1), out_std=0.5)
    std_log = jnp.zeros((1, 1))
    return Agent(actor, std_log, critic,
                 OPT.init((actor, std_log)), OPT.init(critic))


def logprob_fn(mean, std, a):
    z = (a - mean) / std
    return jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), -1)


def train_round(carry, _):
    agent, env_state, obs, key = carry
    key, k_roll, k_upd = jax.random.split(key, 3)

    def rollout_body(c, kt):
        env_state, obs = c
        ka, ke = jax.random.split(kt)
        mean = mlp(agent.actor, obs)
        std = jnp.exp(agent.std_log)
        a = mean + std * jax.random.normal(ka, mean.shape)
        lp = logprob_fn(mean, std, a)
        env_state, nobs, r, done = vec_step(env_state, jnp.tanh(a), ke)
        return (env_state, nobs), (obs, a, lp, r, 1.0 - done)

    (env_state, obs), (S, A, LP, R, U) = jax.lax.scan(
        rollout_body, (env_state, obs), jax.random.split(k_roll, HP['horizon']))

    V = jax.lax.map(lambda s: mlp(agent.critic, s)[:, 0], S)      # (H, N)
    next_v = mlp(agent.critic, obs)[:, 0]

    def gae_body(c, x):
        nv, adv = c
        r, u, v = x
        delta = r + HP['gamma'] * u * nv - v
        adv = delta + HP['gamma'] * HP['lam'] * u * adv
        return (v, adv), adv

    _, ADV = jax.lax.scan(gae_body, (next_v, jnp.zeros_like(next_v)),
                          (R, U, V), reverse=True)
    TARGET = ADV + V
    ADV = (ADV - ADV.mean()) / (ADV.std() + 1e-5)

    def sgd_body(c, kt):
        (actor, std_log, critic, a_opt, c_opt) = c
        ids = jax.random.randint(kt, (HP['batch'],), 0, HP['horizon'] * HP['num_envs'])
        i0, i1 = ids % HP['horizon'], ids // HP['horizon']
        s, a, lp, adv, tgt = S[i0, i1], A[i0, i1], LP[i0, i1], ADV[i0, i1], TARGET[i0, i1]

        def critic_loss(cp):
            return jnp.mean((mlp(cp, s)[:, 0] - tgt) ** 2)

        gc = jax.grad(critic_loss)(critic)
        up, c_opt = OPT.update(gc, c_opt, critic)
        critic = optax.apply_updates(critic, up)

        def actor_loss(ap_sl):
            ap, sl = ap_sl
            mean, std = mlp(ap, s), jnp.exp(sl)
            nlp = logprob_fn(mean, std, a)
            ratio = jnp.exp(nlp - lp)
            surr = jnp.minimum(adv * ratio,
                               adv * jnp.clip(ratio, 1 - HP['clip'], 1 + HP['clip']))
            ent = jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), -1)
            return -(surr.mean() - HP['lambda_entropy'] * ent.mean())

        ga = jax.grad(actor_loss)((actor, std_log))
        up, a_opt = OPT.update(ga, a_opt, (actor, std_log))
        actor, std_log = optax.apply_updates((actor, std_log), up)
        return (actor, std_log, critic, a_opt, c_opt), None

    n_updates = HP['horizon'] * HP['repeat'] // HP['batch']
    (actor, std_log, critic, a_opt, c_opt), _ = jax.lax.scan(
        sgd_body, (agent.actor, agent.std_log, agent.critic,
                   agent.actor_opt, agent.critic_opt),
        jax.random.split(k_upd, n_updates))

    agent = Agent(actor, std_log, critic, a_opt, c_opt)
    return (agent, env_state, obs, key), R.mean()


@jax.jit
def evaluate(agent, key):
    state = jax.vmap(env_init)(jax.random.split(key, 16))
    obs = jax.vmap(env_obs)(state)

    def body(c, _):
        state, obs, ret = c
        a = jnp.tanh(mlp(agent.actor, obs))
        state, r, _ = jax.vmap(env_step)(state, a)
        return (state, jax.vmap(env_obs)(state), ret + r), None

    (_, _, ret), _ = jax.lax.scan(body, (state, obs, jnp.zeros(16)), None,
                                  length=MAX_STEP)
    return ret.mean()


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    agent = agent_init(k1)
    env_state = jax.vmap(env_init)(jax.random.split(k2, HP['num_envs']))
    obs = jax.vmap(env_obs)(env_state)

    rounds = HP['total_steps'] // (HP['horizon'] * HP['num_envs'])
    run = jax.jit(partial(jax.lax.scan, train_round, length=max(1, rounds // 8)))
    carry = (agent, env_state, obs, k3)
    t0 = time.time()
    for i in range(8):
        carry, exp_r = run(carry, None)
        avg_r = float(evaluate(carry[0], jax.random.key(100 + i)))
        steps = (i + 1) * (rounds // 8) * HP['horizon'] * HP['num_envs']
        print(f"step {steps:8d}  time {time.time()-t0:6.1f}s  "
              f"expR {float(exp_r.mean()):8.3f}  avgR {avg_r:8.1f}", flush=True)
    assert avg_r > -400, "PPO helloworld failed to learn"
    print("helloworld PPO: solved-ish. The whole loop was ONE compiled program.")


if __name__ == '__main__':
    main()
