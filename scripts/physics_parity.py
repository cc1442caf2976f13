"""Physics parity characterization: pure-JAX re-derived envs vs real
gymnasium Box2D / MuJoCo (VERDICT r1 missing #4).

Three measurements, printed as markdown for PARITY.md:

1. Per-step response calibration of LunarLanderContinuous (gravity pull,
   main/side engine deltas, position-integration ratios) in observation
   units — the constants baked into ``envs/lunar_lander.py`` come from this
   measurement.
2. Behavioral A/B: the SAME scripted PD landing controller flown in both
   sims — mean return, return std and landing rate over 32 episodes each.
3. Host-env (real physics) sanity: LunarLanderContinuous-v3 and Hopper-v5
   through ``envs.gym_parity`` stepped inside the jitted framework loop.

The Hopper re-derivation (``envs/hopper.py``) is a SLIP-template control
problem (6-dim obs, 2 actions) — intentionally NOT MuJoCo's articulated
chain (11-dim obs, 3 actions); real-Hopper training goes through the host
env, so only measurement 3 applies to it.

Run: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/physics_parity.py``
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax            # noqa: E402
import jax.numpy as jnp  # noqa: E402


def pd_policy(o) -> np.ndarray:
    """Scripted PD landing controller shared by both sims (obs-space)."""
    x, y, vx, vy, th, om = o[:6]
    angle_targ = np.clip(0.4 * x + 1.0 * vx, -0.4, 0.4)
    ang_err = angle_targ - th
    vy_targ = -0.25 * max(y, 0.0) - 0.02
    a0 = np.clip(8.0 * (vy_targ - vy), -1, 1)
    a1 = np.clip(-(6.0 * ang_err - 3.0 * om), -1, 1)
    return np.array([a0, a1], np.float32)


def gym_episodes(n=32):
    import gymnasium as gym
    e = gym.make('LunarLanderContinuous-v3')
    rets, lands = [], 0
    for ep in range(n):
        o, _ = e.reset(seed=100 + ep)
        R = 0.0
        for _ in range(1000):
            o, r, term, trunc, _ = e.step(pd_policy(o))
            R += r
            if term or trunc:
                lands += r > 50
                break
        rets.append(R)
    e.close()
    return np.mean(rets), np.std(rets), lands, n


def jax_episodes(n=32):
    from elegantrl_tpu.envs.lunar_lander import make_lunar_lander
    env = make_lunar_lander(True)
    step = jax.jit(env.step)
    rets, lands = [], 0
    for ep in range(n):
        s = env.init(jax.random.key(100 + ep))
        R = 0.0
        for t in range(1000):
            o = np.asarray(env.obs(s))
            s, r, term, trunc = step(s, jnp.asarray(pd_policy(o)),
                                     jax.random.key(t))
            R += float(r)
            if bool(term) or bool(trunc):
                lands += float(r) > 50
                break
        rets.append(R)
    return np.mean(rets), np.std(rets), lands, n


def gym_calibration():
    """Per-step obs-space response deltas of the Box2D lander."""
    import gymnasium as gym
    e = gym.make('LunarLanderContinuous-v3')

    def settle(seed=3, k=3):
        o, _ = e.reset(seed=seed)
        for _ in range(k):
            o, *_ = e.step(np.zeros(2, np.float32))
        return o

    o = settle()
    o2, *_ = e.step(np.zeros(2, np.float32))
    gravity = o2[3] - o[3]
    o = settle()
    o2, *_ = e.step(np.array([1.0, 0.0], np.float32))
    main = (o2[3] - o[3]) - gravity
    o = settle()
    o2, *_ = e.step(np.array([0.0, 1.0], np.float32))
    domega, dvx = o2[5] - o[5], o2[2] - o[2]
    e.close()
    return gravity, main, domega, dvx


def jax_calibration():
    from elegantrl_tpu.envs.lunar_lander import make_lunar_lander
    env = make_lunar_lander(True)

    def settle(seed=3, k=3):
        s = env.init(jax.random.key(seed))
        for t in range(k):
            s, *_ = env.step(s, jnp.zeros(2), jax.random.key(t))
        return s

    s = settle()
    s2, *_ = env.step(s, jnp.zeros(2), jax.random.key(9))
    gravity = float(s2.vy - s.vy)
    s = settle()
    s2, *_ = env.step(s, jnp.asarray([1.0, 0.0]), jax.random.key(9))
    main = float(s2.vy - s.vy) - gravity
    s = settle()
    s2, *_ = env.step(s, jnp.asarray([0.0, 1.0]), jax.random.key(9))
    domega, dvx = float(s2.omega - s.omega), float(s2.vx - s.vx)
    return gravity, main, domega, dvx


def host_env_sanity():
    from elegantrl_tpu.envs import gym_env_def
    from elegantrl_tpu.envs.base import vec_reset, vec_step
    rows = []
    for env_id in ('LunarLanderContinuous-v3', 'Hopper-v5'):
        env = gym_env_def(env_id)
        state, obs = vec_reset(env, jax.random.key(0), 4)
        total = np.zeros(4)
        for t in range(50):
            a = np.random.default_rng(t).uniform(
                -1, 1, (4, env.spec.action_dim)).astype(np.float32)
            state, obs, r, term, trunc = vec_step(env, state, jnp.asarray(a),
                                                  jax.random.key(t))
            total += np.asarray(r)
        ok = np.isfinite(np.asarray(obs)).all() and np.isfinite(total).all()
        rows.append((env_id, env.spec.state_dim, env.spec.action_dim,
                     float(total.mean()), 'ok' if ok else 'FAIL'))
    return rows


def main():
    g_cal = gym_calibration()
    j_cal = jax_calibration()
    print("\n## LunarLander per-step response calibration (obs units)\n")
    print("| response | Box2D (gym) | pure-JAX | ratio |")
    print("|---|---|---|---|")
    for name, g, j in zip(
            ('gravity dvy', 'main engine dvy', 'side engine domega',
             'side engine dvx'), g_cal, j_cal):
        print(f"| {name} | {g:+.4f} | {j:+.4f} | {j / g:.3f} |")

    gm, gs, gl, gn = gym_episodes()
    jm, js, jl, jn = jax_episodes()
    print("\n## Behavioral A/B: shared PD landing controller, 32 episodes\n")
    print("| sim | mean return | std | landings |")
    print("|---|---|---|---|")
    print(f"| Box2D (gym) | {gm:.1f} | {gs:.1f} | {gl}/{gn} |")
    print(f"| pure-JAX | {jm:.1f} | {js:.1f} | {jl}/{jn} |")

    print("\n## Host-env (real physics) in the jitted loop, random policy\n")
    print("| env | obs dim | act dim | mean 50-step return | status |")
    print("|---|---|---|---|---|")
    for row in host_env_sanity():
        print("| {} | {} | {} | {:.1f} | {} |".format(*row))


if __name__ == '__main__':
    main()
