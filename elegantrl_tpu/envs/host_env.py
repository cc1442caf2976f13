"""Host-environment escape hatch: run arbitrary gymnasium envs inside the
fused training loop via ``io_callback``.

The pure-JAX envs carry the throughput story; this adapter covers parity
cases the reference reaches through gym (Box2D LunarLander, MuJoCo Hopper —
SURVEY.md §7 "hard parts" item 5) when those packages are installed.  Each
batched ``step`` is one ordered host callback driving a pool of gym envs;
auto-reset happens host-side like the reference's single-env explore path
(AgentBase.py:109-113).  Orders of magnitude slower than pure-JAX envs —
use for parity/regression checks, not throughput.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from .base import EnvDef, EnvSpec


class _HostPool:
    """A lazily-built pool of stateful gym envs, stepped as one batch.

    ``num_threads > 1`` steps envs on a persistent thread pool — a real win
    for envs whose C core releases the GIL (MuJoCo's ``mj_step``); neutral
    for GIL-bound ones (pybox2d).  Each worker touches disjoint indices, so
    results are bit-identical to sequential stepping."""

    def __init__(self, env_fn: Callable, seed: int, num_threads: int = 0):
        self.env_fn = env_fn
        self.seed = seed
        self.envs = None
        self.obs = None
        self.num_threads = int(num_threads)
        self._pool = None

    def _executor(self):
        if self._pool is None and self.num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=self.num_threads)
        return self._pool

    def _ensure(self, num_envs: int):
        if self.envs is None or len(self.envs) != num_envs:
            self.envs = [self.env_fn() for _ in range(num_envs)]
            self.obs = np.stack([
                e.reset(seed=self.seed + i)[0]
                for i, e in enumerate(self.envs)]).astype(np.float32)

    def reset_all(self, num_envs_arr):
        self._ensure(int(num_envs_arr))
        for i, e in enumerate(self.envs):
            self.obs[i] = e.reset()[0]
        return self.obs.copy()

    def step(self, actions):
        self._ensure(actions.shape[0])
        n = len(self.envs)
        rewards = np.zeros(n, np.float32)
        terminals = np.zeros(n, bool)
        truncates = np.zeros(n, bool)

        def step_one(i):
            a = np.asarray(actions[i])
            obs, r, term, trunc, _ = self.envs[i].step(
                a.item() if a.ndim == 0 else a)
            if term or trunc:  # auto-reset, reference AgentBase.py:111-113
                obs, _ = self.envs[i].reset()
            self.obs[i] = np.asarray(obs, np.float32)
            rewards[i] = r
            terminals[i] = term
            truncates[i] = trunc

        ex = self._executor()
        if ex is None:
            for i in range(n):
                step_one(i)
        else:
            list(ex.map(step_one, range(n)))
        return self.obs.copy(), rewards, terminals, truncates


def make_host_env(env_fn: Callable, spec: EnvSpec, seed: int = 0,
                  num_threads: int = 0) -> EnvDef:
    """Wrap ``env_fn() -> gym.Env`` as a *batched* EnvDef (``batched=True``):
    init/step run on the host for the whole batch via ordered io_callback."""
    pool = _HostPool(env_fn, seed, num_threads=num_threads)

    def init(key, num_envs: int):
        del key
        obs = jax.experimental.io_callback(
            pool.reset_all,
            jax.ShapeDtypeStruct((num_envs, spec.state_dim), jnp.float32),
            jnp.asarray(num_envs, jnp.int32), ordered=True)
        return jnp.zeros(num_envs, jnp.int32), obs  # device state = dummy

    def step(state, actions, key):
        del key
        num_envs = actions.shape[0]
        out_shapes = (
            jax.ShapeDtypeStruct((num_envs, spec.state_dim), jnp.float32),
            jax.ShapeDtypeStruct((num_envs,), jnp.float32),
            jax.ShapeDtypeStruct((num_envs,), jnp.bool_),
            jax.ShapeDtypeStruct((num_envs,), jnp.bool_),
        )
        obs, rewards, terminals, truncates = jax.experimental.io_callback(
            pool.step, out_shapes, actions, ordered=True)
        return state, obs, rewards, terminals, truncates

    return EnvDef(spec=spec, init=init, obs=None, step=step, batched=True,
                  fresh=lambda: make_host_env(env_fn, spec, seed=seed + 10007,
                                              num_threads=num_threads),
                  host_pool=pool)


def make_params_fetcher(explore_view, explore_merge, example_state,
                        cpu_device):
    """Build ``fetch(agent_state) -> CPU pytree`` with tunnel discipline.

    The tunneled link runs ~55 MB/s with ~24 ms per transfer, so the fetch
    must be (a) ONE flat buffer, not a pytree of dozens of leaves, and
    (b) only the actor sub-pytree the host inference path reads
    (``agent.explore_view``) — opt states and critic ensembles dominate the
    bytes and are never consumed on the host.  Shared by the runner's
    host-rollout loop and the evaluator's host eval path."""
    import numpy as _np
    try:
        from jax.flatten_util import ravel_pytree
        if explore_view is not None:
            _, unravel = ravel_pytree(explore_view(example_state))
            pack = jax.jit(lambda s: ravel_pytree(explore_view(s))[0])
            full_host = jax.device_put(example_state, cpu_device)

            def fetch(agent_state):
                flat = _np.asarray(pack(agent_state))
                with jax.default_device(cpu_device):
                    return explore_merge(full_host, unravel(jnp.asarray(flat)))
        else:
            _, unravel = ravel_pytree(example_state)
            pack = jax.jit(lambda s: ravel_pytree(s)[0])

            def fetch(agent_state):
                flat = _np.asarray(pack(agent_state))
                with jax.default_device(cpu_device):
                    return unravel(jnp.asarray(flat))
        return fetch
    except Exception:  # non-ravelable state: per-leaf transfer fallback
        return lambda agent_state: jax.device_put(agent_state, cpu_device)


def host_collect_rollout(pool: _HostPool, explore_jit, env_action_jit,
                         params_cpu, obs: np.ndarray, key,
                         horizon_len: int, reward_scale: float,
                         cpu_device):
    """Collect one whole rollout on the host: actor inference on the
    in-process CPU backend, envs stepped directly on the pool.

    This replaces ``horizon_len`` ordered io_callback device round-trips per
    round (the dominant cost over a tunneled TPU link, ~25 ms each) with
    zero — the caller pays one params fetch before and one rollout upload
    after.  The architectural analog of the reference's Worker process
    (run.py:361-418): exploration off the learner device, synced by one
    actor broadcast + one rollout gather per round.

    Returns numpy arrays ``(states, actions, logprobs, rewards, undones,
    unmasks)`` shaped like :class:`~..agents.base.Rollout` plus the final
    obs.  ``explore_jit``/``env_action_jit`` must be jitted versions of the
    agent's ``explore_action``/``env_action``; all array inputs are
    CPU-committed so the trace runs on the CPU backend.
    """
    num_envs = obs.shape[0]
    states = np.empty((horizon_len, num_envs, obs.shape[1]), np.float32)
    rewards = np.empty((horizon_len, num_envs), np.float32)
    undones = np.empty((horizon_len, num_envs), np.float32)
    unmasks = np.empty((horizon_len, num_envs), np.float32)
    actions_l, logprobs_l = [], []
    with jax.default_device(cpu_device):
        keys = jax.random.split(key, horizon_len)
        for t in range(horizon_len):
            action, logprob = explore_jit(params_cpu, jnp.asarray(obs),
                                          keys[t])
            env_a = np.asarray(env_action_jit(action))
            states[t] = obs
            actions_l.append(np.asarray(action))
            logprobs_l.append(None if logprob is None
                              else np.asarray(logprob))
            obs, r, term, trunc = pool.step(env_a)
            rewards[t] = r
            undones[t] = ~term
            unmasks[t] = ~trunc
    actions = np.stack(actions_l)
    logprobs = (None if logprobs_l[0] is None else np.stack(logprobs_l))
    return (states, actions, logprobs, rewards * reward_scale, undones,
            unmasks), obs.copy()
