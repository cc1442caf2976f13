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


def _proc_worker(env_fn, seed, idxs, conn):
    """Child side of the process pool: owns envs for global indices ``idxs``.

    Protocol (parent -> child): ('step', actions_chunk) | ('reset',) |
    ('close',).  Replies with the chunk's (obs, reward, terminal, truncate)
    or obs.  Construction/seeding matches the sequential path exactly so
    pooled stepping is bit-identical to sequential."""
    envs = [env_fn() for _ in idxs]
    obs = np.stack([e.reset(seed=seed + g)[0]
                    for e, g in zip(envs, idxs)]).astype(np.float32)
    while True:
        msg = conn.recv()
        if msg[0] == 'step':
            actions = msg[1]
            rewards = np.zeros(len(envs), np.float32)
            terminals = np.zeros(len(envs), bool)
            truncates = np.zeros(len(envs), bool)
            for j, e in enumerate(envs):
                a = np.asarray(actions[j])
                o, r, term, trunc, _ = e.step(a.item() if a.ndim == 0 else a)
                if term or trunc:
                    o, _ = e.reset()
                obs[j] = np.asarray(o, np.float32)
                rewards[j] = r
                terminals[j] = term
                truncates[j] = trunc
            conn.send((obs, rewards, terminals, truncates))
        elif msg[0] == 'reset':
            for j, e in enumerate(envs):
                obs[j] = e.reset()[0]
            conn.send(obs)
        else:
            conn.close()
            return


class _HostPool:
    """A lazily-built pool of stateful gym envs, stepped as one batch.

    ``num_threads > 1`` steps envs on a persistent thread pool — a real win
    for envs whose C core releases the GIL (MuJoCo's ``mj_step``); neutral
    for GIL-bound ones (pybox2d).  ``num_procs > 1`` instead forks a
    persistent PROCESS pool (the reference's ``SubEnv``/``VecEnv`` pattern,
    config.py:223-311) — the win for GIL-bound envs.  Either way each worker
    owns disjoint env indices with sequential-identical construction order
    and seeding, so results are bit-identical to sequential stepping."""

    def __init__(self, env_fn: Callable, seed: int, num_threads: int = 0,
                 num_procs: int = 0):
        self.env_fn = env_fn
        self.seed = seed
        self.envs = None
        self.obs = None
        self.num_threads = int(num_threads)
        self.num_procs = int(num_procs)
        self._pool = None
        self._procs = None   # list of (Process, Connection, idxs)

    def _executor(self):
        if self._pool is None and self.num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=self.num_threads)
        return self._pool

    def _ensure(self, num_envs: int):
        if self.num_procs > 1:
            if self._procs is not None and sum(
                    len(idxs) for _, _, idxs in self._procs) == num_envs:
                return
            self._close_procs()
            import multiprocessing as mp
            ctx = mp.get_context('fork')  # env_fn may be a closure
            chunks = np.array_split(np.arange(num_envs),
                                    min(self.num_procs, num_envs))
            self._procs = []
            for idxs in chunks:
                if len(idxs) == 0:
                    continue
                parent, child = ctx.Pipe()
                p = ctx.Process(target=_proc_worker,
                                args=(self.env_fn, self.seed,
                                      idxs.tolist(), child),
                                daemon=True)
                p.start()
                child.close()
                self._procs.append((p, parent, idxs))
            # parent-side obs materializes at the first reset_all/step reply
            # (workers already hold their seeded initial obs)
            self.obs = None
            return
        if self.envs is None or len(self.envs) != num_envs:
            self.envs = [self.env_fn() for _ in range(num_envs)]
            self.obs = np.stack([
                e.reset(seed=self.seed + i)[0]
                for i, e in enumerate(self.envs)]).astype(np.float32)

    def _close_procs(self):
        if self._procs:
            for p, conn, _ in self._procs:
                try:
                    conn.send(('close',))
                    conn.close()
                except (BrokenPipeError, OSError):
                    pass
                p.join(timeout=2)
                if p.is_alive():
                    p.terminate()
        self._procs = None

    def reset_all(self, num_envs_arr):
        n = int(num_envs_arr)
        self._ensure(n)
        if self._procs is not None:
            for _, conn, _ in self._procs:
                conn.send(('reset',))
            chunks = [conn.recv() for _, conn, _ in self._procs]
            self.obs = np.concatenate(chunks, 0)
            return self.obs.copy()
        for i, e in enumerate(self.envs):
            self.obs[i] = e.reset()[0]
        return self.obs.copy()

    def step(self, actions):
        self._ensure(actions.shape[0])
        if self._procs is not None:
            for _, conn, idxs in self._procs:
                conn.send(('step', np.asarray(actions)[idxs]))
            outs = [conn.recv() for _, conn, _ in self._procs]
            obs = np.concatenate([o[0] for o in outs], 0)
            rewards = np.concatenate([o[1] for o in outs], 0)
            terminals = np.concatenate([o[2] for o in outs], 0)
            truncates = np.concatenate([o[3] for o in outs], 0)
            self.obs = obs
            return obs.copy(), rewards, terminals, truncates
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
                  num_threads: int = 0, num_procs: int = 0) -> EnvDef:
    """Wrap ``env_fn() -> gym.Env`` as a *batched* EnvDef (``batched=True``):
    init/step run on the host for the whole batch via ordered io_callback.
    ``num_threads``: thread-pool stepping (GIL-releasing envs, e.g. MuJoCo);
    ``num_procs``: forked process-pool stepping (GIL-bound envs, e.g. Box2D
    — the reference's SubEnv/VecEnv process pattern, config.py:223-311)."""
    pool = _HostPool(env_fn, seed, num_threads=num_threads,
                     num_procs=num_procs)

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
                                              num_threads=num_threads,
                                              num_procs=num_procs),
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


def make_explore_env_fn(agent):
    """ONE jitted fn ``(params, obs, key) -> (raw_action, logprob|None,
    env_action)`` — the contract ``host_collect_rollout`` consumes.  Fusing
    explore + action-convert into a single dispatch measurably lowers
    per-step latency vs two jitted calls."""
    def _fn(params, obs, key):
        action, logprob = agent.explore_action(params, obs, key)
        return action, logprob, agent.env_action(action)
    return jax.jit(_fn)


def host_collect_rollout(pool: _HostPool, explore_env_jit,
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

    Why a Python loop and not a jitted scan over io_callback: both fused
    alternatives were measured SLOWER on the ModSAC lander shape (16 envs,
    256x256 actor, ~198 ms/round here): a CPU-backend `lax.scan` +
    per-step ordered io_callback costs ~5.5 ms/step in callback crossings
    (352 ms/round), and a forked process pool pays pipe round-trips far
    above the ~50 us Box2D step (9.3k vs 19.0k env-steps/s) — see
    docs/performance.md "Host-rollout loop anatomy".

    ``explore_env_jit`` must be ONE jitted fn
    ``(params, obs, key) -> (raw_action, logprob|None, env_action)`` (a
    single dispatch+sync per step; splitting explore/convert into two jitted
    calls measurably adds per-step latency).  Returns a ``Rollout`` of numpy
    arrays plus the final obs; all array inputs are CPU-committed so the
    trace runs on the CPU backend.
    """
    from ..agents.base import Rollout
    num_envs = obs.shape[0]
    states = np.empty((horizon_len, num_envs, obs.shape[1]), np.float32)
    rewards = np.empty((horizon_len, num_envs), np.float32)
    undones = np.empty((horizon_len, num_envs), np.float32)
    unmasks = np.empty((horizon_len, num_envs), np.float32)
    actions_l, logprobs_l = [], []
    with jax.default_device(cpu_device):
        keys = list(jax.random.split(key, horizon_len))  # no per-step slicing
        for t in range(horizon_len):
            action, logprob, env_a = explore_env_jit(
                params_cpu, jnp.asarray(obs), keys[t])
            states[t] = obs
            actions_l.append(np.asarray(action))
            logprobs_l.append(None if logprob is None
                              else np.asarray(logprob))
            obs, r, term, trunc = pool.step(np.asarray(env_a))
            rewards[t] = r
            undones[t] = ~term
            unmasks[t] = ~trunc
    actions = np.stack(actions_l)
    logprobs = (None if logprobs_l[0] is None else np.stack(logprobs_l))
    return Rollout(states=states, actions=actions, logprobs=logprobs,
                   rewards=rewards * reward_scale, undones=undones,
                   unmasks=unmasks), obs.copy()
