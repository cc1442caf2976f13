"""Evaluator: on-device greedy episode evaluation + host-side recording.

Capability match for the reference ``Evaluator``
(``elegantrl/train/evaluator.py:12-302``): every ``eval_per_step`` training
steps it runs ``eval_times`` greedy episodes, prints the
``ID Step Time | avgR stdR avgS stdS | expR objC objA`` table, appends to
``recorder.npy``, saves best/periodic actor checkpoints, and optionally
renders ``LearningCurve.jpg``.

TPU-native redesign: the ``eval_times`` episodes run *in parallel* as one
jitted scan (episodes are independent env instances, frozen once done)
instead of the reference's sequential Python episode loops
(evaluator.py:161-238).  Envs exposing ``episode_return`` (e.g. stock
trading's ``cumulative_returns``) override the reward sum, mirroring
evaluator.py:195-196.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import EnvDef
from ..utils.checkpoint import save_pytree


def make_eval_fn(env: EnvDef, greedy_action: Callable, num_episodes: int,
                 max_step: int, host_eval: bool = True,
                 params_fetch: Optional[Callable] = None) -> Callable:
    """Build a jitted fn (agent_state, key) -> (returns, steps) running
    ``num_episodes`` parallel greedy episodes to their first done.

    ``host_eval`` gates the host-pool fast path so ``args.host_rollout=False``
    disables host-side stepping everywhere, not just in training.
    ``params_fetch`` (agent_state -> CPU pytree) lets the host path reuse the
    runner's one-flat-buffer actor fetch instead of a per-leaf pytree fetch."""

    try:
        _cpu_devices = jax.devices('cpu')
    except RuntimeError:  # platform-pinned process without a CPU backend
        _cpu_devices = []

    if env.batched and env.host_pool is not None and host_eval and _cpu_devices:
        # host-callback env with an exposed pool: run the whole eval on the
        # host (greedy inference on the in-process CPU backend, pool stepped
        # directly) — zero device round-trips instead of max_step ordered
        # io_callbacks over the tunneled link (see runner host-rollout mode)
        import numpy as np
        pool = env.host_pool
        cpu = _cpu_devices[0]
        greedy_jit = jax.jit(greedy_action)
        fetch = params_fetch or (lambda s: jax.device_put(s, cpu))

        def eval_fn_host(agent_state, key):
            del key  # pool envs own their reset RNG
            params_cpu = fetch(agent_state)
            obs = pool.reset_all(np.int32(num_episodes))
            done = np.zeros(num_episodes, bool)
            ret = np.zeros(num_episodes, np.float32)
            steps = np.zeros(num_episodes, np.int32)
            with jax.default_device(cpu):
                for _ in range(max_step):
                    action = np.asarray(greedy_jit(params_cpu,
                                                   jnp.asarray(obs)))
                    obs, reward, terminal, truncate = pool.step(action)
                    alive = ~done
                    ret += reward * alive
                    steps += alive
                    done |= terminal | truncate
                    if done.all():
                        break
            # host-resident results: returning numpy keeps ``finish`` from
            # round-tripping them through the accelerator
            return ret, steps

        return eval_fn_host

    if env.batched:  # host-callback envs: batch-level step, no state freeze
        def eval_fn_batched(agent_state, key):
            k_init, k_run = jax.random.split(key)
            env_state, obs = env.init(k_init, num_episodes)

            def body(carry, key_t):
                env_state, obs, done, ret, steps = carry
                action = greedy_action(agent_state, obs)
                env_state, obs, reward, terminal, truncate = env.step(
                    env_state, action, key_t)
                alive = jnp.logical_not(done)
                ret = ret + reward * alive
                steps = steps + alive.astype(jnp.int32)
                done = done | terminal | truncate
                return (env_state, obs, done, ret, steps), None

            init = (env_state, obs, jnp.zeros(num_episodes, jnp.bool_),
                    jnp.zeros(num_episodes), jnp.zeros(num_episodes, jnp.int32))
            (_, _, _, ret, steps), _ = jax.lax.scan(
                body, init, jax.random.split(k_run, max_step))
            return ret, steps

        return jax.jit(eval_fn_batched)

    def eval_fn(agent_state, key):
        k_init, k_run = jax.random.split(key)
        init_keys = jax.random.split(k_init, num_episodes)
        env_state = jax.vmap(env.init)(init_keys)
        obs = jax.vmap(env.obs)(env_state)

        def body(carry, key_t):
            env_state, obs, done, ret, steps = carry
            action = greedy_action(agent_state, obs)
            step_keys = jax.random.split(key_t, num_episodes)
            new_state, reward, terminal, truncate = jax.vmap(env.step)(
                env_state, action, step_keys)
            alive = jnp.logical_not(done)
            ret = ret + reward * alive
            steps = steps + alive.astype(jnp.int32)
            # freeze episodes that were ALREADY done before this step — the
            # terminal transition's state is kept (it holds end-of-episode
            # metrics like the stock env's cumulative_returns)
            env_state = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                new_state, env_state)
            done = done | terminal | truncate
            obs = jax.vmap(env.obs)(env_state)
            return (env_state, obs, done, ret, steps), None

        done0 = jnp.zeros(num_episodes, jnp.bool_)
        ret0 = jnp.zeros(num_episodes, jnp.float32)
        steps0 = jnp.zeros(num_episodes, jnp.int32)
        keys = jax.random.split(k_run, max_step)
        (env_state, _, done, ret, steps), _ = jax.lax.scan(
            body, (env_state, obs, done0, ret0, steps0), keys)

        if env.episode_return is not None:
            ret = jnp.where(done, jax.vmap(env.episode_return)(env_state), ret)
        return ret, steps

    return jax.jit(eval_fn)


class Evaluator:
    def __init__(self, cwd: str, env: EnvDef, greedy_action: Callable, args,
                 if_tensorboard: bool = False, host_eval: bool = True,
                 params_fetch: Optional[Callable] = None):
        self.cwd = cwd
        self.agent_id = int(getattr(args, 'gpu_id', 0))
        self.total_step = 0
        self.start_time = time.time()
        self.eval_times = int(getattr(args, 'eval_times', 3))
        self.eval_per_step = int(getattr(args, 'eval_per_step', 2e4))
        self.eval_step_counter = -self.eval_per_step
        self.save_gap = int(getattr(args, 'save_gap', 8))
        self.save_counter = 0
        self.if_keep_save = bool(getattr(args, 'if_keep_save', True))
        self.if_over_write = bool(getattr(args, 'if_over_write', False))
        self.recorder_path = os.path.join(cwd, 'recorder.npy')
        self.recorder = []
        self.recorder_times = []   # wall seconds since start, per recorder row
        self.recorder_step = int(getattr(args, 'eval_record_step', 0))
        self.max_r = -np.inf
        max_step = int(getattr(args, 'max_step', env.spec.max_step))
        self._eval_fn = make_eval_fn(env, greedy_action, self.eval_times,
                                     max_step, host_eval=host_eval,
                                     params_fetch=params_fetch)
        self._key = jax.random.key(int(getattr(args, 'random_seed', 0) or 0) + 1943)

        # optional TensorBoard scalars (reference evaluator.py:50-54,81-92;
        # off by default there too)
        self.tensorboard = None
        if if_tensorboard or bool(getattr(args, 'if_tensorboard', False)):
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tensorboard = SummaryWriter(os.path.join(cwd, 'tensorboard'))
            except ImportError:  # pragma: no cover
                pass

        print("| Evaluator:"
              "\n| `step`: Number of samples (env.step() calls)."
              "\n| `time`: Seconds since start of training."
              "\n| `avgR/stdR`: mean/std of episodic cumulative returns."
              "\n| `avgS/stdS`: mean/std of episode lengths."
              "\n| `objC`: critic objective.  `objA`: actor objective."
              f"\n{'#' * 80}\n"
              f"{'ID':<3}{'Step':>8}{'Time':>8} |"
              f"{'avgR':>8}{'stdR':>7}{'avgS':>7}{'stdS':>6} |"
              f"{'expR':>8}{'objC':>7}{'objA':>7}", flush=True)

    def evaluate_and_save(self, agent_state: Any, steps: int, exp_r: float,
                          logging_tuple: tuple) -> None:
        """Synchronous evaluate + record (reference ``evaluate_and_save``,
        evaluator.py:56-124).  The fused training loop instead uses the
        ``dispatch``/``finish`` pair so evaluation overlaps the next
        training dispatch (replaces the reference's concurrent
        ``EvaluatorProc``, run.py:421-475)."""
        handle = self.dispatch(agent_state, steps)
        if handle is not None:
            self.finish(handle, exp_r, logging_tuple)

    def dispatch(self, agent_state: Any, steps: int):
        """Account ``steps`` and, if the eval cadence is due, launch the
        jitted parallel-episode eval WITHOUT blocking (JAX dispatch is
        async).  Returns an opaque handle for ``finish`` or None."""
        self.total_step += steps
        if self.total_step < self.recorder_step:
            return None
        if self.total_step < self.eval_step_counter + self.eval_per_step:
            return None
        self.eval_step_counter = self.total_step
        self._key, sub = jax.random.split(self._key)
        returns, ep_steps = self._eval_fn(agent_state, sub)
        return (self.total_step, returns, ep_steps, agent_state)

    def finish(self, handle, exp_r: float, logging_tuple: tuple) -> None:
        """Fetch a dispatched eval's results and do the host-side recording,
        printing and checkpointing."""
        total_step, returns, ep_steps, agent_state = handle
        if isinstance(returns, np.ndarray):  # host eval path: already local
            returns = returns.astype(np.float32)
            ep_steps = np.asarray(ep_steps, np.float32)
        else:
            both = np.asarray(jnp.stack([returns, ep_steps.astype(jnp.float32)]))
            returns, ep_steps = both[0], both[1]  # one host transfer, not two
        avg_r, std_r = float(returns.mean()), float(returns.std())
        avg_s, std_s = float(ep_steps.mean()), float(ep_steps.std())
        used_time = int(time.time() - self.start_time)
        values = [v for v in logging_tuple if isinstance(v, (int, float))]
        logging_str = logging_tuple[-1] if (logging_tuple and isinstance(
            logging_tuple[-1], str)) else ''

        self.recorder.append((total_step, avg_r, std_r, exp_r, *values))
        self.recorder_times.append(float(used_time))
        if self.tensorboard is not None:
            self.tensorboard.add_scalar("reward/avg_reward_sample", avg_r, total_step)
            self.tensorboard.add_scalar("reward/std_reward_sample", std_r, total_step)
            self.tensorboard.add_scalar("reward/exp_reward_sample", exp_r, total_step)
            if values:
                self.tensorboard.add_scalar("info/critic_loss_sample", values[0], total_step)
            if len(values) > 1:
                self.tensorboard.add_scalar("info/actor_obj_sample", values[1], total_step)

        prev_max_r = self.max_r
        self.max_r = max(self.max_r, avg_r)
        print(f"{self.agent_id:<3}{total_step:8.2e}{used_time:8.0f} |"
              f"{avg_r:8.2f}{std_r:7.1f}{avg_s:7.0f}{std_s:6.0f} |"
              f"{exp_r:8.2f}{''.join(f'{v:7.2f}' for v in values)}"
              f"{logging_str}", flush=True)

        if not self.if_keep_save:
            return
        self.save_counter += 1
        actor_path = None
        if avg_r > prev_max_r:
            actor_path = (os.path.join(self.cwd, 'actor.npz') if self.if_over_write
                          else os.path.join(self.cwd,
                                            f'actor__{total_step:012}_{self.max_r:09.3f}.npz'))
        elif self.save_counter >= self.save_gap:
            self.save_counter = 0
            actor_path = (os.path.join(self.cwd, 'actor.npz') if self.if_over_write
                          else os.path.join(self.cwd, f'actor__{total_step:012}.npz'))
        if actor_path:
            save_pytree(actor_path, agent_state)
            self.save_or_load_recorder(if_save=True)

    def save_or_load_recorder(self, if_save: bool) -> None:
        if if_save:
            np.save(self.recorder_path, np.array(self.recorder, dtype=np.float64))
        elif os.path.exists(self.recorder_path):
            rec = np.load(self.recorder_path)
            self.recorder = [tuple(r) for r in rec]
            if self.recorder:
                self.total_step = int(self.recorder[-1][0])

    def save_training_curve_jpg(self) -> None:
        """Render LearningCurve.jpg (reference evaluator.py:241-302)."""
        if not self.recorder:
            return
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        rec = np.array(self.recorder, dtype=np.float64)
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(rec[:, 0], rec[:, 1], color='tab:blue', label='avgR')
        ax.fill_between(rec[:, 0], rec[:, 1] - rec[:, 2], rec[:, 1] + rec[:, 2],
                        color='tab:blue', alpha=0.25)
        ax.set_xlabel('total step')
        ax.set_ylabel('episode return')
        ax.grid(alpha=0.4)
        ax.legend()
        fig.savefig(os.path.join(self.cwd, 'LearningCurve.jpg'), dpi=120)
        plt.close(fig)
