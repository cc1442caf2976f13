"""Training orchestrator: the fused actor-learner loop.

The reference dispatches to three execution modes — single process,
multiprocess Learner/Worker/Evaluator, multi-GPU learner ring
(``elegantrl/train/run.py:25-36``).  On TPU all three collapse into ONE
jitted program per round:

    rollout (lax.scan over vec env + actor)  ->  buffer insert  ->
    GAE / TD targets  ->  minibatch SGD scan  ->  metrics

"Worker parallelism" is the vmapped env axis; "learner parallelism" is mesh
data-parallel sharding of that axis (see ``elegantrl_tpu.parallel``); the
evaluator runs between rounds on device.  The host loop only sequences
compiled calls, checks stop conditions (``break_step`` / ``{cwd}/stop`` file,
reference run.py:130) and logs.

``train_agent`` / ``train_agent_single_process`` /
``train_agent_multiprocessing`` / ``train_agent_multiprocessing_multi_gpu``
mirror the reference's public entry points (run.py:25,39,141,165); the
latter two map onto the same fused program with mesh sharding.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..envs.base import EnvDef, vec_reset
from ..agents.base import (AgentDef, collect_rollout, resolve_storage_dtype)
from ..utils.checkpoint import save_pytree, load_pytree
from .evaluator import Evaluator
from .replay_buffer import ReplayBuffer


class TrainCarry(NamedTuple):
    agent_state: Any
    buf_state: Any         # BufferState or None (on-policy)
    env_state: Any
    obs: jax.Array
    key: jax.Array


def _has_cpu_backend() -> bool:
    try:
        return len(jax.devices('cpu')) > 0
    except RuntimeError:
        return False


def _resolve_env_def(args: Config) -> EnvDef:
    """Accept an EnvDef directly, a VecEnv-style class, or an instance."""
    env_class, env_args = args.env_class, dict(args.env_args or {})
    if isinstance(env_class, EnvDef):
        return env_class
    if hasattr(env_class, '_def'):  # instance of our VecEnv adapter
        return env_class._def
    # our env classes construct a VecEnv adapter holding _def
    from ..config import kwargs_filter
    env = env_class(**kwargs_filter(env_class.__init__, env_args))
    if hasattr(env, '_def'):
        return env._def
    raise TypeError(
        f"{env_class} is not a pure-JAX env (no EnvDef). External (host) envs "
        "are not yet supported in the fused TPU loop.")


def _make_agent(args: Config, buffer: Optional[ReplayBuffer]) -> AgentDef:
    agent_class = args.agent_class
    make = getattr(agent_class, 'make', None)
    if make is None and callable(agent_class):
        make = agent_class
    return make(args.net_dims, args.state_dim, args.action_dim, args,
                buffer=buffer)


# agent name -> fused off-policy exploration head (ops/pallas_rollout.py).
# H-term variants share the base explore_action (the H-term only changes the
# update), so they ride the same head.  EmbedDQN/EnsembleDQN have non-MLP
# policy nets and stay on the scan path.
_OFFPOLICY_KERNEL_HEADS = {
    'AgentDDPG': 'ddpg', 'AgentDDPGHterm': 'ddpg',
    'AgentTD3': 'ddpg', 'AgentTD3Hterm': 'ddpg',
    'AgentSAC': 'sac', 'AgentSACHterm': 'sac',
    'AgentModSAC': 'modsac', 'AgentModSACHterm': 'modsac',
    'AgentDQN': 'dqn', 'AgentDoubleDQN': 'dqn_enc',
    'AgentDuelingDQN': 'dqn_duel', 'AgentD3QN': 'dqn_duel',
}


def _maybe_pallas_rollout(args, env: EnvDef, agent: AgentDef, num_envs: int,
                          horizon_len: int, reward_scale: float,
                          store_dtype, mesh):
    """Auto-select the fused whole-rollout Pallas kernel
    (``ops/pallas_rollout.py``) when the workload matches its scope:
    (Discrete)PPO with a 2-hidden-layer MLP on an env with a kernel body
    (registry: Pendulum, CartPole, HopperSlip, PointChasing cont+disc;
    instance-attached via ``EnvDef.kernel_body``: StockTrading), on a real
    TPU — single chip, or shard_mapped over a single-axis mesh (one kernel
    instance per device on its env shard).  Long horizons run time-chunked
    (env state carried in VMEM scratch), so the reference-demo-shaped
    horizon-2048 config qualifies.
    ``args.use_pallas_rollout``: 'auto' (default) | True | False |
    'interpret' (CPU tests)."""
    mode = getattr(args, 'use_pallas_rollout', 'auto')
    if mode in (False, 'false', '0'):
        return None
    n_shards = 1
    if mesh is not None:
        # mesh DP: shard_map the kernel over the first mesh axis — each
        # device runs the single-chip kernel on its env shard
        # (ops/pallas_rollout.py:make_sharded_fused_rollout)
        n_shards = int(np.prod(mesh.devices.shape))
        if len(mesh.axis_names) != 1 or num_envs % n_shards:
            if mode is True:
                raise ValueError(
                    'use_pallas_rollout=True under a mesh needs a single '
                    f'mesh axis and num_envs % {n_shards} == 0 '
                    f'(got axes={mesh.axis_names}, num_envs={num_envs})')
            return None
    interpret = (mode == 'interpret')
    spec = env.spec
    from ..ops.pallas_rollout import KERNEL_ENV_BODIES, make_fused_rollout
    body = (getattr(env, 'kernel_body', None)
            or KERNEL_ENV_BODIES.get(spec.env_name))
    if body is not None and (body.state_dim != spec.state_dim
                             or body.action_dim != spec.action_dim):
        body = None   # e.g. PointChasing with dim != 2: body is dim-fixed
    # A2C shares PPO's exploration contract exactly (same factory, same
    # actor/critic/logprob/value stores — agents/ppo.py:make_ppo); only its
    # update differs, and the time-slice gather handles the kernel's
    # transposed layout (ppo.py 'tsn' branch)
    want_agents = (('AgentDiscretePPO', 'AgentDiscreteA2C')
                   if spec.if_discrete else ('AgentPPO', 'AgentA2C'))
    # Off-policy exploration heads (ops/pallas_rollout.py:OFFPOLICY_HEADS):
    # same fused-rollout kernel family minus the critic/logp plumbing.
    off_head = _OFFPOLICY_KERNEL_HEADS.get(agent.name)
    eligible = (body is not None and env.host_pool is None
                and len(tuple(args.net_dims)) == 2
                and (agent.name in want_agents
                     or (off_head is not None
                         and agent.rollout_extras is None)))
    if not eligible:
        if mode is True:
            raise ValueError(
                'use_pallas_rollout=True requires a 2-hidden-layer MLP '
                f'(Discrete)PPO or off-policy agent '
                f'({sorted(_OFFPOLICY_KERNEL_HEADS)}) on a kernel-body env '
                f'{sorted(KERNEL_ENV_BODIES)} (got agent={agent.name}, '
                f'env={spec.env_name}, net_dims={args.net_dims})')
        return None
    # VMEM budget: the per-(block x chunk) rollout outputs (+ the noise
    # input on the interpret path) live in VMEM.  Keep them under ~4 MB of
    # the ~16 MB VMEM (weights/activations/scratch need the rest).  Pick
    # the widest env block (lane utilisation), then the longest time chunk
    # that fits; horizons longer than the chunk iterate the chunk grid dim.
    S, A = body.state_dim, body.action_dim
    if off_head is None:
        noise_rows = (A + body.n_step + body.n_reset) if interpret else 0
        rows = S + (1 if spec.if_discrete else A) + 5 + noise_rows
    else:
        nz = ((2 + body.n_step + body.n_reset) if spec.if_discrete
              else (A + body.n_step + body.n_reset))
        noise_rows = nz if interpret else 0
        rows = S + (1 if spec.if_discrete else A) + 3 + noise_rows
    # VMEM-resident market tables (StockTrading) eat into the block budget
    tab_bytes = sum(int(t.size) * 4 for t in body.tables)
    # 2048-wide blocks measured fastest on every registered env body at
    # 4096 envs (Pendulum 388->413M, CartPole 377->414M, HopperSlip
    # 302->311M env-steps/s full-round; 4096-wide was slightly below 2048).
    # Below 128 envs the whole env count rides ONE lane-padded block:
    # those configs are pure launch-latency (horizon x ~30 scan ops vs one
    # kernel) — measured 21.5x at 8 Pendulum envs (732.6k -> 15.8M
    # env-steps/s rollout half, TD3 head, 2026-08-20); the idle lanes cost
    # nothing that matters at that scale.
    envs_local = num_envs // n_shards     # per-device env count under a mesh
    if interpret:
        sizes = (16, 8)
    elif envs_local < 128:
        sizes = (envs_local,)
    else:
        sizes = (2048, 1024, 512, 256, 128)
    forced = getattr(args, 'pallas_rollout_block', None)
    if forced:   # tuning override: exact env-block width
        sizes = (int(forced),)
    block, chunk = None, None
    # Mosaic block-shape rule: the (chunk, block) output specs need the
    # sublane (chunk) dim % 8 == 0 unless the block covers the whole array
    # (chunk == horizon).  Interpret mode has no such constraint.
    cands = [c for c in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
             if interpret or c % 8 == 0]
    if horizon_len not in cands:
        cands.insert(0, horizon_len)
    cands.sort(reverse=True)
    for b in sizes:
        if envs_local % b or b > envs_local:
            continue
        ch = next((c for c in cands
                   if c <= horizon_len and horizon_len % c == 0
                   and rows * c * b * 4 <= 4 * 2 ** 20 - tab_bytes), None)
        if ch is not None and (block is None or ch * 4 >= chunk):
            # prefer wider blocks unless the chunk collapses (>4x shorter)
            block, chunk = b, ch
            break
    if block is None:
        if mode is True:
            raise ValueError(
                f'use_pallas_rollout=True: no (block, chunk) fits VMEM for '
                f'num_envs={envs_local}/device, horizon_len={horizon_len}')
        return None
    if not interpret and jax.devices()[0].platform != 'tpu':
        if mode is True:   # explicit request must not silently fall back
            raise ValueError(
                'use_pallas_rollout=True: Mosaic kernels need a real TPU '
                f'(current backend: {jax.devices()[0].platform}); use '
                "use_pallas_rollout='interpret' for CPU testing")
        return None
    shard_note = f", sharded x{n_shards}" if mesh is not None else ""
    head_note = f", head={off_head}" if off_head is not None else ""
    print("| build_training: pallas fused-rollout fast path enabled "
          f"(env={spec.env_name}, block={block}, chunk={chunk}"
          f"{head_note}{shard_note})", flush=True)
    from ..agents.base import resolve_compute_dtype
    compute_dtype = resolve_compute_dtype(args, tuple(args.net_dims))
    if off_head is not None:
        from ..ops.pallas_rollout import (make_fused_offpolicy_rollout,
                                          make_sharded_offpolicy_rollout)
        # hyper defaults MUST mirror the agent factories', which read the
        # same args (agents/ddpg_td3.py:62-63, sac.py:76, dqn.py:44 —
        # cross-checked by tests/test_pallas_offpolicy.py)
        head_cfg = {
            'noise_std': float(getattr(args, 'explore_noise_std',
                                       getattr(args, 'explore_noise', 0.05))),
            'std_clip': ((-20.0, 2.0) if off_head == 'modsac'
                         else (-16.0, 2.0)),
            'explore_rate': float(getattr(args, 'explore_rate', 0.25)),
        }
        if mesh is not None:
            return make_sharded_offpolicy_rollout(
                body, tuple(args.net_dims), horizon_len, num_envs,
                reward_scale, mesh, head=off_head, head_cfg=head_cfg,
                store_dtype=store_dtype, block=block, chunk=chunk,
                interpret=interpret, compute_dtype=compute_dtype)
        return make_fused_offpolicy_rollout(
            body, tuple(args.net_dims), horizon_len, num_envs, reward_scale,
            head=off_head, head_cfg=head_cfg, store_dtype=store_dtype,
            block=block, chunk=chunk, interpret=interpret,
            compute_dtype=compute_dtype)
    if mesh is not None:
        from ..ops.pallas_rollout import make_sharded_fused_rollout
        return make_sharded_fused_rollout(
            body, tuple(args.net_dims), horizon_len, num_envs, reward_scale,
            mesh, discrete=bool(spec.if_discrete), store_dtype=store_dtype,
            block=block, chunk=chunk, interpret=interpret,
            compute_dtype=compute_dtype)
    return make_fused_rollout(
        body, tuple(args.net_dims), horizon_len, num_envs, reward_scale,
        discrete=bool(spec.if_discrete), store_dtype=store_dtype,
        block=block, chunk=chunk, interpret=interpret,
        compute_dtype=compute_dtype)


class TrainContext(NamedTuple):
    env: EnvDef
    agent: AgentDef
    rb: Optional[ReplayBuffer]
    round_fn: Any        # (TrainCarry, None) -> (TrainCarry, metrics)
    carry: TrainCarry
    steps_per_round: int
    # (TrainCarry, Rollout, last_obs) -> (TrainCarry, metrics): the update
    # half of round_fn for rollouts collected OUTSIDE the jit program
    # (host-rollout mode, envs/host_env.py:host_collect_rollout)
    update_from_rollout: Any = None
    # decided ONCE here (train_agent and the evaluator must agree: the pool
    # is stateful, and build_training already initialized obs from it)
    use_host_rollout: bool = False


def build_training(args: Config, mesh=None) -> TrainContext:
    """Construct env/agent/buffer and the fused per-round step function.
    Shared by ``train_agent``, the benchmark harness and the multi-chip
    dry-run.  When ``mesh`` is given the carry is sharded env-axis
    data-parallel (see ``elegantrl_tpu.parallel.mesh``)."""
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(getattr(args, 'compilation_cache_dir', None))
    env = _resolve_env_def(args)
    spec = env.spec
    if args.state_dim is None:
        args.state_dim = spec.state_dim
    if args.action_dim is None:
        args.action_dim = spec.action_dim
    if args.if_discrete is None:
        args.if_discrete = spec.if_discrete
    if args.max_step == 12345:
        args.max_step = spec.max_step
    num_envs = int(args.num_envs)
    horizon_len = int(args.horizon_len)
    reward_scale = float(args.reward_scale)

    '''buffer (off-policy only, reference run.py:64-76)'''
    if args.if_off_policy:
        rb = ReplayBuffer(max_size=args.buffer_size, state_dim=args.state_dim,
                          action_dim=args.action_dim, num_seqs=num_envs,
                          if_use_per=bool(getattr(args, 'if_use_per', False)),
                          if_discrete=bool(args.if_discrete), args=args)
    else:
        rb = None

    agent = _make_agent(args, rb)

    if args.random_seed is None:
        args.random_seed = max(0, int(args.gpu_id))
    key = jax.random.key(int(args.random_seed))
    k_agent, k_env, k_train = jax.random.split(key, 3)
    agent_state = agent.init(k_agent)
    if args.continue_train:
        ckpt = os.path.join(args.cwd, 'agent.npz')
        if os.path.isfile(ckpt):
            agent_state = load_pytree(ckpt, agent_state)
            print(f"| train_agent: loaded {ckpt}", flush=True)
    # Host-pool envs ride host-rollout mode with or without a mesh: the host
    # pool is the Worker (reference run.py:361-418), and under a mesh the
    # uploaded rollout is sharded env-axis DP so the update half trains
    # data-parallel across chips (the reference's multi-GPU mode builds
    # per-process envs feeding per-GPU learners, run.py:165-202 — here one
    # host pool feeds N device shards).  Multi-PROCESS meshes would need the
    # pool split across hosts; single-process (multi-chip) only for now.
    use_host_rollout = (env.host_pool is not None
                        and (mesh is None or jax.process_count() == 1)
                        and bool(getattr(args, 'host_rollout', True)))
    if use_host_rollout and not _has_cpu_backend():
        # Host-rollout needs an in-process CPU backend for actor inference.
        # Without one (platform-pinned process), fall back to the fused
        # io_callback path rather than crashing in the host loop.
        print("| build_training: no CPU JAX backend — host-rollout mode "
              "disabled, using in-program io_callback env steps", flush=True)
        use_host_rollout = False
    if use_host_rollout:
        # Host-rollout mode never steps the env through io_callback — and it
        # must not init through it either: an EAGER io_callback executes on
        # the device runtime, and the tunneled (remote) TPU executor cannot
        # call back into this local Python process (deadlocks).  Drive the
        # pool directly.
        obs = jnp.asarray(env.host_pool.reset_all(np.int32(num_envs)))
        env_state = jnp.zeros(num_envs, jnp.int32)
    else:
        env_state, obs = vec_reset(env, k_env, num_envs)
    buf_state = rb.init() if rb else None

    '''one fused round: explore horizon_len steps then update'''
    def _update_half(carry: TrainCarry, rollout, env_state, obs, key, k_upd):
        exp_r = jnp.mean(rollout.rewards)
        if agent.if_off_policy:
            agent_state0 = carry.agent_state
            if agent.pre_update is not None:  # e.g. H-term window harvest
                agent_state0 = agent.pre_update(agent_state0, rollout, obs)
            buf_state = rb.update(carry.buf_state, (
                rollout.states, rollout.actions, rollout.rewards,
                rollout.undones, rollout.unmasks))
            if rb.if_use_cum_rewards and agent.cum_returns is not None:
                returns = agent.cum_returns(agent_state0, rollout, obs)
                buf_state = rb.update_cum_rewards(buf_state, horizon_len, returns)
            agent_state, buf_state, metrics = agent.update(
                agent_state0, buf_state, k_upd)
        else:
            buf_state = carry.buf_state
            agent_state, metrics = agent.update(
                carry.agent_state, rollout, obs, k_upd)
        metrics = dict(metrics, exp_r=exp_r)
        if agent.if_discrete:  # action histogram (reference run.py:92-98)
            metrics['action_hist'] = jnp.bincount(
                rollout.actions.reshape(-1), length=int(args.action_dim))
        return TrainCarry(agent_state, buf_state, env_state, obs, key), metrics

    store_dtype = resolve_storage_dtype(args)
    rollout_unroll = int(getattr(args, 'rollout_unroll', 4))
    fast_rollout = _maybe_pallas_rollout(args, env, agent, num_envs,
                                         horizon_len, reward_scale,
                                         store_dtype, mesh)

    def round_fn(carry: TrainCarry, _):
        key, k_roll, k_upd = jax.random.split(carry.key, 3)
        if fast_rollout is not None:
            rollout, env_state, obs = fast_rollout(
                carry.agent_state, carry.env_state, carry.obs, k_roll)
        else:
            rollout, env_state, obs = collect_rollout(
                env, carry.agent_state, agent.explore_action,
                agent.env_action, carry.env_state, carry.obs, k_roll,
                horizon_len, reward_scale,
                extras_fn=agent.rollout_extras, store_dtype=store_dtype,
                unroll=rollout_unroll)
        return _update_half(carry, rollout, env_state, obs, key, k_upd)

    def update_from_rollout(carry: TrainCarry, rollout, last_obs):
        key, k_upd = jax.random.split(carry.key)
        return _update_half(carry, rollout, carry.env_state, last_obs,
                            key, k_upd)

    carry = TrainCarry(agent_state, buf_state, env_state, obs, k_train)
    if args.continue_train:
        # full-carry restore (agent + buffer + env + rng): training resumed
        # from round k is bitwise-identical to never having stopped (see
        # tests/test_checkpoint.py::test_resume_equivalence)
        full_ckpt = os.path.join(args.cwd, 'train_carry.npz')
        if os.path.isfile(full_ckpt):
            carry = load_pytree(full_ckpt, carry)
            print(f"| train_agent: resumed full carry from {full_ckpt}", flush=True)
            if use_host_rollout:
                # The host pool's env states are NOT checkpointable; the pool
                # was freshly reset above.  Keep the restored agent/buffer/rng
                # but re-point obs at the pool's actual episode starts so the
                # first stored transition pairs real (s, a, r, s') — the
                # checkpointed obs describe episodes the envs are no longer in.
                carry = carry._replace(obs=obs, env_state=env_state)
    if mesh is not None:
        from ..parallel.mesh import shard_train_carry
        carry = shard_train_carry(mesh, carry)
    return TrainContext(env=env, agent=agent, rb=rb, round_fn=round_fn,
                        carry=carry, steps_per_round=horizon_len * num_envs,
                        update_from_rollout=update_from_rollout,
                        use_host_rollout=use_host_rollout)


def train_agent(args: Config, if_single_process: bool = True) -> dict:
    """Train and evaluate; returns a result dict with the recorder array,
    final agent state, and throughput stats."""
    args.init_before_training()
    mesh = None
    if getattr(args, 'mesh_axes', None):
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh_axes)
    ctx = build_training(args, mesh=mesh)
    env, agent, rb, round_fn = ctx.env, ctx.agent, ctx.rb, ctx.round_fn
    carry = ctx.carry
    steps_per_round = ctx.steps_per_round

    # Buffer donation halves peak memory for off-policy training, but the
    # experimental tunneled-TPU ('axon') runtime deadlocks on some donated
    # programs (verified: identical program completes in ~60 ms undonated,
    # never completes donated).  Off by default; enable with
    # ``args.donate_carry = True`` on standard PJRT backends.
    donate = (0,) if bool(getattr(args, 'donate_carry', False)) else ()

    metric_shapes = jax.eval_shape(lambda c: round_fn(c, None)[1], carry)
    metric_names = sorted(k for k in metric_shapes if k != 'action_hist')
    has_hist = 'action_hist' in metric_shapes

    @partial(jax.jit, static_argnums=1, donate_argnums=donate)
    def train_rounds(carry: TrainCarry, n_rounds: int):
        carry, metrics = jax.lax.scan(round_fn, carry, None, length=n_rounds)
        # reduce metrics on device and pack them into ONE small array so the
        # host pays a single transfer round-trip, not one per metric
        packed = jnp.stack([jnp.mean(metrics[k]) for k in metric_names])
        if has_hist:
            packed = jnp.concatenate(
                [packed, jnp.sum(metrics['action_hist'], axis=0).astype(jnp.float32)])
        return carry, packed

    # Host-rollout mode (host-callback envs only, default on, decided once in
    # build_training): exploration runs on the host — actor inference on the
    # in-process CPU backend, envs stepped directly on the pool — and only
    # the update half dispatches to the accelerator.  One params fetch + one
    # rollout upload per round replaces horizon_len ordered io_callback
    # round-trips (~25 ms each over the tunneled TPU link).  This is the
    # reference Worker process (run.py:361-418) re-created: actor broadcast
    # out, rollout gather back.
    use_host_rollout = ctx.use_host_rollout
    params_fetch = None
    if use_host_rollout:
        from ..envs.host_env import make_params_fetcher
        cpu = jax.devices('cpu')[0]
        params_fetch = make_params_fetcher(
            agent.explore_view, agent.explore_merge, carry.agent_state, cpu)

    '''evaluator (reference run.py:79-82)'''
    # host-callback envs own a stateful pool: the evaluator gets its OWN
    # instance so eval episodes can't reset/resize the training pool
    eval_env = env.fresh() if env.fresh is not None else env
    if args.eval_env_class is not None:
        eval_args = Config(args.agent_class, args.eval_env_class,
                           args.eval_env_args or dict(args.env_args))
        eval_env = _resolve_env_def(eval_args)
    evaluator = Evaluator(cwd=args.cwd, env=eval_env,
                          greedy_action=agent.greedy_action, args=args,
                          host_eval=use_host_rollout, params_fetch=params_fetch)

    rounds_per_eval = max(1, int(args.eval_per_step) // steps_per_round)

    def _process(packed, handle):
        """Fetch one round's packed metrics (single host transfer) and, if an
        eval was dispatched for it, record/print/save its results."""
        packed = np.asarray(packed)
        metrics = dict(zip(metric_names, packed[:len(metric_names)].tolist()))
        logging_tuple = (metrics.get('obj_critic', 0.0),
                         metrics.get('obj_actor', 0.0))
        if has_hist:
            counts = packed[len(metric_names):]
            frac = counts / max(counts.sum(), 1)
            logging_tuple = (*logging_tuple,
                             ' a:' + ' '.join(f'{f:.2f}' for f in frac))
        if handle is not None:
            evaluator.finish(handle, exp_r=metrics.get('exp_r', 0.0),
                             logging_tuple=logging_tuple)

    total_step = 0
    t_start = time.time()
    if_train = True

    # Mid-run full-carry checkpointing: resumable runs (continue_train or
    # if_save_buffer) write train_carry.npz every save_gap eval periods, so
    # a killed/wedged process loses at most one interval instead of the
    # whole run (the tunneled TPU link occasionally wedges a long-running
    # process's transfers — observed on multi-hour host-rollout runs).
    # End-of-run still writes the final carry below, as before.
    _carry_resumable = (args.continue_train or args.if_save_buffer)
    _carry_gap = max(1, int(getattr(args, 'save_gap', 8)))
    _evals_done = [0]

    def _maybe_save_carry(carry):
        if not _carry_resumable:
            return
        _evals_done[0] += 1
        if _evals_done[0] % _carry_gap == 0:
            addressable = all(getattr(x, 'is_fully_addressable', True)
                              for x in jax.tree.leaves(carry))
            if addressable:
                path = os.path.join(args.cwd, 'train_carry.npz')
                save_pytree(path + '.tmp.npz', carry)
                os.replace(path + '.tmp.npz', path)  # atomic: no torn ckpt

    if use_host_rollout:
        from ..envs.host_env import host_collect_rollout, make_explore_env_fn
        # one jitted explore+convert per step on the CPU backend (measured
        # fastest — docs/performance.md "Host-rollout loop anatomy")
        explore_env_jit = make_explore_env_fn(agent)
        horizon_len = int(args.horizon_len)
        reward_scale = float(args.reward_scale)

        @jax.jit
        def update_packed(carry, rollout, last_obs):
            carry, metrics = ctx.update_from_rollout(carry, rollout, last_obs)
            packed = jnp.stack([metrics[k] for k in metric_names])
            if has_hist:
                packed = jnp.concatenate(
                    [packed, metrics['action_hist'].astype(jnp.float32)])
            return carry, packed

        if mesh is not None:
            # env-axis DP: the host-collected rollout uploads sharded over
            # the mesh so the jitted update half trains data-parallel (XLA
            # inserts the cross-shard gathers/reductions, exactly as in the
            # fused on-device path under a mesh)
            from jax.sharding import NamedSharding, PartitionSpec as P

            def _to_device(tree):
                def put(x):
                    if x is None:
                        return None
                    spec = (P(None, 'dp', *([None] * (x.ndim - 2)))
                            if x.ndim >= 2 else P(None))
                    return jax.device_put(x, NamedSharding(mesh, spec))
                return jax.tree.map(put, tree)

            def _obs_to_device(o):
                return jax.device_put(
                    o, NamedSharding(mesh, P('dp', *([None] * (o.ndim - 1)))))
        else:
            _to_device = lambda tree: jax.tree.map(jnp.asarray, tree)
            _obs_to_device = jnp.asarray
        obs_host = np.asarray(carry.obs)
        with jax.default_device(cpu):
            k_host = jax.random.key(int(args.random_seed) + 0x705)
        while if_train:
            packs = []
            for _ in range(rounds_per_eval):
                params_cpu = params_fetch(carry.agent_state)
                with jax.default_device(cpu):
                    k_host, k_roll = jax.random.split(k_host)
                arrs, obs_host = host_collect_rollout(
                    env.host_pool, explore_env_jit, params_cpu,
                    obs_host, k_roll, horizon_len, reward_scale, cpu)
                rollout = _to_device(arrs)
                carry, packed = update_packed(carry, rollout,
                                              _obs_to_device(obs_host))
                packs.append(packed)   # device arrays; fetched at eval time
            handle = evaluator.dispatch(
                carry.agent_state, steps=steps_per_round * rounds_per_eval)
            # one on-device stack + ONE host fetch, not rounds_per_eval fetches
            _process(np.asarray(jnp.mean(jnp.stack(packs), 0)), handle)
            _maybe_save_carry(carry)
            total_step += steps_per_round * rounds_per_eval
            if_train = (total_step <= args.break_step
                        and evaluator.max_r < args.break_score
                        and not os.path.exists(os.path.join(args.cwd, 'stop')))
        prev = None
    else:
        # Software-pipelined host loop (replaces the reference's concurrent
        # EvaluatorProc, run.py:421-475): dispatch train_rounds + eval for
        # round i, then while the device executes them, fetch and record
        # round i-1's results.  The device queue never drains, so
        # eval/logging round-trips cost zero device idle time.  Donation
        # invalidates the previous carry's buffers at the next dispatch, so
        # with donate_carry the loop falls back to depth-1 (process
        # immediately).
        pipeline = not donate
        prev = None
        while if_train:
            carry, packed = train_rounds(carry, rounds_per_eval)  # async dispatch
            handle = evaluator.dispatch(
                carry.agent_state, steps=steps_per_round * rounds_per_eval)
            if prev is not None:
                _process(*prev)      # overlaps with the device's current round
            prev = (packed, handle)
            if not pipeline:
                _process(*prev)
                prev = None
            _maybe_save_carry(carry)   # blocks on the in-flight round only
            #                            every save_gap evals, when resumable
            total_step += steps_per_round * rounds_per_eval
            if_train = (total_step <= args.break_step
                        and evaluator.max_r < args.break_score
                        and not os.path.exists(os.path.join(args.cwd, 'stop')))
    if prev is not None:
        _process(*prev)

    used_time = time.time() - t_start
    print(f'| UsedTime: {used_time:>7.0f} | SavedDir: {args.cwd}', flush=True)
    evaluator.save_or_load_recorder(if_save=True)
    evaluator.save_training_curve_jpg()
    save_pytree(os.path.join(args.cwd, 'agent.npz'), carry.agent_state)
    # full-carry checkpoint enables bitwise resume (continue_train).  For
    # off-policy runs the carry contains the whole replay ring, so writing it
    # follows the reference's if_save_buffer contract (run.py:352-357) —
    # set if_save_buffer=True (or continue_train) to make the run resumable.
    # Multi-process meshes skip it: non-addressable shards can't be fetched.
    save_carry = (rb is None or args.if_save_buffer or args.continue_train)
    addressable = all(getattr(x, 'is_fully_addressable', True)
                      for x in jax.tree.leaves(carry))
    if save_carry and addressable:
        save_pytree(os.path.join(args.cwd, 'train_carry.npz'), carry)
    if args.if_save_buffer and rb is not None:
        rb.save_or_load_history(carry.buf_state, args.cwd, if_save=True)

    return {
        'recorder': np.array(evaluator.recorder, dtype=np.float64),
        'recorder_times': np.array(evaluator.recorder_times, dtype=np.float64),
        'agent_state': carry.agent_state,
        'total_step': total_step,
        'used_time': used_time,
        'steps_per_second': total_step / max(used_time, 1e-9),
        'max_r': evaluator.max_r,
    }


def train_agent_single_process(args: Config) -> dict:
    return train_agent(args)


def train_agent_multiprocessing(args: Config) -> dict:
    """The worker/learner/evaluator process triangle (reference
    run.py:141-162) is fused into the single jit program on TPU; this alias
    exists for API parity."""
    return train_agent(args)


def train_agent_multiprocessing_multi_gpu(args: Config) -> dict:
    """Multi-learner training (reference run.py:165-202).  On TPU, set
    ``args.mesh_axes = {'dp': n}`` to shard the env axis over the device mesh
    instead of spawning per-GPU learner processes."""
    return train_agent(args)


def valid_agent(env_class, env_args: dict, net_dims, agent_class,
                actor_path: str, render_times: int = 8) -> list:
    """Load a saved agent checkpoint and report greedy episode returns
    (reference ``valid_agent``/``render_agent``, run.py:481-509; TPU envs
    have no GUI, so 'render' = print per-episode return/steps)."""
    from .evaluator import make_eval_fn

    args = Config(agent_class, env_class, dict(env_args))
    args.net_dims = net_dims
    env = _resolve_env_def(args)
    agent = _make_agent(args, None) if not args.if_off_policy else None
    if agent is None:
        rb = ReplayBuffer(max_size=8, state_dim=args.state_dim,
                          action_dim=args.action_dim, num_seqs=1,
                          if_discrete=bool(args.if_discrete), args=args)
        agent = _make_agent(args, rb)
    agent_state = agent.init(jax.random.key(0))
    print(f"| valid_agent: load actor from: {actor_path}", flush=True)
    agent_state = load_pytree(actor_path, agent_state)

    eval_fn = make_eval_fn(env, agent.greedy_action, render_times,
                           env.spec.max_step)
    returns, steps = eval_fn(agent_state, jax.random.key(1))
    results = []
    for i, (r, s) in enumerate(zip(np.asarray(returns), np.asarray(steps))):
        print(f"|{i:4}  cumulative_reward {float(r):9.3f}  episode_step {int(s):5d}",
              flush=True)
        results.append((float(r), int(s)))
    return results


render_agent = valid_agent
