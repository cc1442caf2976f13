"""Fused whole-rollout Pallas kernel: MLP actor/critic + Pendulum dynamics.

Why this exists: the profiler-measured account of the flagship bench config
(scripts/profile_sol.py) shows the fused PPO round is OP-LAUNCH-LATENCY
bound — the rollout ``lax.scan`` alone issues ~35 tiny (~1-2 us) ops per
step x horizon_len steps (actor matmuls, critic matmuls, RNG hashing, env
elementwise math, 7 dynamic-update-slices for the stacked outputs), while
HBM and MXU utilisation both sit near 10%.  Unrolling amortises the loop
bookkeeping but not the per-op latency.  The TPU-native fix is ONE kernel
that keeps the policy weights and the env state resident in VMEM and runs
the entire horizon in a ``fori_loop``, touching HBM only to write the
(H, ...) rollout tensors — the irreducible traffic.

Scope: this is the fast path for the reference's canonical demo workload
(``/root/reference/examples/demo_A2C_PPO.py`` — PPO on Pendulum) with the
default 2-hidden-layer MLP; the generic ``agents/base.py:collect_rollout``
scan remains the general path (the runner auto-selects, train/runner.py).

Layout: everything transposed — activations are (features, envs) so the
env axis rides the 128-wide lane dimension and feature dims sit on
sublanes; MLP layers are ``W^T @ x`` matmuls on the MXU.  Outputs are
written time-major-transposed ((H, S, B) / (H, B)) and un-transposed by the
thin wrapper (one cheap data-formatting op each, outside the hot loop).

RNG: the exploration normals and reset uniforms are drawn OUTSIDE the
kernel with ``jax.random`` (one fused threefry op over the whole
(H, rows, num_envs) tensor — cheap, batched) and streamed into VMEM as a
regular input.  This keeps the fast path deterministic given the key,
testable in the CPU interpreter (whose ``pltpu.prng_random_bits`` is a
constant stub), and distribution-identical to the scan path; the streams
still differ from the scan path's per-step key splits, so the two paths
are not bitwise-identical runs (exact-math parity is verified instead in
tests/test_pallas_rollout.py).  Input traffic cost: (A+2)/8 of the output
bytes — negligible next to the op-launch latency being eliminated.

Behavioral contract matched (exact math, tested):
- stored states/actions/logprobs/values/rewards/unmasks exactly as
  ``collect_rollout`` + ``envs/pendulum.py`` + ``agents/ppo.py`` produce
  them (reference AgentBase.py:130-170 buffer-item contract);
- Pendulum dynamics per envs/pendulum.py:55-71 (g=10 m=1 l=1 dt=0.05,
  action x2 torque wrap, reward x0.5, 200-step truncation, never
  terminates), masked auto-reset per envs/base.py:vec_step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dists import _LOG_SQRT_2PI

_TWO_PI = 2.0 * math.pi


def _wrap_angle(x):
    """((x + pi) mod 2pi) - pi without jnp.mod (Mosaic-friendly floor form)."""
    y = x + math.pi
    return y - jnp.floor(y / _TWO_PI) * _TWO_PI - math.pi


def _uniform_from_bits(bits):
    """Random bits -> f32 uniforms in [0, 1): (bits & 0xFFFFFF) * 2^-24.
    ``prng_random_bits`` yields int32 and Mosaic can't cast uint32->f32, so
    keep the low 24 bits with a mask (non-negative int32, exact in f32).
    """
    return (bits & 0xFFFFFF).astype(jnp.float32) * (2.0 ** -24)


def _make_kernel(horizon_len: int, block: int, action_dim: int,
                 reward_scale: float, quantize: bool = False,
                 internal_rng: bool = False):
    """``quantize``: round obs to bf16 BEFORE the policy acts, matching
    ``collect_rollout``'s quantize-before-act contract (agents/base.py):
    the stored state, the acting input and the update-time re-eval must all
    see bit-identical values so the first-epoch PPO ratio is exactly 1.

    ``internal_rng``: draw the exploration normals and reset uniforms with
    the TPU core's native PRNG (``pltpu.prng_random_bits`` seeded from the
    caller's key + program_id, normals via Box-Muller) instead of streaming
    a host-threefry noise tensor in.  Distribution-identical, different
    stream; removes the ~116 us/round of threefry fusions the profiler
    measured on the flagship config AND the (H, A+2, B) VMEM noise input.
    The interpreter's ``prng_random_bits`` is a constant stub, so interpret
    mode keeps the external path (tests/test_pallas_rollout.py checks the
    external math; the TPU-only statistical test checks the internal draw).
    """
    H, B, A = horizon_len, block, action_dim

    def kernel(*refs):
        if internal_rng:
            (th_ref, thdot_ref, tc_ref, seed_ref,
             avg_ref, nstd_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, wa_ref, ba_ref,
             c1_ref, cb1_ref, c2_ref, cb2_ref, cv_ref, cbv_ref,
             std_ref,
             states_o, actions_o, logp_o, rew_o, trunc_o, val_o,
             th_o, thdot_o, tc_o) = refs
            noise_ref = None
            # prng_seed takes at most 2 words: mix the grid block id into
            # word 0 with a golden-ratio odd constant (int32 wrap is fine)
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * (-1640531527),
                seed_ref[1])
        else:
            (th_ref, thdot_ref, tc_ref,
             noise_ref,                    # (H, A+2, B) f32: z + 2 resets
             avg_ref, nstd_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, wa_ref, ba_ref,
             c1_ref, cb1_ref, c2_ref, cb2_ref, cv_ref, cbv_ref,
             std_ref,
             states_o, actions_o, logp_o, rew_o, trunc_o, val_o,
             th_o, thdot_o, tc_o) = refs
        avg = avg_ref[:]
        nstd = nstd_ref[:] + 1e-4
        w1, b1 = w1_ref[:], b1_ref[:]
        w2, b2 = w2_ref[:], b2_ref[:]
        wa, ba = wa_ref[:], ba_ref[:]
        c1, cb1 = c1_ref[:], cb1_ref[:]
        c2, cb2 = c2_ref[:], cb2_ref[:]
        cv, cbv = cv_ref[:], cbv_ref[:]
        std = std_ref[:]
        log_std = jnp.log(std)

        def body(t, carry):
            th, thdot, tc = carry                          # (1,B)x2 f32, i32
            costh, sinth = jnp.cos(th), jnp.sin(th)
            x = jnp.concatenate([costh, sinth, thdot], axis=0)   # (S, B)
            if quantize:  # storage-precision round BEFORE acting (see above)
                x = x.astype(jnp.bfloat16).astype(jnp.float32)
            states_o[pl.ds(t, 1)] = x[None]                # stored obs
            xn = (x - avg) / nstd
            # actor MLP (gelu hidden, raw head) == ops/nets.py:mlp_apply
            h = jax.nn.gelu(
                jnp.dot(w1, xn, preferred_element_type=jnp.float32) + b1)
            h = jax.nn.gelu(
                jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
            mean = jnp.dot(wa, h, preferred_element_type=jnp.float32) + ba
            # critic (shared state norm) — the in-scan value eval
            hc = jax.nn.gelu(
                jnp.dot(c1, xn, preferred_element_type=jnp.float32) + cb1)
            hc = jax.nn.gelu(
                jnp.dot(c2, hc, preferred_element_type=jnp.float32) + cb2)
            v = jnp.dot(cv, hc, preferred_element_type=jnp.float32) + cbv
            val_o[pl.ds(t, 1)] = v
            if internal_rng:
                # native PRNG: 2A uniforms -> A Box-Muller normals, + 2
                # reset uniforms.  log(1-u) is safe: u in [0, 1-2^-24].
                ub = _uniform_from_bits(
                    pltpu.prng_random_bits((2 * A + 2, B)))
                z = jnp.sqrt(-2.0 * jnp.log(1.0 - ub[0:A])) * jnp.cos(
                    _TWO_PI * ub[A:2 * A])
                u = ub[2 * A:2 * A + 2]
            else:
                # host-drawn noise rows: A normals + 2 uniforms
                nz = noise_ref[pl.ds(t, 1)].reshape(A + 2, B)
                z, u = nz[0:A], nz[A:A + 2]
            action = mean + std * z                        # (A, B)
            actions_o[pl.ds(t, 1)] = action[None]
            logp = jnp.sum(-0.5 * jnp.square(z) - log_std - _LOG_SQRT_2PI,
                           axis=0, keepdims=True)          # (1, B)
            logp_o[pl.ds(t, 1)] = logp
            # Pendulum step (envs/pendulum.py:55-71); env action = tanh
            u_trq = jnp.clip(jnp.tanh(action[0:1]) * 2.0, -2.0, 2.0)
            cost = (jnp.square(_wrap_angle(th)) + 0.1 * jnp.square(thdot)
                    + 0.001 * jnp.square(u_trq))
            rew_o[pl.ds(t, 1)] = -0.5 * cost * reward_scale
            thdot2 = jnp.clip(
                thdot + (15.0 * sinth + 3.0 * u_trq) * 0.05, -8.0, 8.0)
            th2 = th + thdot2 * 0.05
            tc2 = tc + 1
            trunc = tc2 >= 200
            trunc_o[pl.ds(t, 1)] = trunc.astype(jnp.float32)
            # masked auto-reset (envs/base.py:vec_step)
            th2 = jnp.where(trunc, -math.pi + _TWO_PI * u[0:1], th2)
            thdot2 = jnp.where(trunc, -1.0 + 2.0 * u[1:2], thdot2)
            tc2 = jnp.where(trunc, 0, tc2)
            return th2, thdot2, tc2

        th, thdot, tc = jax.lax.fori_loop(
            0, H, body, (th_ref[:], thdot_ref[:], tc_ref[:]))
        th_o[:], thdot_o[:], tc_o[:] = th, thdot, tc

    return kernel


def make_pendulum_ppo_rollout(net_dims, horizon_len: int, num_envs: int,
                              reward_scale: float, store_dtype=None,
                              block: int = 1024, interpret: bool = False):
    """Build ``rollout_fn(agent_state, env_state, obs, key) ->
    (Rollout, env_state', obs')`` — the drop-in fast path for
    ``collect_rollout`` on (PPO Gaussian-MLP x Pendulum)."""
    from ..agents.base import Rollout

    D1, D2 = (int(d) for d in net_dims)
    S, A = 3, 1
    B = min(block, num_envs)
    if num_envs % B:   # uneven env count: leave the generic path to handle it
        raise ValueError(f"num_envs={num_envs} not divisible by block={B}")
    grid = (num_envs // B,)
    H = int(horizon_len)
    if store_dtype is not None and store_dtype != jnp.bfloat16:
        raise ValueError(f'unsupported store_dtype {store_dtype} for the '
                         'fused rollout kernel (only bfloat16 / None)')
    internal_rng = not interpret   # interpreter's prng_random_bits is a stub
    kernel = _make_kernel(H, B, A, float(reward_scale),
                          quantize=store_dtype is not None,
                          internal_rng=internal_rng)

    env_spec = pl.BlockSpec((1, B), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if internal_rng:
        noise_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]   # (2,) seed
    else:
        noise_spec = [pl.BlockSpec((H, A + 2, B), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)]   # noise tensor
    in_specs = [
        env_spec, env_spec, env_spec,                 # th, thdot, tc
        *noise_spec,
        full((S, 1)), full((S, 1)),                   # avg, nstd
        full((D1, S)), full((D1, 1)), full((D2, D1)), full((D2, 1)),
        full((A, D2)), full((A, 1)),
        full((D1, S)), full((D1, 1)), full((D2, D1)), full((D2, 1)),
        full((1, D2)), full((1, 1)),
        full((A, 1)),                                 # std
    ]
    hb_spec = pl.BlockSpec((H, B), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((H, S, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, A, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        hb_spec, hb_spec, hb_spec, hb_spec,
        env_spec, env_spec, env_spec,
    )
    out_shape = (
        jax.ShapeDtypeStruct((H, S, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((H, A, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # logprobs
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # rewards
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # truncates
        jax.ShapeDtypeStruct((H, num_envs), jnp.float32),   # values
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.int32),
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def rollout_fn(agent_state, env_state, obs, key
                   ) -> Tuple[Rollout, object, jax.Array]:
        del obs  # th/thdot are the authoritative state
        (w1, b1), (w2, b2), (wa, ba) = agent_state.act['mlp']
        (c1, cb1), (c2, cb2), (cv, cbv) = agent_state.cri
        std = jnp.exp(agent_state.act['std_log'])            # (1, A)
        if internal_rng:
            # seed the core PRNG from the caller's key (deterministic)
            noise = jax.lax.bitcast_convert_type(
                jax.random.key_data(key).reshape(2), jnp.int32)
        else:
            kz, ku = jax.random.split(key)
            noise = jnp.concatenate([
                jax.random.normal(kz, (H, A, num_envs), jnp.float32),
                jax.random.uniform(ku, (H, 2, num_envs), jnp.float32),
            ], axis=1)
        col = lambda v: v.reshape(-1, 1)
        (states_t, actions_t, logprobs, rewards, truncs, values,
         th, thdot, tc) = call(
            env_state.theta.reshape(1, -1),
            env_state.theta_dot.reshape(1, -1),
            env_state.t.reshape(1, -1),
            noise,
            col(agent_state.norm_avg), col(agent_state.norm_std),
            w1.T, col(b1), w2.T, col(b2), wa.T, col(ba),
            c1.T, col(cb1), c2.T, col(cb2), cv.T, col(cbv),
            std.reshape(A, 1))
        # Keep the kernel-native transposed layout (H, S, N)/(H, A, N) and
        # flag it with the 'tsn' extras marker — the PPO update gathers
        # minibatches from either layout, and skipping the un-transpose
        # saves the round's single largest non-kernel op (~210 us measured,
        # scripts/profile_sol.py 'data formatting').
        if store_dtype is not None:
            states_t = states_t.astype(store_dtype)
        rollout = Rollout(
            states=states_t, actions=actions_t, logprobs=logprobs,
            rewards=rewards,
            undones=jnp.ones_like(rewards),     # Pendulum never terminates
            unmasks=1.0 - truncs,
            extras={'values': values,
                    'tsn': jnp.zeros((horizon_len, 0), jnp.float32)})
        th, thdot = th.reshape(-1), thdot.reshape(-1)
        env_state = type(env_state)(theta=th, theta_dot=thdot,
                                    t=tc.reshape(-1))
        last_obs = jnp.stack([jnp.cos(th), jnp.sin(th), thdot], axis=-1)
        return rollout, env_state, last_obs

    return rollout_fn
