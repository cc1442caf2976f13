"""Fused whole-update Pallas kernel: the PPO minibatch-SGD loop in ONE op.

Why this exists: after the fused rollout kernel (``ops/pallas_rollout.py``)
took the rollout half of the flagship round to ~380 us, the profiler
(``scripts/profile_sol.py``) showed the update half dominating: ~585 us/round
of GAE + minibatch gathers + tiny (512 x 128) matmul fwd/bwd chains + Adam —
dozens of ~1-2 us ops per minibatch, op-launch-latency bound exactly like the
rollout was (reference update loop: ``elegantrl/agents/AgentPPO.py:159-205``).

The TPU-native fix is the same op-count attack: ONE kernel that keeps the
actor/critic params AND their Adam moments resident in VMEM and runs the
entire ``update_times`` SGD loop as a ``fori_loop``.  The minibatches are
pre-gathered OUTSIDE the kernel (one batched XLA gather per tensor, using
bit-identical RNG streams to the scan path's per-minibatch
``sample_flat_ids``), so the kernel touches HBM only to read its (U, ..., B)
minibatch block and write the updated params — the irreducible traffic.

Layout: everything transposed, exactly like the rollout kernel — minibatch
activations are (features, B) with the batch riding the 128-wide lane dim,
params enter as W^T / column biases, and per-sample vectors (logprob,
advantage, ...) are (1, B) rows.  Adam/clip are elementwise/norm ops, so
updating transposed params with transposed grads IS the transposed update —
the wrapper transposes back once at the end.

The loss/grad math is not hand-derived: the kernel body traces the SAME jnp
loss closures the scan path uses and differentiates them with
``jax.value_and_grad`` *inside* the kernel (autodiff happens at trace time;
the VJP ops — matmuls, gelu-grad elementwise chains, reductions — all lower
to Mosaic).  Optimizer math replicates optax exactly:

- ``clip_by_global_norm``: ``select(gn < clip, g, g * clip / gn)``
  (optax/_src/clipping.py);
- ``scale_by_adam`` + ``scale(-lr)``: ``mu = b1*mu + (1-b1)*g``,
  ``nu = b2*nu + (1-b2)*g**2``, ``p += -lr * (mu/bc1) / (sqrt(nu/bc2) + eps)``
  with bias corrections ``bc = 1 - beta**count`` PRECOMPUTED outside the
  kernel per iteration (a (U, 4) SMEM table), matching optax's int-count pow.

Scope: Gaussian-MLP PPO or categorical DiscretePPO (any env — the update
half is env-independent), 2 hidden layers, batch_size a multiple of 128,
f32 compute, single chip.  Parity: tests/test_pallas_update.py asserts the
fused update matches the scan path's new params/metrics to f32 tolerance on
identical inputs (same minibatch ids by construction).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dists


def _adam_parts(opt_state):
    """Extract (count, mu, nu) from ``make_optimizer``'s
    chain(clip_by_global_norm, adam) state; see agents/base.py."""
    adam = opt_state[1][0]
    return adam.count, adam.mu, adam.nu


def _with_adam_parts(opt_state, count, mu, nu):
    adam = opt_state[1][0]._replace(count=count, mu=mu, nu=nu)
    return (opt_state[0], (adam, *opt_state[1][1:]))


def _to_kernel(x):
    """Transpose a param leaf into kernel layout: (in, out) weights ->
    (out, in); 1-D biases -> (D, 1) columns; (1, A) std_log -> (A, 1)."""
    return x.reshape(-1, 1) if x.ndim == 1 else x.T


def _from_kernel(x, shape):
    return x.reshape(shape) if len(shape) == 1 else x.T


def _make_kernel(U: int, B: int, S: int, A: int, n_act: int, n_cri: int,
                 hp: dict):
    """hp: ratio_clip, lambda_entropy, lr, clip_grad, b1, b2, eps,
    single_sided (bool)."""
    ratio_clip = hp['ratio_clip']
    lambda_entropy = hp['lambda_entropy']
    lr, clip_grad = hp['lr'], hp['clip_grad']
    b1, b2, eps = hp['b1'], hp['b2'], hp['eps']
    single_sided = hp['single_sided']
    discrete = hp['discrete']
    n_leaves = n_act + n_cri

    def adam_step(params, mus, nus, grads, bc1, bc2):
        """Exact optax chain(clip_by_global_norm, adam) on flat leaf lists."""
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in grads))
        scale = jnp.where(gn < clip_grad, 1.0, clip_grad / gn)
        new_p, new_mu, new_nu = [], [], []
        for p, mu, nu, g in zip(params, mus, nus, grads):
            g = g * scale
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            new_p.append(p - lr * upd)
            new_mu.append(mu)
            new_nu.append(nu)
        return new_p, new_mu, new_nu

    def kernel(*refs):
        (sb_ref, ab_ref, lp_ref, adv_ref, rs_ref, um_ref,   # minibatch data
         avg_ref, nstd_ref, bc_ref) = refs[:9]              # norm + SMEM bias
        param_refs = refs[9:9 + n_leaves]
        mu_refs = refs[9 + n_leaves:9 + 2 * n_leaves]
        nu_refs = refs[9 + 2 * n_leaves:9 + 3 * n_leaves]
        out_param = refs[9 + 3 * n_leaves:9 + 4 * n_leaves]
        out_mu = refs[9 + 4 * n_leaves:9 + 5 * n_leaves]
        out_nu = refs[9 + 5 * n_leaves:9 + 6 * n_leaves]
        objs_ref = refs[9 + 6 * n_leaves]

        avg, nstd = avg_ref[:], nstd_ref[:] + 1e-4          # (S, 1)
        leaves0 = tuple(r[:] for r in param_refs)
        mus0 = tuple(r[:] for r in mu_refs)
        nus0 = tuple(r[:] for r in nu_refs)

        def mlp(leaves, x):
            """leaves = [w1T (D1,S), b1 (D1,1), w2T, b2, w3T, b3]; x (S, B).
            Same math as ops/nets.py:mlp_apply, transposed."""
            h = jax.nn.gelu(jnp.dot(leaves[0], x,
                                    preferred_element_type=jnp.float32)
                            + leaves[1])
            h = jax.nn.gelu(jnp.dot(leaves[2], h,
                                    preferred_element_type=jnp.float32)
                            + leaves[3])
            return jnp.dot(leaves[4], h,
                           preferred_element_type=jnp.float32) + leaves[5]

        # Lane-chunking: fwd+bwd activations are (hidden, B) x several live
        # copies; above ~2048 lanes they overflow VMEM (measured: B=2048
        # compiles, 4096 does not).  Split the batch into equal static
        # chunks and average the per-chunk grads/objectives — exact for the
        # mean-reduced losses (grad of a mean over B == mean of equal-chunk
        # grad means), f32-reassociation aside.
        LC = min(B, 2048)
        NLC = B // LC

        def body(u, carry):
            leaves, mus, nus = carry
            act_leaves = leaves[:n_act]
            cri_leaves = leaves[n_act:]
            x = sb_ref[pl.ds(u, 1)].reshape(S, B)
            a = ab_ref[pl.ds(u, 1)].reshape(A, B)
            lp = lp_ref[pl.ds(u, 1)].reshape(1, B)
            adv = adv_ref[pl.ds(u, 1)].reshape(1, B)
            rs = rs_ref[pl.ds(u, 1)].reshape(1, B)
            um = um_ref[pl.ds(u, 1)].reshape(1, B)
            xn = (x - avg) / nstd
            bc1a, bc2a = bc_ref[u, 0], bc_ref[u, 1]
            bc1c, bc2c = bc_ref[u, 2], bc_ref[u, 3]

            def make_cri_loss(xn_c, rs_c, um_c):
                def cri_loss_fn(cl):
                    v = mlp(cl, xn_c)                        # (1, LC)
                    return jnp.mean(jnp.square(v - rs_c) * um_c)
                return cri_loss_fn

            def make_act_loss(xn_c, a_c, lp_c, adv_c, um_c):
                def act_loss_fn(al):
                    if discrete:
                        # a_c is the ONE-HOT action (A, LC); selecting the
                        # row via sum(logp * onehot) is bit-exact vs the
                        # scan path's take_along_axis (dists.py:40-47)
                        logits = mlp(al, xn_c)               # (A, LC)
                        logp = jax.nn.log_softmax(logits, axis=0)
                        new_lp = jnp.sum(logp * a_c, axis=0,
                                         keepdims=True)      # (1, LC)
                        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=0,
                                           keepdims=True)
                    else:
                        # al = [w1T, b1, w2T, b2, w3T, b3, std_log (A, 1)]
                        mean = mlp(al[:6], xn_c)             # (A, LC)
                        std = jnp.exp(al[6])                 # (A, 1)
                        stdb = jnp.broadcast_to(std, mean.shape)
                        new_lp = jnp.sum(
                            dists.normal_logprob(a_c, mean, stdb),
                            axis=0, keepdims=True)           # (1, LC)
                        entropy = jnp.sum(dists.normal_entropy(stdb),
                                          axis=0, keepdims=True)
                    ratio = jnp.exp(new_lp - lp_c)
                    if single_sided:   # reference form (AgentPPO.py:199)
                        surrogate = adv_c * ratio * jnp.where(
                            adv_c > 0, 1.0 - ratio_clip, 1.0 + ratio_clip)
                    else:
                        surrogate = jnp.minimum(
                            adv_c * ratio,
                            adv_c * jnp.clip(ratio, 1.0 - ratio_clip,
                                             1.0 + ratio_clip))
                    obj_surrogate = jnp.mean(surrogate * um_c)
                    obj_entropy = jnp.mean(entropy * um_c)
                    return (-(obj_surrogate - obj_entropy * lambda_entropy),
                            (obj_surrogate, obj_entropy))
                return act_loss_fn

            obj_critic = obj_s = obj_e = 0.0
            g_cri = g_act = None
            for ci in range(NLC):
                sl = slice(ci * LC, (ci + 1) * LC)
                oc, gc = jax.value_and_grad(make_cri_loss(
                    xn[:, sl], rs[:, sl], um[:, sl]))(cri_leaves)
                (_, (os_, oe)), ga = jax.value_and_grad(
                    make_act_loss(xn[:, sl], a[:, sl], lp[:, sl],
                                  adv[:, sl], um[:, sl]),
                    has_aux=True)(act_leaves)
                obj_critic = obj_critic + oc
                obj_s, obj_e = obj_s + os_, obj_e + oe
                g_cri = gc if g_cri is None else tuple(
                    p + q for p, q in zip(g_cri, gc))
                g_act = ga if g_act is None else tuple(
                    p + q for p, q in zip(g_act, ga))
            inv = 1.0 / NLC
            obj_critic, obj_s, obj_e = (obj_critic * inv, obj_s * inv,
                                        obj_e * inv)
            if NLC > 1:
                g_cri = tuple(g * inv for g in g_cri)
                g_act = tuple(g * inv for g in g_act)
            new_cri, new_cmu, new_cnu = adam_step(
                cri_leaves, mus[n_act:], nus[n_act:], g_cri, bc1c, bc2c)
            new_act, new_amu, new_anu = adam_step(
                act_leaves, mus[:n_act], nus[:n_act], g_act, bc1a, bc2a)

            objs_ref[pl.ds(u, 1)] = jnp.concatenate(
                [obj_critic.reshape(1, 1), obj_s.reshape(1, 1),
                 obj_e.reshape(1, 1)], axis=1)               # (1, 3)
            return (tuple(new_act) + tuple(new_cri),
                    tuple(new_amu) + tuple(new_cmu),
                    tuple(new_anu) + tuple(new_cnu))

        leaves, mus, nus = jax.lax.fori_loop(
            0, U, body, (leaves0, mus0, nus0))
        for r, v in zip(out_param, leaves):
            r[:] = v
        for r, v in zip(out_mu, mus):
            r[:] = v
        for r, v in zip(out_nu, nus):
            r[:] = v

    return kernel


def fused_update_bytes(update_times: int, batch_size: int, state_dim: int,
                       action_dim: int, n_params: int) -> int:
    """Rough VMEM residency of the fused update: minibatch block + 3 copies
    of the params (p, mu, nu), f32."""
    data = update_times * batch_size * (state_dim + action_dim + 4) * 4
    return data + 3 * n_params * 4


def make_ppo_fused_update(state_dim: int, action_dim: int, batch_size: int,
                          update_times: int, *, ratio_clip: float,
                          lambda_entropy: float, lr: float, clip_grad: float,
                          single_sided: bool = False, b1: float = 0.9,
                          b2: float = 0.999, eps: float = 1e-8,
                          discrete: bool = False, interpret: bool = False):
    """Build ``fused(act, cri, act_opt, cri_opt, norm_avg, norm_std,
    sb, ab, lpb, advb, rsb, umb) -> (act, cri, act_opt, cri_opt, metrics)``
    — the drop-in replacement for the PPO minibatch ``lax.scan``
    (agents/ppo.py:update, reference AgentPPO.py:159-205).

    Minibatch inputs in kernel layout: ``sb (U, S, B)``, ``ab (U, A, B)``,
    the rest ``(U, 1, B)`` — pre-gathered with the same ids the scan path
    would draw.  ``discrete=True`` switches the actor loss to the
    categorical head (AgentPPO.py's DiscretePPO): ``ab`` then carries the
    ONE-HOT action (A = number of actions) and the actor has no std_log
    leaf.
    """
    U, B = int(update_times), int(batch_size)
    S, A = int(state_dim), int(action_dim)
    hp = dict(ratio_clip=float(ratio_clip), lambda_entropy=float(lambda_entropy),
              lr=float(lr), clip_grad=float(clip_grad), b1=float(b1),
              b2=float(b2), eps=float(eps), single_sided=bool(single_sided),
              discrete=bool(discrete))

    def fused(act, cri, act_opt, cri_opt, norm_avg, norm_std,
              sb, ab, lpb, advb, rsb, umb) -> Tuple:
        act_flat, act_tdef = jax.tree.flatten(act)
        cri_flat, cri_tdef = jax.tree.flatten(cri)
        n_act, n_cri = len(act_flat), len(cri_flat)
        n_l = n_act + n_cri
        a_count, a_mu, a_nu = _adam_parts(act_opt)
        c_count, c_mu, c_nu = _adam_parts(cri_opt)
        mu_flat = jax.tree.leaves(a_mu) + jax.tree.leaves(c_mu)
        nu_flat = jax.tree.leaves(a_nu) + jax.tree.leaves(c_nu)
        p_flat = act_flat + cri_flat
        shapes = [p.shape for p in p_flat]
        p2 = [_to_kernel(p) for p in p_flat]
        mu2 = [_to_kernel(p) for p in mu_flat]
        nu2 = [_to_kernel(p) for p in nu_flat]

        # per-iteration Adam bias corrections, optax's exact int-count pow
        steps = jnp.arange(1, U + 1, dtype=jnp.float32)
        bc = jnp.stack([
            1.0 - jnp.power(b1, a_count.astype(jnp.float32) + steps),
            1.0 - jnp.power(b2, a_count.astype(jnp.float32) + steps),
            1.0 - jnp.power(b1, c_count.astype(jnp.float32) + steps),
            1.0 - jnp.power(b2, c_count.astype(jnp.float32) + steps),
        ], axis=1)                                           # (U, 4)

        kernel = _make_kernel(U, B, S, A, n_act, n_cri, hp)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = ([vmem()] * 8
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)]   # bc table
                    + [vmem()] * (3 * n_l))
        out_specs = tuple([vmem()] * (3 * n_l + 1))
        out_shape = tuple(
            [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in p2] * 3
            + [jax.ShapeDtypeStruct((U, 3), jnp.float32)])
        outs = pl.pallas_call(
            kernel,
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            # alias each param/moment input to its output: halves the
            # kernel's fixed VMEM residency (in-place update, no second
            # copy) and the param HBM round-trip
            input_output_aliases={9 + i: i for i in range(3 * n_l)},
            interpret=pltpu.InterpretParams() if interpret else False,
        )(sb.reshape(U, S, B), ab.reshape(U, A, B), lpb.reshape(U, 1, B),
          advb.reshape(U, 1, B), rsb.reshape(U, 1, B), umb.reshape(U, 1, B),
          norm_avg.reshape(S, 1), norm_std.reshape(S, 1), bc,
          *p2, *mu2, *nu2)

        new_p = [_from_kernel(o, sh) for o, sh in zip(outs[:n_l], shapes)]
        new_mu = [_from_kernel(o, sh)
                  for o, sh in zip(outs[n_l:2 * n_l], shapes)]
        new_nu = [_from_kernel(o, sh)
                  for o, sh in zip(outs[2 * n_l:3 * n_l], shapes)]
        objs = outs[3 * n_l]                                 # (U, 3)

        new_act = jax.tree.unflatten(act_tdef, new_p[:n_act])
        new_cri = jax.tree.unflatten(cri_tdef, new_p[n_act:])
        new_act_opt = _with_adam_parts(
            act_opt, a_count + U,
            jax.tree.unflatten(act_tdef, new_mu[:n_act]),
            jax.tree.unflatten(act_tdef, new_nu[:n_act]))
        new_cri_opt = _with_adam_parts(
            cri_opt, c_count + U,
            jax.tree.unflatten(cri_tdef, new_mu[n_act:]),
            jax.tree.unflatten(cri_tdef, new_nu[n_act:]))
        metrics = {'obj_critic': jnp.mean(objs[:, 0]),
                   'obj_actor': jnp.mean(objs[:, 1]),
                   'obj_entropy': jnp.mean(objs[:, 2])}
        return new_act, new_cri, new_act_opt, new_cri_opt, metrics

    return fused


# ------------------------------------------------------- DQN-family chunk

def dqn_flatten(q: dict, twin: bool, duel: bool):
    """Canonical kernel leaf order for the DQN-family param dict
    (agents/dqn.py:init): plain -> the 3-layer mlp's 6 leaves; enc variants
    -> enc(4) + val1(2) [+ adv1(2)] [+ val2(2) [+ adv2(2)]]."""
    if not (twin or duel):
        return [x for pair in q['mlp'] for x in pair]
    leaves = [x for pair in q['enc'] for x in pair]
    leaves += list(q['val1'][0])
    if duel:
        leaves += list(q['adv1'][0])
    if twin:
        leaves += list(q['val2'][0])
        if duel:
            leaves += list(q['adv2'][0])
    return leaves


def dqn_unflatten(leaves, twin: bool, duel: bool) -> dict:
    """Inverse of ``dqn_flatten``."""
    pairs = [(leaves[i], leaves[i + 1]) for i in range(0, len(leaves), 2)]
    if not (twin or duel):
        return {'mlp': pairs[:3]}
    q = {'enc': pairs[:2]}
    i = 2
    q['val1'] = [pairs[i]]; i += 1
    if duel:
        q['adv1'] = [pairs[i]]; i += 1
    if twin:
        q['val2'] = [pairs[i]]; i += 1
        if duel:
            q['adv2'] = [pairs[i]]; i += 1
    return q


def make_dqn_fused_chunk(state_dim: int, action_dim: int, batch_size: int,
                         chunk_updates: int, *, gamma: float, tau: float,
                         lr: float, clip_grad: float, twin: bool, duel: bool,
                         b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8, interpret: bool = False):
    """Fused DQN-family SGD chunk: ``chunk_updates`` sequential minibatch
    updates (TD target vs the soft-updated target net, Adam step, Polyak)
    in ONE Pallas op, params/targets/moments VMEM-resident across the chunk.

    The off-policy trip count is DYNAMIC (``update_times = size *
    repeat_times / batch_size`` grows with the buffer, reference
    AgentBase.py:172-189), so unlike the PPO kernel this one processes a
    fixed chunk and the caller drives a dynamic ``fori_loop`` over chunks,
    pre-gathering each chunk's minibatches with the scan path's exact ids
    (one batched XLA gather per tensor) — see agents/dqn.py:_fused_update.
    Steps past ``update_times`` are masked in-kernel via the SMEM valid
    flag (a no-op select on every carried leaf).

    TD math mirrors agents/dqn.py:objectives exactly per variant flag —
    plain max / DoubleDQN min-of-twins / Dueling's value-head-only TD path
    / D3QN's combine (reference AgentDQN.py:46-47,107-108,214-217,258-263).

    Returns ``chunk(p, t, mu, nu, sb, nsb, oh, rb, ud, um, bcv)`` over
    kernel-layout leaf tuples; ``bcv`` is an SMEM ``(C, 3)`` table of
    per-step (adam bc1, bc2, valid).
    """
    C, B = int(chunk_updates), int(batch_size)
    S, A = int(state_dim), int(action_dim)
    n_l = 6 if not (twin or duel) else 6 + 2 * (int(twin) + int(duel)
                                                + int(twin and duel))

    def adam_step(params, mus, nus, grads, bc1, bc2):
        # exact optax chain(clip_by_global_norm, adam) — same math as the
        # PPO kernel's adam_step (kept local: kernels can't share traced
        # closures across pallas_call bodies)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in grads))
        scale = jnp.where(gn < clip_grad, 1.0, clip_grad / gn)
        new_p, new_mu, new_nu = [], [], []
        for p, mu, nu, g in zip(params, mus, nus, grads):
            g = g * scale
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            new_p.append(p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps))
            new_mu.append(mu)
            new_nu.append(nu)
        return new_p, new_mu, new_nu

    def mlp3(l, x):
        """3-layer (S -> D1 -> D2 -> A) in kernel layout, gelu between
        hidden layers, raw out (ops/nets.py:mlp_apply semantics)."""
        h = jax.nn.gelu(jnp.dot(l[0], x,
                                preferred_element_type=jnp.float32) + l[1])
        h = jax.nn.gelu(jnp.dot(l[2], h,
                                preferred_element_type=jnp.float32) + l[3])
        return jnp.dot(l[4], h, preferred_element_type=jnp.float32) + l[5]

    def enc2(l, x):
        """2-layer encoder, gelu after layer 1 ONLY (mlp_apply on a
        2-layer stack has no final activation — heads read the raw
        encoding, agents/dqn.py:_enc)."""
        h = jax.nn.gelu(jnp.dot(l[0], x,
                                preferred_element_type=jnp.float32) + l[1])
        return jnp.dot(l[2], h, preferred_element_type=jnp.float32) + l[3]

    def head(w, b, h):
        return jnp.dot(w, h, preferred_element_type=jnp.float32) + b

    def combine(val, adv):
        # dueling combine, transposed: val (A, B), adv (1, B)
        return val - jnp.mean(val, axis=0, keepdims=True) + adv

    def next_q_fn(t, nx):
        """max_a of the TD-path target Q — per-variant (agents/dqn.py)."""
        if not (twin or duel):
            return jnp.max(mlp3(t, nx), axis=0, keepdims=True)
        h = enc2(t[:4], nx)
        v1 = head(t[4], t[5], h)
        if twin:
            i = 6
            if duel:
                v1 = combine(v1, head(t[6], t[7], h)); i = 8
            v2 = head(t[i], t[i + 1], h)
            if duel:
                v2 = combine(v2, head(t[i + 2], t[i + 3], h))
            return jnp.max(jnp.minimum(v1, v2), axis=0, keepdims=True)
        # duel-only TD path reads the value head directly (the reference's
        # quirky QNetDuel.get_q_value, AgentDQN.py:214-217)
        return jnp.max(v1, axis=0, keepdims=True)

    def kernel(*refs):
        (sb_ref, nsb_ref, oh_ref, rb_ref, ud_ref, um_ref, bcv_ref) = refs[:7]
        p_refs = refs[7:7 + n_l]
        t_refs = refs[7 + n_l:7 + 2 * n_l]
        mu_refs = refs[7 + 2 * n_l:7 + 3 * n_l]
        nu_refs = refs[7 + 3 * n_l:7 + 4 * n_l]
        out = refs[7 + 4 * n_l:]
        out_p, out_t = out[:n_l], out[n_l:2 * n_l]
        out_mu, out_nu = out[2 * n_l:3 * n_l], out[3 * n_l:4 * n_l]
        objs_ref = out[4 * n_l]

        p0 = tuple(r[:] for r in p_refs)
        t0 = tuple(r[:] for r in t_refs)
        mu0 = tuple(r[:] for r in mu_refs)
        nu0 = tuple(r[:] for r in nu_refs)

        def body(u, carry):
            p, t, mu, nu = carry
            x = sb_ref[pl.ds(u, 1)].reshape(S, B)
            nx = nsb_ref[pl.ds(u, 1)].reshape(S, B)
            oh = oh_ref[pl.ds(u, 1)].reshape(A, B)
            r = rb_ref[pl.ds(u, 1)].reshape(1, B)
            ud = ud_ref[pl.ds(u, 1)].reshape(1, B)
            um = um_ref[pl.ds(u, 1)].reshape(1, B)
            bc1, bc2 = bcv_ref[u, 0], bcv_ref[u, 1]
            valid = bcv_ref[u, 2]

            q_label = r + ud * gamma * next_q_fn(t, nx)      # (1, B)

            def loss_fn(pl_):
                if not (twin or duel):
                    qs = mlp3(pl_, x)
                    q1 = jnp.sum(qs * oh, axis=0, keepdims=True)
                    td = jnp.square(q1 - q_label) * um
                    return jnp.mean(td), q1
                h = enc2(pl_[:4], x)
                v1 = head(pl_[4], pl_[5], h)
                if twin:
                    i = 6
                    if duel:
                        v1 = combine(v1, head(pl_[6], pl_[7], h)); i = 8
                    v2 = head(pl_[i], pl_[i + 1], h)
                    if duel:
                        v2 = combine(v2, head(pl_[i + 2], pl_[i + 3], h))
                    q1 = jnp.sum(v1 * oh, axis=0, keepdims=True)
                    q2 = jnp.sum(v2 * oh, axis=0, keepdims=True)
                    td = (jnp.square(q1 - q_label)
                          + jnp.square(q2 - q_label)) * um
                    return jnp.mean(td), q1
                q1 = jnp.sum(v1 * oh, axis=0, keepdims=True)
                td = jnp.square(q1 - q_label) * um
                return jnp.mean(td), q1

            (obj_c, q_first), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            p2, mu2, nu2 = adam_step(p, mu, nu, grads, bc1, bc2)
            t2 = [tt * (1.0 - tau) + pp * tau for tt, pp in zip(t, p2)]

            objs_ref[pl.ds(u, 1)] = jnp.concatenate(
                [obj_c.reshape(1, 1), jnp.mean(q_first).reshape(1, 1)],
                axis=1)
            sel = lambda n_, o_: jnp.where(valid > 0, n_, o_)  # noqa: E731
            return (tuple(map(sel, p2, p)), tuple(map(sel, t2, t)),
                    tuple(map(sel, mu2, mu)), tuple(map(sel, nu2, nu)))

        p, t, mu, nu = jax.lax.fori_loop(0, C, body, (p0, t0, mu0, nu0))
        for r_, v in zip(out_p, p):
            r_[:] = v
        for r_, v in zip(out_t, t):
            r_[:] = v
        for r_, v in zip(out_mu, mu):
            r_[:] = v
        for r_, v in zip(out_nu, nu):
            r_[:] = v

    def chunk(p, t, mu, nu, sb, nsb, oh, rb, ud, um, bcv):
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
        in_specs = ([vmem()] * 6
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [vmem()] * (4 * n_l))
        out_specs = tuple([vmem()] * (4 * n_l + 1))
        out_shape = tuple(
            [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in p] * 4
            + [jax.ShapeDtypeStruct((C, 2), jnp.float32)])
        outs = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={7 + i: i for i in range(4 * n_l)},
            interpret=pltpu.InterpretParams() if interpret else False,
        )(sb, nsb, oh, rb, ud, um, bcv, *p, *t, *mu, *nu)
        return (tuple(outs[:n_l]), tuple(outs[n_l:2 * n_l]),
                tuple(outs[2 * n_l:3 * n_l]), tuple(outs[3 * n_l:4 * n_l]),
                outs[4 * n_l])

    return chunk


# ----------------------------------------------------- DDPG/TD3 chunk

def mlp_flatten(params) -> list:
    """Flatten an ``ops/nets.py`` MLP param list [(w, b), ...] into the
    kernel leaf order [w1, b1, w2, b2, ...]."""
    return [x for pair in params for x in pair]


def mlp_unflatten(leaves) -> list:
    return [(leaves[i], leaves[i + 1]) for i in range(0, len(leaves), 2)]


def make_ddpg_fused_chunk(state_dim: int, action_dim: int, batch_size: int,
                          chunk_updates: int, *, gamma: float, tau: float,
                          lr: float, clip_grad: float, td3: bool,
                          num_ensembles: int, b1: float = 0.9,
                          b2: float = 0.999, eps: float = 1e-8,
                          per: bool = False, interpret: bool = False):
    """Fused DDPG/TD3 SGD chunk, the off-policy twin of
    ``make_dqn_fused_chunk``: per step, TD target from the soft-updated
    target critic with the ONLINE actor's (TD3: noise-smoothed) next action,
    critic Adam step + Polyak, then the (TD3: delayed) actor step maximizing
    the fresh critic, all VMEM-resident (agents/ddpg_td3.py:objectives;
    reference AgentTD3.py:22-60 / AgentDDPG.py).

    Caller pre-gathers minibatches and pre-draws the TD3 target-policy
    smoothing noise with the scan path's exact keys.  ``bcv`` is an SMEM
    ``(C, 7)`` table: (bc1_cri, bc2_cri, bc1_act, bc2_act, valid, do_actor,
    unused).  Returns ``chunk(pa, pc, ta, tc, mua, muc, nua, nuc, sb, nsb,
    ab, rb, ud, um, nz, bcv)`` -> same leaf groups + ``objs (C, 2)``.

    ``per=True`` (VERDICT r4 #5 — reference PER branch,
    ``elegantrl/train/replay_buffer.py:136-179``): sampling and the wide
    segment-tree update stay OUTSIDE the kernel; the chunk takes one extra
    input ``iw (C, 1, B)`` of importance weights (critic loss becomes
    ``mean(td * iw)``) and emits one extra output ``td (C, 1, B)`` of
    per-sample TD errors for the caller's post-chunk priority fold.  The
    caller pre-samples all C minibatches against the tree state at chunk
    START — priorities lag by up to C-1 updates inside a chunk (the scan
    path re-samples after every tree update); see
    agents/ddpg_td3.py:_fused_update for the measured-learning evidence
    that the lag is benign at chunk=16.
    """
    C, B = int(chunk_updates), int(batch_size)
    S, A, E = int(state_dim), int(action_dim), int(num_ensembles)
    n_l = 6                       # each net: 3 layers x (w, b)

    def adam_step(params, mus, nus, grads, bc1, bc2):
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in grads))
        scale = jnp.where(gn < clip_grad, 1.0, clip_grad / gn)
        new_p, new_mu, new_nu = [], [], []
        for p, mu, nu, g in zip(params, mus, nus, grads):
            g = g * scale
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            new_p.append(p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps))
            new_mu.append(mu)
            new_nu.append(nu)
        return new_p, new_mu, new_nu

    def mlp3(l, x):
        h = jax.nn.gelu(jnp.dot(l[0], x,
                                preferred_element_type=jnp.float32) + l[1])
        h = jax.nn.gelu(jnp.dot(l[2], h,
                                preferred_element_type=jnp.float32) + l[3])
        return jnp.dot(l[4], h, preferred_element_type=jnp.float32) + l[5]

    def kernel(*refs):
        if per:   # iw rides between nz and the SMEM bcv table
            (sb_ref, nsb_ref, ab_ref, rb_ref, ud_ref, um_ref, nz_ref,
             iw_ref, bcv_ref) = refs[:9]
        else:
            (sb_ref, nsb_ref, ab_ref, rb_ref, ud_ref, um_ref, nz_ref,
             bcv_ref) = refs[:8]
            iw_ref = None
        n_in = 8 + (1 if per else 0)
        groups = [refs[n_in + i * n_l:n_in + (i + 1) * n_l] for i in range(8)]
        out = refs[n_in + 8 * n_l:]
        out_groups = [out[i * n_l:(i + 1) * n_l] for i in range(8)]
        objs_ref = out[8 * n_l]
        td_ref = out[8 * n_l + 1] if per else None

        init = tuple(tuple(r[:] for r in g) for g in groups)

        def body(u, carry):
            pa, pc, ta, tc, mua, muc, nua, nuc = carry
            x = sb_ref[pl.ds(u, 1)].reshape(S, B)
            nx = nsb_ref[pl.ds(u, 1)].reshape(S, B)
            a = ab_ref[pl.ds(u, 1)].reshape(A, B)
            r = rb_ref[pl.ds(u, 1)].reshape(1, B)
            ud = ud_ref[pl.ds(u, 1)].reshape(1, B)
            um = um_ref[pl.ds(u, 1)].reshape(1, B)
            nz = nz_ref[pl.ds(u, 1)].reshape(A, B)
            iw = iw_ref[pl.ds(u, 1)].reshape(1, B) if per else None
            bc1c, bc2c = bcv_ref[u, 0], bcv_ref[u, 1]
            bc1a, bc2a = bcv_ref[u, 2], bcv_ref[u, 3]
            valid, do_act = bcv_ref[u, 4], bcv_ref[u, 5]

            na = jnp.tanh(mlp3(pa, nx))                  # ONLINE actor
            if td3:                                      # smoothed + clipped
                na = jnp.clip(na + nz, -1.0, 1.0)
            nq_all = mlp3(tc, jnp.concatenate([nx, na], axis=0))  # (E, B)
            if td3:
                nq = jnp.min(nq_all, axis=0, keepdims=True)
            else:
                nq = jnp.mean(nq_all, axis=0, keepdims=True)
            q_label = r + ud * gamma * nq

            def cri_loss(cl):
                qs = mlp3(cl, jnp.concatenate([x, a], axis=0))   # (E, B)
                if td3:
                    td = jnp.mean(jnp.square(qs - q_label), axis=0,
                                  keepdims=True) * um
                else:
                    q = jnp.mean(qs, axis=0, keepdims=True) * um
                    td = jnp.square(q - q_label) * um
                if per:   # IS-weighted loss (agents/ddpg_td3.py:145)
                    return jnp.mean(td * iw), td
                return jnp.mean(td), td

            (obj_c, td), g_cri = jax.value_and_grad(
                cri_loss, has_aux=True)(pc)
            if per:
                td_ref[pl.ds(u, 1)] = td.reshape(1, 1, B)
            pc2, muc2, nuc2 = adam_step(pc, muc, nuc, g_cri, bc1c, bc2c)
            tc2 = [t_ * (1.0 - tau) + p_ * tau for t_, p_ in zip(tc, pc2)]

            def act_loss(al):
                aa = jnp.tanh(mlp3(al, x))
                q = mlp3(pc2, jnp.concatenate([x, aa], axis=0))  # NEW critic
                return -jnp.mean(q)

            # NOTE: the delayed actor is computed unconditionally and
            # masked, NOT wrapped in lax.cond — measured: the scf.if form
            # ran slower (7,924 vs 8,657 updates/s) AND raised the Mosaic
            # scoped-vmem stack by ~3M (both branches' frames), pushing
            # (128,128)x1024 DDPG over the 16M limit
            obj_neg, g_act = jax.value_and_grad(act_loss)(pa)
            pa2, mua2, nua2 = adam_step(pa, mua, nua, g_act, bc1a, bc2a)
            ta2 = [t_ * (1.0 - tau) + p_ * tau for t_, p_ in zip(ta, pa2)]

            objs_ref[pl.ds(u, 1)] = jnp.concatenate(
                [obj_c.reshape(1, 1), (-obj_neg).reshape(1, 1)], axis=1)
            selc = lambda n_, o_: jnp.where(valid > 0, n_, o_)  # noqa: E731
            sela = lambda n_, o_: jnp.where(                    # noqa: E731
                (valid > 0) & (do_act > 0), n_, o_)
            return (tuple(map(sela, pa2, pa)), tuple(map(selc, pc2, pc)),
                    tuple(map(sela, ta2, ta)), tuple(map(selc, tc2, tc)),
                    tuple(map(sela, mua2, mua)), tuple(map(selc, muc2, muc)),
                    tuple(map(sela, nua2, nua)), tuple(map(selc, nuc2, nuc)))

        final = jax.lax.fori_loop(0, C, body, init)
        for g_out, g_val in zip(out_groups, final):
            for r_, v in zip(g_out, g_val):
                r_[:] = v

    def chunk(pa, pc, ta, tc, mua, muc, nua, nuc,
              sb, nsb, ab, rb, ud, um, nz, bcv, iw=None):
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
        n_in = 7 + (1 if per else 0)
        n_out = 8 * n_l + 1 + (1 if per else 0)
        in_specs = ([vmem()] * n_in
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [vmem()] * (8 * n_l))
        out_specs = tuple([vmem()] * n_out)
        shapes = ([jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in pa]
                  + [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in pc])
        out_shape = tuple(shapes * 4
                          + [jax.ShapeDtypeStruct((C, 2), jnp.float32)]
                          + ([jax.ShapeDtypeStruct((C, 1, B), jnp.float32)]
                             if per else []))
        data = ((sb, nsb, ab, rb, ud, um, nz, iw, bcv) if per
                else (sb, nsb, ab, rb, ud, um, nz, bcv))
        n_data = 9 if per else 8          # incl. the SMEM bcv table
        outs = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={n_data + i: i for i in range(8 * n_l)},
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*data, *pa, *pc, *ta, *tc, *mua, *muc, *nua, *nuc)
        g = [tuple(outs[i * n_l:(i + 1) * n_l]) for i in range(8)]
        if per:
            return (*g, outs[8 * n_l], outs[8 * n_l + 1])
        return (*g, outs[8 * n_l])

    return chunk


# -------------------------------------------------------- SAC/ModSAC chunk

def sac_act_flatten(act: dict, modsac: bool) -> list:
    """Kernel leaf order for the SAC actor dict (agents/sac.py:init):
    enc(4) + head(2) [plain] | enc(4) + avg(2) + std(2) [ModSAC]."""
    leaves = mlp_flatten(act['enc'])
    if modsac:
        return leaves + mlp_flatten(act['avg']) + mlp_flatten(act['std'])
    return leaves + mlp_flatten(act['head'])


def sac_act_unflatten(leaves, modsac: bool) -> dict:
    if modsac:
        return {'enc': mlp_unflatten(leaves[:4]),
                'avg': mlp_unflatten(leaves[4:6]),
                'std': mlp_unflatten(leaves[6:8])}
    return {'enc': mlp_unflatten(leaves[:4]),
            'head': mlp_unflatten(leaves[4:6])}


def sac_cri_flatten(cri: dict, num_ensembles: int) -> list:
    """enc(2) + per-ensemble head slices (4 leaves each): the stacked
    ``ensemble_init`` heads are unstacked so every kernel leaf stays 2-D."""
    leaves = mlp_flatten(cri['enc'])
    (w1, b1), (w2, b2) = cri['heads']
    for e in range(num_ensembles):
        leaves += [w1[e], b1[e], w2[e], b2[e]]
    return leaves


def sac_cri_unflatten(leaves, num_ensembles: int) -> dict:
    enc = mlp_unflatten(leaves[:2])
    w1 = jnp.stack([leaves[2 + 4 * e] for e in range(num_ensembles)])
    b1 = jnp.stack([leaves[3 + 4 * e] for e in range(num_ensembles)])
    w2 = jnp.stack([leaves[4 + 4 * e] for e in range(num_ensembles)])
    b2 = jnp.stack([leaves[5 + 4 * e] for e in range(num_ensembles)])
    return {'enc': enc, 'heads': [(w1, b1), (w2, b2)]}


def make_sac_fused_chunk(state_dim: int, action_dim: int, batch_size: int,
                         chunk_updates: int, *, gamma: float, tau: float,
                         lr: float, clip_grad: float, modsac: bool,
                         num_ensembles: int, target_entropy: float,
                         std_clip: tuple, b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8, lane_chunk: int = 0,
                         interpret: bool = False):
    """Fused SAC/ModSAC SGD chunk (agents/sac.py:objectives; reference
    AgentSAC.py:40-100/149-158): per step — entropy-regularized TD target
    from the target critic with a fresh tanh-Gaussian next-action draw,
    critic Adam + Polyak, the alpha (temperature) step on its own optimizer
    with the [-16, 2] clip, then the (ModSAC: reliability-gated) actor step
    maximizing Q - alpha*logprob against the FRESH target critic.

    Dynamic in-kernel state the other chunks don't have: ``alpha_log`` (a
    learned (1,1) leaf with its own Adam moments), the ModSAC actor-gate
    counter ``update_a``, and the actor's Adam step count (data-dependent
    under the gate), all carried as (1,1) VMEM scalars across the chunk —
    the actor's bias corrections are computed IN-kernel via
    ``exp(count*log(beta))``.

    Caller pre-draws minibatch ids and BOTH noise blocks (next-action +
    policy-gradient) with the scan path's exact keys.  ``bcv`` is an SMEM
    ``(C, 7)`` table: (bc1_cri, bc2_cri, bc1_alpha, bc2_alpha, valid,
    update_t, unused).  Returns ``chunk(pa, pc, ta, tc, mua, muc, nua, nuc,
    misc, sb, nsb, ab, rb, ud, um, nz_next, nz_pg, bcv)``; ``misc`` is the
    5-leaf (1,1) group [alpha_log, alpha_mu, alpha_nu, act_count,
    update_a]; ``ta`` is empty for plain SAC (no actor target).

    ``lane_chunk`` (round 5): SAC's per-ensemble head autodiff keeps far
    more live VMEM than the single-net chunks — the unchunked kernel OOMs
    at (128,128)x1024 (+5.2M over the 16M scoped-VMEM stack).  Same fix as
    the PPO kernel's LC loop: split the batch into equal lane chunks and
    average per-chunk grads/objectives — exact for all three mean-reduced
    losses (critic TD, alpha's ``mean(te - logprob)``, the actor's
    ``mean(q) - alpha*mean(logprob)``), f32 reassociation aside.  0 means
    no chunking (one chunk of B lanes).
    """
    import math as _math
    C, B = int(chunk_updates), int(batch_size)
    S, A, E = int(state_dim), int(action_dim), int(num_ensembles)
    LC = int(lane_chunk) or B
    assert B % LC == 0, (B, LC)
    NLC = B // LC
    n_a = 8 if modsac else 6
    n_c = 2 + 4 * E
    n_t = n_a if modsac else 0
    lo, hi = float(std_clip[0]), float(std_clip[1])
    LOG_SQRT_2PI = _math.log(_math.sqrt(2.0 * _math.pi))
    LOG_2 = _math.log(2.0)
    RELIABLE = 1.0 / (2.0 - _math.exp(-1.0))

    def adam_leaf(p, mu, nu, g, scale, bc1, bc2):
        g = g * scale
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * jnp.square(g)
        return (p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps), mu, nu)

    def adam_step(params, mus, nus, grads, bc1, bc2):
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in grads))
        scale = jnp.where(gn < clip_grad, 1.0, clip_grad / gn)
        out = [adam_leaf(p, mu, nu, g, scale, bc1, bc2)
               for p, mu, nu, g in zip(params, mus, nus, grads)]
        return ([o[0] for o in out], [o[1] for o in out],
                [o[2] for o in out])

    def actor_dist(al, x):
        h = jax.nn.gelu(jnp.dot(al[0], x,
                                preferred_element_type=jnp.float32) + al[1])
        e = jnp.dot(al[2], h, preferred_element_type=jnp.float32) + al[3]
        if modsac:
            mean = jnp.dot(al[4], e,
                           preferred_element_type=jnp.float32) + al[5]
            log_std = jnp.clip(
                jnp.dot(al[6], e,
                        preferred_element_type=jnp.float32) + al[7], lo, hi)
        else:
            # plain ActorSAC: trailing GELU on the trunk (sac.py:actor_dist)
            e = jax.nn.gelu(e)
            out = jnp.dot(al[4], e,
                          preferred_element_type=jnp.float32) + al[5]
            mean, log_std = out[:A], jnp.clip(out[A:], lo, hi)
        return mean, log_std

    def action_logprob(al, x, noise):
        mean, log_std = actor_dist(al, x)
        std = jnp.exp(log_std)
        pre = mean + std * noise
        if modsac:   # ActorFixSAC softplus form (dists.tanh_normal_logprob)
            lp = (-log_std - 0.5 * jnp.square(noise) - LOG_SQRT_2PI
                  - 2.0 * (LOG_2 - pre - jax.nn.softplus(-2.0 * pre)))
        else:        # the reference's density-at-the-mean quirk
            lp = (-jnp.log(std) - LOG_SQRT_2PI
                  - jnp.log(1.000001 - jnp.square(jnp.tanh(pre))))
        return jnp.tanh(pre), jnp.sum(lp, axis=0, keepdims=True)   # (1, B)

    def make_q_values(mask):
        """Batched ensemble critic: the E per-head first layers run as ONE
        stacked (E*D2, D1) matmul and the second layers as ONE masked
        block-diagonal (E, E*D2) matmul — bit-exact vs the per-head loop
        (the masked-out products are exactly 0.0, and each row's nonzero
        block accumulates in the same ascending order), but E fewer serial
        MXU ops per evaluation."""
        def q_values(cl, x, a):
            sa = jnp.concatenate([x, a], axis=0)             # (S+A, B)
            enc = jnp.dot(cl[0], sa,
                          preferred_element_type=jnp.float32) + cl[1]
            w1 = jnp.concatenate([cl[2 + 4 * e] for e in range(E)], axis=0)
            bb1 = jnp.concatenate([cl[3 + 4 * e] for e in range(E)], axis=0)
            h = jax.nn.gelu(jnp.dot(w1, enc,
                                    preferred_element_type=jnp.float32)
                            + bb1)                           # (E*D2, B)
            w2row = jnp.concatenate([cl[4 + 4 * e] for e in range(E)],
                                    axis=1)                  # (1, E*D2)
            bb2 = jnp.concatenate([cl[5 + 4 * e] for e in range(E)], axis=0)
            return jnp.dot(mask * w2row, h,
                           preferred_element_type=jnp.float32) + bb2
        return q_values

    def kernel(*refs):
        (sb_ref, nsb_ref, ab_ref, rb_ref, ud_ref, um_ref, nzn_ref, nzp_ref,
         mask_ref, bcv_ref) = refs[:10]
        q_values = make_q_values(mask_ref[:])
        sizes = [n_a, n_c, n_t, n_c, n_a, n_c, n_a, n_c, 5]
        offs = [10]
        for sz in sizes:
            offs.append(offs[-1] + sz)
        groups = [refs[offs[i]:offs[i + 1]] for i in range(9)]
        out = refs[offs[-1]:]
        out_groups, o = [], 0
        for sz in sizes:
            out_groups.append(out[o:o + sz]); o += sz
        objs_ref = out[o]

        init = tuple(tuple(r[:] for r in g) for g in groups)

        def body(u, carry):
            pa, pc, ta, tc, mua, muc, nua, nuc, misc = carry
            alpha_log, a_mu, a_nu, cnt_a, upd_a = misc
            x = sb_ref[pl.ds(u, 1)].reshape(S, B)
            nx = nsb_ref[pl.ds(u, 1)].reshape(S, B)
            a = ab_ref[pl.ds(u, 1)].reshape(A, B)
            r = rb_ref[pl.ds(u, 1)].reshape(1, B)
            ud = ud_ref[pl.ds(u, 1)].reshape(1, B)
            um = um_ref[pl.ds(u, 1)].reshape(1, B)
            nzn = nzn_ref[pl.ds(u, 1)].reshape(A, B)
            nzp = nzp_ref[pl.ds(u, 1)].reshape(A, B)
            bc1c, bc2c = bcv_ref[u, 0], bcv_ref[u, 1]
            bc1l, bc2l = bcv_ref[u, 2], bcv_ref[u, 3]
            valid, upd_t = bcv_ref[u, 4], bcv_ref[u, 5]

            alpha = jnp.exp(alpha_log)                       # (1, 1)

            # ---- critic: lane-chunked grad accumulation (exact for the
            # mean-reduced TD loss; see lane_chunk docstring)
            obj_c = 0.0
            g_cri = None
            lp_now_mean = 0.0
            for ci in range(NLC):
                sl = slice(ci * LC, (ci + 1) * LC)
                na_c, nlp_c = action_logprob(pa, nx[:, sl], nzn[:, sl])
                nq_c = jnp.min(q_values(tc, nx[:, sl], na_c), axis=0,
                               keepdims=True)
                q_label_c = (r[:, sl] + ud[:, sl] * gamma
                             * (nq_c - nlp_c * alpha))

                def cri_loss(cl, _sl=sl, _ql=q_label_c):
                    qs = q_values(cl, x[:, _sl], a[:, _sl])
                    td = jnp.mean(jnp.square(qs - _ql), axis=0,
                                  keepdims=True) * um[:, _sl]
                    return jnp.mean(td)

                oc, gc = jax.value_and_grad(cri_loss)(pc)
                obj_c = obj_c + oc
                g_cri = gc if g_cri is None else [
                    p_ + q_ for p_, q_ in zip(g_cri, gc)]
                # alpha's grad is mean(target_entropy - lp_now): only the
                # per-chunk logprob means are needed
                _, lp_c = action_logprob(pa, x[:, sl], nzp[:, sl])
                lp_now_mean = lp_now_mean + jnp.mean(lp_c)
            inv = 1.0 / NLC
            obj_c = obj_c * inv
            lp_now_mean = lp_now_mean * inv
            if NLC > 1:
                g_cri = [g * inv for g in g_cri]
            pc2, muc2, nuc2 = adam_step(pc, muc, nuc, g_cri, bc1c, bc2c)
            tc2 = [t_ * (1.0 - tau) + p_ * tau for t_, p_ in zip(tc, pc2)]

            # alpha step (loss = mean(alpha_log * (te - lp_now)))
            g_al = jnp.broadcast_to(target_entropy - lp_now_mean,
                                    alpha_log.shape)
            gn = jnp.sqrt(jnp.sum(jnp.square(g_al)))
            g_al = g_al * jnp.where(gn < clip_grad, 1.0, clip_grad / gn)
            a_mu2 = b1 * a_mu + (1.0 - b1) * g_al
            a_nu2 = b2 * a_nu + (1.0 - b2) * jnp.square(g_al)
            alpha_log2 = jnp.clip(
                alpha_log - lr * (a_mu2 / bc1l)
                / (jnp.sqrt(a_nu2 / bc2l) + eps), -16.0, 2.0)
            alpha2 = jnp.exp(alpha_log2)                     # stop-grad'd

            if modsac:   # reliability gate on running actor-update ratio
                upd_a0 = jnp.where(upd_t == 0.0, 0.0, upd_a)
                do_act = (upd_a0 / (upd_t + 1.0) < RELIABLE).astype(
                    jnp.float32)
                upd_a2 = upd_a0 + do_act
            else:
                do_act = jnp.ones_like(upd_a)
                upd_a2 = upd_a

            obj_neg = 0.0
            g_act = None
            for ci in range(NLC):
                sl = slice(ci * LC, (ci + 1) * LC)

                def act_loss(al, _sl=sl):
                    a_pg, lp = action_logprob(al, x[:, _sl], nzp[:, _sl])
                    q_pg = jnp.mean(q_values(tc2, x[:, _sl], a_pg))  # FRESH
                    return -(q_pg - jnp.mean(lp * alpha2))

                on, ga = jax.value_and_grad(act_loss)(pa)
                obj_neg = obj_neg + on
                g_act = ga if g_act is None else [
                    p_ + q_ for p_, q_ in zip(g_act, ga)]
            obj_neg = obj_neg * inv
            if NLC > 1:
                g_act = [g * inv for g in g_act]
            cnt_a2 = cnt_a + 1.0
            bc1a = 1.0 - jnp.exp(cnt_a2 * _math.log(b1))
            bc2a = 1.0 - jnp.exp(cnt_a2 * _math.log(b2))
            pa2, mua2, nua2 = adam_step(pa, mua, nua, g_act, bc1a, bc2a)
            if modsac:
                ta2 = [t_ * (1.0 - tau) + p_ * tau
                       for t_, p_ in zip(ta, pa2)]
            else:
                ta2 = ta

            objs_ref[pl.ds(u, 1)] = jnp.concatenate(
                [obj_c.reshape(1, 1), (-obj_neg).reshape(1, 1),
                 (valid * do_act[0, 0]).reshape(1, 1)], axis=1)
            selc = lambda n_, o_: jnp.where(valid > 0, n_, o_)  # noqa: E731
            da = (valid > 0) & (do_act[0, 0] > 0)
            sela = lambda n_, o_: jnp.where(da, n_, o_)         # noqa: E731
            misc2 = (selc(alpha_log2, alpha_log), selc(a_mu2, a_mu),
                     selc(a_nu2, a_nu), sela(cnt_a2, cnt_a),
                     selc(upd_a2, upd_a))
            return (tuple(map(sela, pa2, pa)), tuple(map(selc, pc2, pc)),
                    tuple(map(sela, ta2, ta)), tuple(map(selc, tc2, tc)),
                    tuple(map(sela, mua2, mua)), tuple(map(selc, muc2, muc)),
                    tuple(map(sela, nua2, nua)), tuple(map(selc, nuc2, nuc)),
                    misc2)

        final = jax.lax.fori_loop(0, C, body, init)
        for g_out, g_val in zip(out_groups, final):
            for r_, v in zip(g_out, g_val):
                r_[:] = v

    import numpy as _np

    def chunk(pa, pc, ta, tc, mua, muc, nua, nuc, misc,
              sb, nsb, ab, rb, ud, um, nzn, nzp, bcv):
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
        n_groups = (n_a + n_c + n_t + n_c + n_a + n_c + n_a + n_c + 5)
        d2 = pc[2].shape[0]                    # head hidden width
        mask = _np.zeros((E, E * d2), _np.float32)
        for e in range(E):
            mask[e, e * d2:(e + 1) * d2] = 1.0
        in_specs = ([vmem()] * 9
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [vmem()] * n_groups)
        out_specs = tuple([vmem()] * (n_groups + 1))
        all_in = (list(pa) + list(pc) + list(ta) + list(tc) + list(mua)
                  + list(muc) + list(nua) + list(nuc) + list(misc))
        out_shape = tuple(
            [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in all_in]
            + [jax.ShapeDtypeStruct((C, 3), jnp.float32)])
        outs = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={10 + i: i for i in range(n_groups)},
            # the E-head ensemble autodiff's live set sits ~300K over the
            # default 16M scoped-vmem stack at (128,128)xB>=1024; raise the
            # kernel's limit (v5e VMEM is far larger than the 16M default)
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(sb, nsb, ab, rb, ud, um, nzn, nzp, jnp.asarray(mask), bcv,
          *all_in)
        sizes = [n_a, n_c, n_t, n_c, n_a, n_c, n_a, n_c, 5]
        g, o = [], 0
        for sz in sizes:
            g.append(tuple(outs[o:o + sz])); o += sz
        return (*g, outs[o])

    return chunk
