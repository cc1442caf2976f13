"""Mesh data-parallel training equivalence + elastic restore, on the
virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPPO, AgentSAC
from elegantrl_tpu.envs import PendulumEnv
from elegantrl_tpu.parallel.mesh import make_mesh, shard_train_carry
from elegantrl_tpu.train.runner import build_training


def _args(agent_class, num_envs=16):
    args = Config(agent_class=agent_class, env_class=PendulumEnv,
                  env_args={'env_name': 'Pendulum-v1', 'num_envs': num_envs,
                            'max_step': 200, 'state_dim': 3, 'action_dim': 1,
                            'if_discrete': False})
    args.net_dims = (16, 16)
    args.horizon_len = 32
    args.batch_size = 16
    args.repeat_times = 1.0
    if args.if_off_policy:
        args.buffer_size = 512
    return args


def _run_rounds(ctx, n=3):
    step = jax.jit(lambda c: jax.lax.scan(ctx.round_fn, c, None, length=n)[0])
    return step(ctx.carry)


def test_dp_sharded_ppo_matches_single_device():
    assert jax.device_count() == 8
    c1 = _run_rounds(build_training(_args(AgentPPO)))
    mesh = make_mesh({'dp': 8})
    c2 = _run_rounds(build_training(_args(AgentPPO), mesh=mesh))
    for a, b in zip(jax.tree.leaves(c1.agent_state), jax.tree.leaves(c2.agent_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_dp_sharded_offpolicy_runs():
    mesh = make_mesh({'dp': 8})
    ctx = build_training(_args(AgentSAC), mesh=mesh)
    out = _run_rounds(ctx, n=2)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert int(out.buf_state.size) == 64


def test_elastic_restore(tmp_path):
    from elegantrl_tpu.parallel.distributed import elastic_restore
    from elegantrl_tpu.utils.checkpoint import save_pytree

    ctx = build_training(_args(AgentPPO))
    carry = _run_rounds(ctx, n=1)
    path = str(tmp_path / 'carry.npz')
    save_pytree(path, carry)
    restored, mesh = elastic_restore(path, carry, {'dp': 8})
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored carry trains under the new mesh
    step = jax.jit(lambda c: ctx.round_fn(c, None)[0])
    out = step(restored)
    assert np.isfinite(np.asarray(out.obs)).all()
