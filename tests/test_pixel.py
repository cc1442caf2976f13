"""Pixel path end-to-end: ConvNet encoder trains under grad on the rendered
PointChasing env (VERDICT r1 next #8)."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.config import Config
from elegantrl_tpu.agents import AgentPixelPPO
from elegantrl_tpu.envs import PixelChasingEnv, make_pixel_chasing
from elegantrl_tpu.envs.base import vec_reset, vec_step
from elegantrl_tpu.train.runner import build_training, train_agent


def test_render_shapes_and_blobs():
    env = make_pixel_chasing()
    state, obs = vec_reset(env, jax.random.key(0), 3)
    assert obs.shape == (3, 64, 64, 2)
    obs_np = np.asarray(obs)
    assert obs_np.max() > 100.0          # blobs present
    assert obs_np.min() >= 0.0
    # each channel has exactly one blob: mass concentrated near max
    for c in range(2):
        ch = obs_np[0, :, :, c]
        assert ch.sum() < 80 * ch.max()
    state, obs, r, term, trunc = vec_step(
        env, state, jnp.zeros((3, 2)), jax.random.key(1))
    assert obs.shape == (3, 64, 64, 2) and np.isfinite(np.asarray(r)).all()


def test_pixel_ppo_trains_and_improves(tmp_path):
    args = Config(AgentPixelPPO, PixelChasingEnv,
                  {'env_name': 'PixelChasing-v0', 'num_envs': 8,
                   'max_step': 200, 'state_dim': (64, 64, 2),
                   'action_dim': 2, 'if_discrete': False})
    args.net_dims = (64,)
    args.encoder_dim = 64
    args.gamma = 0.97
    args.horizon_len = 64
    args.repeat_times = 4
    args.batch_size = 64
    args.learning_rate = 3e-4
    args.eval_per_step = 4096
    args.eval_times = 4
    args.break_step = 20_000
    args.cwd = str(tmp_path / 'pixel')
    r = train_agent(args)
    rec = r['recorder']
    assert np.isfinite(rec[:, 1]).all()
    # ConvNet gradients flow: late eval beats the first (blob chasing is
    # easy once the encoder localizes the blobs)
    assert r['max_r'] > rec[0, 1], rec[:, 1]


def test_pixel_conv_gradients_nonzero():
    args = Config(AgentPixelPPO, PixelChasingEnv,
                  {'env_name': 'PixelChasing-v0', 'num_envs': 4,
                   'max_step': 200, 'state_dim': (64, 64, 2),
                   'action_dim': 2, 'if_discrete': False})
    args.net_dims = (32,)
    args.encoder_dim = 32
    args.horizon_len = 16
    args.batch_size = 32
    args.repeat_times = 2
    ctx = build_training(args)
    carry, metrics = jax.jit(lambda c: ctx.round_fn(c, None))(ctx.carry)
    # conv kernels must have moved (encoder actually trains)
    before = jax.tree.leaves(ctx.carry.agent_state.cri['conv'])
    after = jax.tree.leaves(carry.agent_state.cri['conv'])
    moved = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(before, after))
    assert moved > 0.0
    assert np.isfinite(float(metrics['obj_critic']))
