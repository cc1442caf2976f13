"""Network building blocks: shapes, init stats, conv/densenet/ou parity
(mirrors the intent of reference unit_tests/agents/test_net.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.ops.nets import (
    mlp_init, mlp_apply, soft_update, ensemble_init, global_norm,
    convnet_init, convnet_apply, densenet_init, densenet_apply, ou_noise_step,
)


def test_mlp_shapes_and_final_layer_orthogonal():
    key = jax.random.key(0)
    params = mlp_init(key, (6, 32, 32, 4), out_std=0.1)
    x = jnp.ones((7, 6))
    y = mlp_apply(params, x)
    assert y.shape == (7, 4)
    w_last = params[-1][0]
    # orthogonal scaled by 0.1: singular values == 0.1
    s = np.linalg.svd(np.asarray(w_last), compute_uv=False)
    np.testing.assert_allclose(s, 0.1, rtol=1e-4)
    # bias constant 1e-6
    np.testing.assert_allclose(np.asarray(params[-1][1]), 1e-6)


def test_mlp_bf16_close_to_f32():
    key = jax.random.key(1)
    params = mlp_init(key, (16, 64, 64, 8))
    x = jax.random.normal(jax.random.key(2), (32, 16))
    y32 = mlp_apply(params, x)
    y16 = mlp_apply(params, x, dtype=jnp.bfloat16)
    assert y16.dtype == y32.dtype
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=3e-2, atol=3e-2)


def test_soft_update():
    a = [jnp.zeros(3)]
    b = [jnp.ones(3)]
    out = soft_update(a, b, 0.25)
    np.testing.assert_allclose(np.asarray(out[0]), 0.25)


def test_ensemble_init_stacks_leading_axis():
    params = ensemble_init(jax.random.key(0), 4,
                           lambda k: mlp_init(k, (8, 16, 1)))
    assert params[0][0].shape == (4, 8, 16)
    # heads differ
    assert float(jnp.abs(params[0][0][0] - params[0][0][1]).sum()) > 0


def test_convnet_112_and_224():
    for size in (112, 224):
        params = convnet_init(jax.random.key(0), 3, 32, image_size=size)
        img = jnp.ones((2, size, size, 3), jnp.uint8) * 255
        out = convnet_apply(params, img, image_size=size)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()


def test_densenet_grows_4x():
    params = densenet_init(jax.random.key(0), 16)
    x = jnp.ones((5, 16))
    out = densenet_apply(params, x)
    assert out.shape == (5, 64)


def test_ou_noise_stationary_scale():
    key = jax.random.key(0)
    n = jnp.zeros(4)
    vals = []
    for i in range(3000):
        n = ou_noise_step(n, jax.random.fold_in(key, i))
        vals.append(np.asarray(n))
    std = np.stack(vals)[500:].std()
    # OU stationary std = sigma*sqrt(dt)/sqrt(2*theta*dt) = sigma/sqrt(2 theta)
    expect = 0.3 / np.sqrt(2 * 0.15)
    assert 0.5 * expect < std < 1.5 * expect
