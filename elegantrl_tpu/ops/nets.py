"""Functional MLP building blocks.

Replaces the reference's ``build_mlp`` / ``layer_init_with_orthogonal``
(reference ``elegantrl/agents/AgentBase.py:345-366``) with pure
init/apply pairs over parameter pytrees.  Keeping the nets functional means
critic ensembles become a vmapped leading parameter axis and target networks
are plain pytree copies updated by ``soft_update``.

Matmul-heavy paths accept a ``dtype`` so large-batch actor/critic forwards can
run in bfloat16 on the MXU while parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Any  # pytree of arrays
PRNGKey = jax.Array


def linear_init(key: PRNGKey, in_dim: int, out_dim: int) -> Tuple[jax.Array, jax.Array]:
    """Hidden-layer init matching torch.nn.Linear's default
    (kaiming-uniform with a=sqrt(5) == U(+-1/sqrt(fan_in)) for weight and bias),
    which is what the reference's ``build_mlp`` hidden layers use.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.maximum(in_dim, 1)).astype(jnp.float32)
    w = jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return w, b


def orthogonal_init(key: PRNGKey, in_dim: int, out_dim: int, std: float = 1.0,
                    bias_const: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """Output-layer init (reference ``layer_init_with_orthogonal``,
    AgentBase.py:363-365): orthogonal weight scaled by ``std``, constant bias.
    """
    w = jax.nn.initializers.orthogonal(scale=std)(key, (in_dim, out_dim), jnp.float32)
    b = jnp.full((out_dim,), bias_const, jnp.float32)
    return w, b


def mlp_init(key: PRNGKey, dims: Sequence[int], out_std: Optional[float] = None) -> Params:
    """Build params for an MLP ``dims[0] -> ... -> dims[-1]``.

    out_std: if given, the final layer uses orthogonal init with this std
    (the reference applies it to actor/critic output layers).
    """
    n = len(dims) - 1
    keys = jax.random.split(key, n)
    layers: List[Tuple[jax.Array, jax.Array]] = []
    for i in range(n):
        if i == n - 1 and out_std is not None:
            layers.append(orthogonal_init(keys[i], dims[i], dims[i + 1], std=out_std))
        else:
            layers.append(linear_init(keys[i], dims[i], dims[i + 1]))
    return layers


def mlp_apply(params: Params, x: jax.Array,
              activation: Callable[[jax.Array], jax.Array] = jax.nn.gelu,
              final_activation: Optional[Callable[[jax.Array], jax.Array]] = None,
              dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """Apply an MLP: Linear+GELU stack with raw (or ``final_activation``) output,
    matching the reference's ``build_mlp(if_raw_out=True)`` semantics.

    When ``dtype`` is bfloat16 the matmuls run on the MXU in bf16 with float32
    accumulation; the result is returned in float32.
    """
    orig_dtype = x.dtype
    if dtype is not None:
        x = x.astype(dtype)
    n = len(params)
    for i, (w, b) in enumerate(params):
        if dtype is not None:
            w = w.astype(dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if i < n - 1:
            x = activation(x)
            if dtype is not None:
                x = x.astype(dtype)
    if final_activation is not None:
        x = final_activation(x)
    return x.astype(orig_dtype) if x.dtype != orig_dtype else x


def soft_update(target: Params, online: Params, tau: float) -> Params:
    """Polyak averaging ``target = (1-tau)*target + tau*online``
    (reference ``AgentBase.soft_update``, AgentBase.py:269-278).
    """
    return jax.tree.map(lambda t, o: t * (1.0 - tau) + o * tau, target, online)


def ensemble_init(key: PRNGKey, num: int, init_fn: Callable[[PRNGKey], Params]) -> Params:
    """Stack ``num`` independent parameter pytrees along a new leading axis.
    Used for critic ensembles (reference ``CriticEnsemble``, AgentSAC.py:244-259)
    so all heads evaluate as one batched matmul via vmap.
    """
    keys = jax.random.split(key, num)
    return jax.vmap(init_fn)(keys)


def global_norm(tree: Params) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


# --------------------------------------------------------- pixel encoder
# Reference ``ConvNet`` (AgentBase.py:392-448): strided conv stack encoding
# 112px or 224px uint8 images to a feature vector.  Same stage widths and
# strides; NHWC layout (TPU-native) instead of torch's NCHW.

_CONV_STAGES = {
    224: [(32, 5, 2), (48, 3, 2), (64, 3, 2), (96, 3, 2), (128, 3, 2), (192, 5, 1)],
    112: [(32, 5, 2), (48, 3, 2), (64, 3, 2), (96, 3, 2), (128, 5, 1)],
    # addition beyond the reference (which only ships 112/224): a small
    # stage for the pure-JAX pixel envs (envs/pixel_chasing.py)
    64: [(16, 5, 2), (32, 3, 2), (32, 3, 2), (64, 3, 2), (64, 2, 1)],
}


def convnet_init(key: PRNGKey, inp_dim: int, out_dim: int,
                 image_size: int = 112) -> Params:
    assert image_size in _CONV_STAGES, f"image_size must be one of {sorted(_CONV_STAGES)}"
    stages = _CONV_STAGES[image_size]
    keys = jax.random.split(key, len(stages) + 1)
    params = []
    c_in = inp_dim
    for k, (c_out, ksize, _stride) in zip(keys[:-1], stages):
        fan_in = ksize * ksize * c_in
        bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(jnp.float32)
        w = jax.random.uniform(k, (ksize, ksize, c_in, c_out), jnp.float32,
                               -bound, bound)
        b = jnp.zeros((c_out,), jnp.float32)
        params.append((w, b))
        c_in = c_out
    params.append(linear_init(keys[-1], c_in, out_dim))
    return params


def convnet_apply(params: Params, x: jax.Array, image_size: int = 112) -> jax.Array:
    """x: (batch, H, W, C) uint8/float.  Scales to [-1, 1] like the reference
    (``x / 128 - 1``, AgentBase.py:433) and returns (batch, out_dim)."""
    stages = _CONV_STAGES[image_size]
    h = x.astype(jnp.float32) / 128.0 - 1.0
    for (w, b), (_c, _k, stride) in zip(params[:-1], stages):
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(stride, stride), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        h = jax.nn.relu(h + b)
    h = h.reshape(h.shape[0], -1)
    w, b = params[-1]
    return h @ w + b


# ------------------------------------------------------------- DenseNet
# Reference ``DenseNet`` (AgentBase.py:377-389): two concat-growing
# Hardswish blocks, lay_dim -> lay_dim*4.

def densenet_init(key: PRNGKey, lay_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {'dense1': linear_init(k1, lay_dim, lay_dim),
            'dense2': linear_init(k2, lay_dim * 2, lay_dim * 2)}


def densenet_apply(params: Params, x: jax.Array) -> jax.Array:
    w1, b1 = params['dense1']
    x2 = jnp.concatenate([x, jax.nn.hard_swish(x @ w1 + b1)], axis=-1)
    w2, b2 = params['dense2']
    return jnp.concatenate([x2, jax.nn.hard_swish(x2 @ w2 + b2)], axis=-1)


# ----------------------------------------------------- Ornstein-Uhlenbeck
def ou_noise_step(noise: jax.Array, key: PRNGKey, theta: float = 0.15,
                  sigma: float = 0.3, dt: float = 1e-2) -> jax.Array:
    """One OU-process step (reference ``OrnsteinUhlenbeckNoise.__call__``,
    AgentTD3.py:112-120, same update including its sign convention):
    ``n <- n - (theta*n*dt + sigma*sqrt(dt)*N(0,1))``.  Functional: thread
    ``noise`` through the rollout carry."""
    eps = sigma * jnp.sqrt(dt) * jax.random.normal(key, noise.shape)
    return noise - (theta * noise * dt + eps)
