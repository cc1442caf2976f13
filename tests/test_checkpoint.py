"""Checkpoint round-trip over nested pytrees."""
import numpy as np
import jax
import jax.numpy as jnp

from elegantrl_tpu.utils.checkpoint import save_pytree, load_pytree


def test_roundtrip(tmp_path):
    tree = {'a': jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            'b': [jnp.ones(4), (jnp.zeros(()), jnp.asarray(3))],
            'c': {'d': jnp.asarray([1.5, -2.5])}}
    path = str(tmp_path / 'ck.npz')
    save_pytree(path, tree)
    template = jax.tree.map(jnp.zeros_like, tree)
    out = load_pytree(path, template)
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_agent_state_roundtrip(tmp_path):
    from elegantrl_tpu.config import Config
    from elegantrl_tpu.agents import AgentSAC
    from elegantrl_tpu.train.replay_buffer import ReplayBuffer

    args = Config(agent_class=AgentSAC)
    args.net_dims = (8, 8)
    rb = ReplayBuffer(max_size=32, state_dim=3, action_dim=1, num_seqs=2)
    agent = AgentSAC.make((8, 8), 3, 1, args, buffer=rb)
    state = agent.init(jax.random.key(0))
    path = str(tmp_path / 'agent.npz')
    save_pytree(path, state)
    restored = load_pytree(path, jax.tree.map(jnp.zeros_like, state))
    for x, y in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
