"""elegantrl_tpu — a TPU-native deep reinforcement learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
AI4Finance-Foundation/ElegantRL (reference mounted at /root/reference):

- Vectorized pure-JAX environments stepping thousands of instances in lockstep
  under ``jit`` (replaces process-based VecEnv, reference
  ``elegantrl/train/config.py:212-311``).
- Single fused actor-learner loop: rollout collection (``lax.scan``), GAE,
  replay-buffer insert/sample and SGD all compile into one XLA program
  (replaces the Learner/Worker/Evaluator process triangle, reference
  ``elegantrl/train/run.py:141-162``).
- Data parallelism over a ``jax.sharding.Mesh`` with XLA collectives
  (replaces the multi-GPU rollout ring, reference ``run.py:165-202``).

Public surface mirrors the reference's (``Config``, ``build_env``,
``train_agent``, agent zoo, ``ReplayBuffer``, ``Evaluator``) with a
functional JAX-first architecture underneath.
"""

__version__ = "0.1.0"

from .config import Config, build_env, get_gym_env_args  # noqa: F401
from .train.runner import (  # noqa: F401
    train_agent, train_agent_single_process, train_agent_multiprocessing,
    train_agent_multiprocessing_multi_gpu, valid_agent, render_agent,
)
from .serve import PolicyServer  # noqa: F401
from . import agents, envs, ops, parallel, rlsolver, train, utils  # noqa: F401
