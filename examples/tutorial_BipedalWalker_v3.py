"""Tutorial 4 — BipedalWalker-v3 through the host-env escape hatch.

Runnable port of the reference's ``tutorial_BipedalWalker_v3.ipynb`` flow.
There is no pure-JAX BipedalWalker here (articulated Box2D terrain walker);
instead this shows the general recipe for training on ANY gymnasium env
inside the fused loop: ``gym_env_def`` wraps the stateful env pool behind an
``io_callback`` so the update math still runs jitted on device while the
physics steps on the host.

Because every env step crosses the host boundary, host envs are for
parity/medium-scale runs, not throughput — expect hundreds-to-thousands of
env-steps/s rather than millions.  On this machine run it CPU-side so env
steps don't pay the TPU tunnel round-trip:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python examples/tutorial_BipedalWalker_v3.py [quick]

Expected: with the full budget (~3e5 steps) ModSAC's avgR climbs from ~-100
toward 200+ (solved is 300 over 100 episodes; the reference notebook trains
minutes-to-hours for that).  `quick` just proves the plumbing in ~a minute.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from elegantrl_tpu.config import Config                     # noqa: E402
from elegantrl_tpu.agents import AgentModSAC                # noqa: E402
from elegantrl_tpu.envs import get_env_args, gym_env_def    # noqa: E402
from elegantrl_tpu.train.runner import train_agent          # noqa: E402


def main(quick=False):
    env = gym_env_def('BipedalWalker-v3')    # version-resolving gym wrapper
    args = Config(AgentModSAC, env, get_env_args(env, num_envs=16))
    args.net_dims = (256, 256)
    args.gamma = 0.98
    args.horizon_len = 64
    args.buffer_size = int(1e5)
    args.batch_size = 256
    args.repeat_times = 0.5
    args.learning_rate = 3e-4
    args.eval_per_step = int(2e4)
    args.eval_times = 8
    args.break_step = int(2e4) if quick else int(3e5)
    args.break_score = 300.0                 # stop early when solved
    return train_agent(args)


if __name__ == '__main__':
    main(quick='quick' in sys.argv)
