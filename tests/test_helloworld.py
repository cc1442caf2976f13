"""helloworld single-file tutorials run end to end and learn.

The reference prescribes ``python -m unittest discover`` over
``helloworld/unit_tests/check_*.py`` smoke checks (README.md:163-169,
SURVEY §4); here each single file asserts its own learning threshold, so
the smoke test IS a learning check.  Subprocess-isolated: each file owns
its JAX platform setup.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('script', [
    'helloworld_DQN_single_file.py',    # asserts CartPole best > 150
    'helloworld_PPO_single_file.py',    # asserts Pendulum avgR > -400
])
def test_helloworld_single_file_learns(script):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'helloworld', script)],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    # each file ends with a "helloworld <ALGO>: ..." summary after its
    # learning assert passed
    assert 'helloworld' in out.stdout.splitlines()[-1]
